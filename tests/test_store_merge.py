"""MERGE (upsert) sink: partition-scoped rewrite semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kingfisher_process_spark.store import SCHEMAS, Store


def _rel_row(rid, cid, ocid):
    return (rid, cid, 1, ocid, f"r-{rid}", "2020-01-01", rid, None)


def test_merge_upsert_partitioned(spark, tmp_path):
    store = Store(spark, str(tmp_path / "store"))
    store.append("release", spark.createDataFrame(
        [_rel_row(1, 10, "ocds-a"), _rel_row(2, 10, "ocds-b"),
         _rel_row(3, 20, "ocds-c")], SCHEMAS["release"]))

    untouched = os.path.join(store.path("release"), "collection_id=20")
    before = sorted(os.listdir(untouched))

    # update id=2 (new ocid), insert id=4 — both in collection 10
    src = spark.createDataFrame(
        [_rel_row(2, 10, "ocds-b2"), _rel_row(4, 10, "ocds-d")],
        SCHEMAS["release"])
    store.merge_upsert("release", src, ["id"])

    got = {(r["id"], r["collection_id"], r["ocid"])
           for r in store.read("release").collect()}
    assert got == {(1, 10, "ocds-a"), (2, 10, "ocds-b2"),
                   (4, 10, "ocds-d"), (3, 20, "ocds-c")}
    # collection 20's partition was never rewritten
    assert sorted(os.listdir(untouched)) == before


def test_merge_upsert_unpartitioned(spark, tmp_path):
    store = Store(spark, str(tmp_path / "store"))
    store.append("data", spark.createDataFrame(
        [(1, "h1", "{}"), (2, "h2", "{}")], SCHEMAS["data"]))
    src = spark.createDataFrame(
        [(2, "h2x", "{:}"), (3, "h3", "{}")], SCHEMAS["data"])
    store.merge_upsert("data", src, ["id"])
    got = {(r["id"], r["hash_md5"]) for r in store.read("data").collect()}
    assert got == {(1, "h1"), (2, "h2x"), (3, "h3")}
    assert store.next_id("data") == 4
