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


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    import os

    from kingfisher_process_spark.store import Store

    store = Store(spark, str(tmp_path / "store"))
    import pandas as pd
    for batch in range(6):  # many small appends -> many small files
        store.append("data", spark.createDataFrame(pd.DataFrame([
            {"id": batch * 10 + i, "hash_md5": f"h{batch}_{i}", "data": "x" * 50}
            for i in range(10)])))
    before = {tuple(sorted(r.asDict().items())) for r in store.read("data").collect()}

    def count_files(p):
        return sum(1 for root, _d, files in os.walk(p)
                   for f in files if f.endswith(".parquet"))

    files_before = count_files(store.path("data"))
    files_after = store.compact("data")
    assert files_after < files_before
    after = {tuple(sorted(r.asDict().items())) for r in store.read("data").collect()}
    assert after == before
    assert store.next_id("data") == 60  # id watermark rebuilt from data


def test_compact_partitioned_table(spark, tmp_path):
    import pandas as pd

    from kingfisher_process_spark.store import Store

    store = Store(spark, str(tmp_path / "storep"))
    for cid in (1, 2):
        for b in range(3):
            store.append("compiled_release", spark.createDataFrame(pd.DataFrame([
                {"id": cid * 100 + b * 10 + i, "collection_id": cid,
                 "collection_file_id": 1, "ocid": f"o-{i}",
                 "release_date": "2020-01-01", "data_id": 1}
                for i in range(5)])))
    before = store.read("compiled_release").count()
    store.compact("compiled_release")
    assert store.read("compiled_release").count() == before
    # hive partition dirs survive -> partition pruning still works
    import os
    assert os.path.isdir(store.path("compiled_release") + "/collection_id=1")


def test_swap_in_crash_safety(spark, tmp_path, monkeypatch):
    """A failure swapping the compacted dir in must roll the original
    table back — the table path never ends up deleted with the
    replacement unrenamed (the failure mode _swap_in exists to prevent)."""
    import os

    import pytest

    from kingfisher_process_spark.store import Store

    store = Store(spark, str(tmp_path / "store"))
    store.append_rows("data", [{"id": 1, "hash_md5": "h1", "data": "{}"}])
    before = store.read("data").collect()

    real_replace = os.replace
    calls = {"n": 0}

    def failing_replace(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the swap-in rename, after src moved to backup
            raise OSError("simulated crash")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", failing_replace)
    with pytest.raises(OSError, match="simulated crash"):
        store.compact("data")
    monkeypatch.undo()

    # original table restored, fully readable
    assert [r.asDict() for r in store.read("data").collect()] == \
        [r.asDict() for r in before]
    # and a subsequent compact (no failure) succeeds
    assert store.compact("data") >= 0
    assert store.read("data").count() == 1
