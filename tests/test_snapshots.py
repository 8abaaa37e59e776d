"""Snapshot versioning (time travel): hardlink snapshots survive every
mutation path (overwrite, merge_upsert, compact), old versions stay
byte-readable, and snapshot_diff classifies row-level changes."""

from __future__ import annotations

from pyspark.sql import functions as F

from kingfisher_process_spark.store import Store, StoreSnapshots, snapshot_diff


def _notes(spark, rows):
    return spark.createDataFrame(
        [(i, cid, note, "INFO", None, None) for i, cid, note in rows],
        "id long, collection_id long, note string, code string, "
        "data string, stored_at timestamp")


def test_snapshot_survives_overwrite_and_diff(spark, tmp_path):
    store = Store(spark, str(tmp_path))
    snaps = StoreSnapshots(store)
    store.overwrite("collection_note", _notes(spark, [
        (1, 10, "alpha"), (2, 10, "beta"), (3, 11, "gamma")]))
    v1 = snaps.snapshot("collection_note")

    store.overwrite("collection_note", _notes(spark, [
        (1, 10, "alpha"), (2, 10, "BETA-EDITED"), (4, 11, "delta")]))
    v2 = snaps.snapshot("collection_note")
    assert snaps.versions("collection_note") == [v1, v2] == [1, 2]

    # the pinned v1 still reads its original content
    old = {r["id"]: r["note"]
           for r in snaps.read_version("collection_note", v1).collect()}
    assert old == {1: "alpha", 2: "beta", 3: "gamma"}

    d = {r["id"]: r["change_type"]
         for r in snaps.diff("collection_note", v1, v2, ["id"]).collect()}
    assert d == {2: "changed", 3: "removed", 4: "added"}


def test_snapshot_survives_merge_upsert_and_compact(spark, tmp_path):
    store = Store(spark, str(tmp_path))
    snaps = StoreSnapshots(store)
    store.overwrite("collection_note", _notes(spark, [
        (1, 10, "a"), (2, 10, "b")]))
    v1 = snaps.snapshot("collection_note")

    store.merge_upsert("collection_note",
                       _notes(spark, [(2, 10, "b2"), (5, 12, "e")]), ["id"])
    store.compact("collection_note")
    v2 = snaps.snapshot("collection_note")

    assert {r["id"]: r["note"]
            for r in snaps.read_version("collection_note", v1).collect()} \
        == {1: "a", 2: "b"}
    assert {r["id"]: r["note"]
            for r in snaps.read_version("collection_note", v2).collect()} \
        == {1: "a", 2: "b2", 5: "e"}
    d = {r["id"]: r["change_type"]
         for r in snaps.diff("collection_note", v1, v2, ["id"]).collect()}
    assert d == {2: "changed", 5: "added"}

    snaps.drop("collection_note", v1)
    assert snaps.versions("collection_note") == [v2]


def test_snapshot_diff_generic_dataframes(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    b = spark.createDataFrame([(2, "y2"), (3, "z")], "k long, v string")
    d = {r["k"]: r["change_type"] for r in snapshot_diff(a, b, ["k"]).collect()}
    assert d == {1: "removed", 2: "changed", 3: "added"}


def test_snapshot_diff_null_keys(spark):
    a = spark.createDataFrame([(None, "x"), (1, "same")], "k long, v string")
    b = spark.createDataFrame([(None, "y"), (1, "same")], "k long, v string")
    rows = snapshot_diff(a, b, ["k"]).collect()
    assert [(r["k"], r["change_type"]) for r in rows] == [(None, "changed")]
