"""Capture the store-level incremental-compile plan before/after the
r13 dirty-ocid prefilter (guide §3.2).

Builds a two-crawl store (v1 full, v2 = v1 with a 1% change), then dumps
`incremental_compiled_frame`'s plan (plans/r13/ocds_incremental_store_
after.txt) and, for the before shape, the legacy construction
`redo_in = new_in ANTI kept.ocids` (.._before.txt) from the same store —
the exact expression the pre-r13 code built.

Usage: python scripts/r13_incremental_plan.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kingfisher_process_spark.session import get_spark


def main() -> None:
    from kingfisher_process_spark.operators.compile_release import (
        _resolve_keyset, compile_collection, incremental_compiled_frame,
        skew_routed_compiled)
    from kingfisher_process_spark.store import Store

    spark = get_spark("kps-r13-incplan", cpus=8)
    tmp = tempfile.mkdtemp(prefix="kps_incplan_")
    store = Store(spark, os.path.join(tmp, "store"))

    def release(ocid, rid, date, v):
        return json.dumps({"ocid": ocid, "id": rid, "date": date,
                           "awards": [{"id": "a", "value": v}]})

    n = 500
    rows_v1 = [(f"ocds-inc-{i}", "2020-01-01T00:00:00Z",
                release(f"ocds-inc-{i}", "r1", "2020-01-01T00:00:00Z", i))
               for i in range(n)]
    # v2: 1% of OCIDs changed
    rows_v2 = [(o, d, release(o, "r1", d, i + 1000) if i % 100 == 0 else s)
               for i, (o, d, s) in enumerate(rows_v1)]

    ids = {}
    for cid, rows in ((1, rows_v1), (2, rows_v2)):
        rel = spark.createDataFrame(
            rows, "ocid string, release_date string, data string")
        data_map = {}
        payloads = sorted({r[2] for r in rows})
        base = store.next_id("data")
        store.append_rows("data", [
            {"id": base + i, "hash_md5": f"h{cid}-{i}", "data": p}
            for i, p in enumerate(payloads)])
        store.advance_next_id("data", base + len(payloads))
        data_map = {p: base + i for i, p in enumerate(payloads)}
        rid_base = store.next_id("release")
        store.append_rows("release", [
            {"id": rid_base + i, "collection_id": cid,
             "collection_file_id": 1, "ocid": o, "release_id": "r1",
             "release_date": d, "data_id": data_map[s],
             "package_data_id": None}
            for i, (o, d, s) in enumerate(rows)])
        store.advance_next_id("release", rid_base + len(rows))
        ids[cid] = cid
    compile_collection(store, 1, 3, two_phase=False)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")

    frame = incremental_compiled_frame(store, 1, 2, 3)
    with open(os.path.join(out_dir, "ocds_incremental_store_after.txt"), "w") as f:
        f.write(spark._jvm.PythonSQLUtils.explainString(
            frame._jdf.queryExecution(), "formatted").rstrip() + "\n")

    # legacy (pre-r13) construction of the same result, from the same
    # store: redo_in = payload-joined new crawl ANTI-JOIN kept.ocids
    from kingfisher_process_spark.operators.compile_release import dirty_ocids

    def merge_inputs(pid):
        releases = store.read("release").where(F.col("collection_id") == pid)
        data = store.read("data").select(F.col("id").alias("data_id"), "data")
        pkg = store.read("package_data").select(
            F.col("id").alias("package_data_id"),
            F.col("data").alias("package_data"))
        return (releases.join(data, "data_id")
                .join(pkg, "package_data_id", "left")
                .select("ocid", "release_date", "data", "package_data"))

    old_in, new_in = merge_inputs(1), merge_inputs(2)
    dirty, small = _resolve_keyset(dirty_ocids(old_in, new_in).select("ocid"))
    payload = store.read("data").select(
        F.col("id").alias("data_id"), F.col("data").alias("merged"))
    kept = (
        store.read("compiled_release").where(F.col("collection_id") == 3)
        .join(F.broadcast(dirty) if small else dirty, "ocid", "left_anti")
        .join(payload, "data_id")
        .select(F.lit("item").alias("row_kind"), "ocid", "merged",
                "release_date", F.md5("merged").alias("hash_md5"),
                F.lit(None).cast("string").alias("note_code"),
                F.lit(None).cast("string").alias("note"),
                F.lit(None).cast("string").alias("note_data")))
    redo_in = new_in.join(kept.select("ocid"), "ocid", "left_anti")
    legacy = kept.unionByName(skew_routed_compiled(redo_in))
    with open(os.path.join(out_dir, "ocds_incremental_store_before.txt"), "w") as f:
        f.write(spark._jvm.PythonSQLUtils.explainString(
            legacy._jdf.queryExecution(), "formatted").rstrip() + "\n")

    # sanity: both shapes produce the same compiled rows
    a = sorted(map(tuple, frame.collect()))
    b = sorted(map(tuple, legacy.collect()))
    assert a == b, f"legacy vs prefiltered mismatch: {len(a)} vs {len(b)}"
    print(f"equality OK ({len(a)} rows); plans written")


if __name__ == "__main__":
    main()
