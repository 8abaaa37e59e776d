"""A/B: OCDS merge dispatch — mapInPandas (pre-r13 grouped_apply_sorted)
vs the arrow-native mapInArrow group walk now in production
(operators/grouped.grouped_apply_sorted_arrow; guide §4.5 — skip pandas
block management, slice arrow tables, hand plain Python lists to the
merge core).

Usage: python scripts/r13_ab_merge.py [n_orders] [reps]
Builds the same compile `inputs` frame ocds_compile_pipeline feeds the
merge (2 releases per OCID), checks the two dispatches produce identical
row sets, then interleaves warm noop-sink timings.

r13 measurements (sf0.1 host, 2000 OCIDs, min of 4 interleaved):
  pandas walk 2.994 s  |  arrow walk 0.552 s  (5.4x)
Probe-level back-to-back sessions (min of 3 each):
  ocds_compile_pipeline 2.98 -> 2.67 s, ocds_compile_skewed
  3.15 -> 1.16 s, ocds_compile_two_phase 3.76 -> 3.70 s (flat — its
  merge runs in the FlatMapGroupsInPandas two-phase stages).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

from kingfisher_process_spark.operators.compile_release import (
    COMPILED_SCHEMA, _merge_group, _merge_rows_fn)
from kingfisher_process_spark.operators.grouped import (
    grouped_apply_sorted, grouped_apply_sorted_arrow)
from kingfisher_process_spark.session import get_spark


def main() -> None:
    n_orders = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kps-r13-ab-merge")

    from kingfisher_process_spark.plans.ocds_entry import _synth_order_packages
    paths, _ = _synth_order_packages(spark, sf_dir, n_orders)
    rels = []
    for p in paths:
        with open(p) as f:
            for r in json.load(f)["releases"]:
                rels.append((r["ocid"], r["date"], json.dumps(r),
                             json.dumps({"uri": "x", "version": "1.1"})))
    inputs = spark.createDataFrame(
        rels, "ocid string, release_date string, data string,"
        " package_data string").localCheckpoint()

    cur = grouped_apply_sorted(inputs, ["ocid"], _merge_group,
                               COMPILED_SCHEMA,
                               extra_sort=["release_date", "data"])
    new = grouped_apply_sorted_arrow(inputs, ["ocid"], _merge_rows_fn(),
                                     COMPILED_SCHEMA,
                                     extra_sort=["release_date", "data"])
    a = sorted(map(tuple, cur.collect()))
    b = sorted(map(tuple, new.collect()))
    assert a == b, f"MISMATCH: {len(a)} vs {len(b)} rows; first diff: " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), None))
    print(f"equality OK ({len(a)} rows)")

    ts = {"pandas": [], "arrow": []}
    for _ in range(reps):
        for name, df in (("pandas", cur), ("arrow", new)):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts[name].append(time.perf_counter() - t0)
    for name, xs in ts.items():
        print(f"{name}: min {min(xs):.3f}s  samples {[round(x, 3) for x in xs]}")


if __name__ == "__main__":
    main()
