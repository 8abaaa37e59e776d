#!/usr/bin/env python
"""Crossover sweep for the skew-routed compile (SCALE.md §10/§11).

Synthesizes ONE hot OCID of ``hot_n`` releases next to a 1k-OCID uniform
tail (the ocds_compile_skewed fixture shape, hot size parameterized) and
times the two compile paths:

- routed:       skew_routed_compiled(batch=100) — cold tail single-pass,
                hot OCID through two-phase partial merge
- single-phase: one groupBy(ocid).applyInPandas task merges the hot
                OCID sequentially

Usage:  python scripts/sweep_skew_compile.py [sf_dir]
Prints one JSON line per hot size with min-of-2 timings; paste the table
into SCALE.md when re-measuring (numbers there are from this script at
sf0.1 on local[32]).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kingfisher_process_spark.operators.compile_release import (  # noqa: E402
    COMPILED_SCHEMA, _merge_group, skew_routed_compiled)
from kingfisher_process_spark.plans.base import load_tables  # noqa: E402
from kingfisher_process_spark.session import get_spark  # noqa: E402

HOT_SIZES = (1_000, 10_000, 50_000, 100_000)
TAIL = 1_000
REPS = 2


def skewed_releases(spark, sf_dir: str, hot_n: int):
    """(ocid, release_date, data, package_data) with one hot OCID of
    hot_n releases + TAIL single-release OCIDs — the parameterized form
    of ocds_entry._skewed_releases."""
    orders = load_tables(spark, sf_dir)["orders"]
    base = (orders.orderBy("o_orderkey").limit(hot_n + TAIL)
            .select("o_orderkey", "o_totalprice",
                    F.row_number().over(
                        Window.orderBy("o_orderkey")).alias("rn")))
    sel = base.select(
        "o_orderkey", "o_totalprice",
        F.when(F.col("rn") <= hot_n, F.lit("ocds-kps-hot"))
        .otherwise(F.concat(F.lit("ocds-kps-u-"), F.col("o_orderkey")))
        .alias("ocid"),
        F.format_string("2020-01-01T%010d", F.col("o_orderkey"))
        .alias("release_date"),
    )
    data = F.to_json(F.struct(
        F.col("ocid").alias("ocid"),
        F.concat(F.col("o_orderkey").cast("string"), F.lit("-r")).alias("id"),
        F.col("release_date").alias("date"),
        F.array(F.lit("award")).alias("tag"),
        F.array(F.struct(
            F.lit("a-1").alias("id"),
            F.struct(F.col("o_totalprice").alias("amount"),
                     F.lit("USD").alias("currency")).alias("value"),
        )).alias("awards"),
    ))
    return sel.select("ocid", "release_date", data.alias("data"),
                      F.lit(None).cast("string").alias("package_data"))


def timed(fn) -> float:
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew-sweep")
    for hot_n in HOT_SIZES:
        rel = skewed_releases(spark, sf_dir, hot_n)
        n = rel.count()
        if n < hot_n + TAIL:
            print(json.dumps({"hot_n": hot_n, "skipped":
                              f"only {n} orders at {sf_dir}"}))
            continue
        rel = rel.localCheckpoint()  # time the COMPILE, not the synthesis
        routed = timed(lambda: skew_routed_compiled(rel, batch=100).count())
        single = timed(lambda: rel.groupBy("ocid").applyInPandas(
            _merge_group, COMPILED_SCHEMA).count())
        print(json.dumps({
            "hot_n": hot_n, "tail": TAIL,
            "routed_sec": routed, "single_sec": single,
            "speedup": round(single / routed, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
