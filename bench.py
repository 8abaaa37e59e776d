#!/usr/bin/env python
"""Benchmark runner — times the headline probes at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect); a warmup run of
the flagship query first pays JVM/codegen startup so per-query numbers
reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from kingfisher_process_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family — agg, multi-join, anti-join,
# window, JSON, explode, plus the extension operators (dedup/similarity)
# when registered.
HEADLINE = [
    "q1_pricing_summary",
    "q3_unshipped_orders",
    "q5_region_revenue",
    "q10_returned_revenue",
    "j2_customers_without_orders",
    "o3_latest_order_per_customer",
    "w1_running_customer_spend",
    "p5_json_extract_agg",
    "j4_explode_token_counts",
    "e_sessionize",
    "d_minhash_lsh_pairs",
    "ann_brute_force_topk",
    "t_quality_scores",
    "ocds_compile_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kps-bench")
    reg = entrymod._registry()

    # Warmup: every headline shape once at the smallest scale factor —
    # pays JVM startup, Arrow/Python-worker spawn, and per-shape
    # whole-stage-codegen compilation, so the timed runs measure
    # steady-state execution rather than compiler cold start.
    reg["q1_pricing_summary"].fn(spark, sf_dir).collect()
    for name in HEADLINE:
        if name in reg:
            try:
                reg[name].fn(spark, "/root/testdata/sf0.001").collect()
            except Exception:
                pass

    # min of k reps per query: one-off GC pauses / host contention inflate a
    # single sample by up to 4x on this shared box; the min measures the
    # engine's steady state
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        probe = reg.get(name)
        if probe is None:
            continue
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            probe.fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
    }))


if __name__ == "__main__":
    main()
