#!/usr/bin/env python
"""Characterize the two bench calibration controls' run-to-run
variance (SCALE.md §18: the r12 window saw the throughput control move
38% against a quiet host while its own regime's entries drifted <11% —
before repping the control up, measure HOW noisy each control actually
is within one session and across session restarts).

Runs each control N_SAMPLES times inside one session, then restarts
the session N_RESTARTS times taking min-of-3 each — separating
within-session jitter (scheduler/JIT state) from across-session level
shifts (the thing cross-round normalization actually divides by).

Usage: python scripts/measure_bench_controls.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SAMPLES = 15
N_RESTARTS = 4


def _throughput_once(spark) -> float:
    t0 = time.perf_counter()
    (spark.range(0, 64_000_000, 1, 32)
     .selectExpr("id % 1024 AS k",
                 "(id * 2654435761) % 1000003 AS v")
     .groupBy("k").sum("v").collect())
    return time.perf_counter() - t0


def _sched_once(spark) -> float:
    t0 = time.perf_counter()
    (spark.range(0, 1024, 1, 1024)
     .selectExpr("id % 7 AS k")
     .groupBy("k").count().collect())
    return time.perf_counter() - t0


def _stats(xs: list[float]) -> dict:
    xs = sorted(xs)
    return {
        "n": len(xs), "min": round(xs[0], 4),
        "median": round(statistics.median(xs), 4),
        "p90": round(xs[int(0.9 * (len(xs) - 1))], 4),
        "max": round(xs[-1], 4),
        "cv_pct": round(100 * statistics.stdev(xs)
                        / statistics.mean(xs), 1) if len(xs) > 1 else 0.0,
        "median_over_min": round(statistics.median(xs) / xs[0], 3),
    }


def main() -> int:
    from kingfisher_process_spark.session import get_spark

    spark = get_spark("bench-control-variance")
    # warmup (JIT/codegen caches, like bench's first entries)
    _throughput_once(spark)
    _sched_once(spark)
    within = {"throughput": [], "scheduling": []}
    for _ in range(N_SAMPLES):
        within["throughput"].append(_throughput_once(spark))
        within["scheduling"].append(_sched_once(spark))
    out = {"within_session": {k: _stats(v) for k, v in within.items()}}
    print(json.dumps({"within_session": out["within_session"]}),
          flush=True)

    across = {"throughput": [], "scheduling": []}
    for _ in range(N_RESTARTS):
        spark.stop()
        spark = get_spark("bench-control-variance")
        _throughput_once(spark)
        _sched_once(spark)
        across["throughput"].append(
            min(_throughput_once(spark) for _ in range(3)))
        across["scheduling"].append(
            min(_sched_once(spark) for _ in range(3)))
    out["across_sessions_min3"] = {
        k: _stats(v) for k, v in across.items()}
    print(json.dumps({"across_sessions_min3":
                      out["across_sessions_min3"]}), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
