"""Focused solo timing for the r12 optimization loop.

Usage: python scripts/r12_time_probes.py <probe> [probe ...]
Times each registry probe at sf0.1 (bench methodology: warmup at
sf0.001, then min of 3 reps end-to-end plan+execute+collect).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as em
    from kingfisher_process_spark.session import get_spark

    spark = get_spark("kps-r12-times")
    reg = em._registry()
    reg["q1_pricing_summary"].fn(spark, sf_dir).collect()  # JVM warm
    for name in names:
        probe = reg[name]
        try:
            probe.fn(spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            probe.fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        print(f"{name}: {round(min(samples), 3)}  (samples "
              f"{[round(s, 2) for s in samples]})", flush=True)


if __name__ == "__main__":
    main()
