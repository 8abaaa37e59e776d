"""Focused solo timing for ANN training loops (r12 §12 A/B harness).

Times init_index (IVF Lloyd + residual-PQ Lloyd, no encode) fresh per
call — the training path whose per-iteration lineage re-runs are the
optimization target — plus the memo-bypassed probe-tier trainers.

Usage: python scripts/r12_time_train.py [cells] [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from kingfisher_process_spark.functions.ann_index import init_index
    from kingfisher_process_spark.functions.similarity import (
        _quantized, _residuals, _train_pq_on, train_ivf_grid_centroids)
    from kingfisher_process_spark.plans.base import load_tables
    from kingfisher_process_spark.session import get_spark

    spark = get_spark("kps-r12-train")
    emb = load_tables(spark, sf_dir)["embeddings"]
    emb.limit(1).collect()  # JVM warm

    def clock(name, fn):
        fn()  # warm
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        print(f"{name}: {round(min(samples), 3)}  "
              f"(samples {[round(s, 2) for s in samples]})", flush=True)

    def one_init():
        d = tempfile.mkdtemp(prefix="kps_ab_train_")
        try:
            init_index(emb, d, cells=cells)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    clock(f"init_index(cells={cells})", one_init)
    clock("train_ivf_grid_centroids",
          lambda: train_ivf_grid_centroids(emb))
    clock("residual_pq_train", lambda: _train_pq_on(
        _residuals(_quantized(emb),
                   train_ivf_grid_centroids(emb)).select("vec_id", "qa")))


if __name__ == "__main__":
    main()
