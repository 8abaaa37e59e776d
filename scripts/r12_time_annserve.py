"""Focused solo timing for the persisted-index serving paths (r12).

Builds the bench's three index variants once (outside the timer, like
bench.py) and times the serve calls min-of-3 — the A/B harness for
serving-path optimizations.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from kingfisher_process_spark.functions.ann_index import (
        build_index, query_index)
    from kingfisher_process_spark.functions.similarity import RERANK_FACTOR
    from kingfisher_process_spark.session import get_spark

    spark = get_spark("kps-r12-annserve")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.where(F.col("vec_id") < 5)

    idx = tempfile.mkdtemp(prefix="kps_ab_annidx_")
    build_index(spark, emb, idx)
    idx_rr = tempfile.mkdtemp(prefix="kps_ab_annidxrr_")
    build_index(spark, emb, idx_rr, store_vectors=True)

    def clock(name, fn):
        fn()  # warm
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        print(f"{name}: {round(min(samples), 3)}  "
              f"(samples {[round(s, 2) for s in samples]})", flush=True)

    clock("serve", lambda: query_index(spark, idx, queries).collect())
    clock("serve_rerank_fixed",
          lambda: query_index(spark, idx_rr, queries, rerank=True,
                              rerank_factor=RERANK_FACTOR).collect())
    clock("serve_rerank_occupancy",
          lambda: query_index(spark, idx_rr, queries, rerank=True).collect())


if __name__ == "__main__":
    main()
