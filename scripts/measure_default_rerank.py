#!/usr/bin/env python
"""Default-path rerank recall at 200k (judge r10 #4 "Done" evidence):
build a 64-cell store_vectors index over the 200k clustered fixture
and serve ``query_index(rerank=True)`` WITH NO SHORTLIST FLAG — the
occupancy-scaled default must hold recall@10 >= 0.9 where the old
fixed 4x10 shortlist measured 0.417. The fixed tier is measured next
to it (explicit integer rerank_factor) so the delta is in one table.

Usage: python scripts/measure_default_rerank.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kingfisher_process_spark.functions.ann_index import (  # noqa: E402
    build_index, query_index)
from kingfisher_process_spark.functions.similarity import (  # noqa: E402
    RERANK_FACTOR, TOP_K)
from kingfisher_process_spark.session import get_spark  # noqa: E402
from scripts.sweep_ann_serving import (  # noqa: E402
    CLUSTERED_QUERIES, exact_truth_numpy, load_normalized,
    make_clustered_embeddings, _recall)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("default-rerank-measure")
    fix = tempfile.mkdtemp(prefix="kps_defrr_")
    path = make_clustered_embeddings(fix, n=n)
    xn = load_normalized(path)
    truth = exact_truth_numpy(xn, CLUSTERED_QUERIES, TOP_K)
    emb = spark.read.parquet(path)
    queries = emb.where(F.col("vec_id") < CLUSTERED_QUERIES)
    idx = tempfile.mkdtemp(prefix="kps_defrr_idx_")
    t0 = time.perf_counter()
    build_index(spark, emb, idx, cells=64, store_vectors=True,
                train_frac=0.1)
    build_s = time.perf_counter() - t0

    def serve(**kw):
        query_index(spark, idx, queries, n_probe=8, rerank=True,
                    **kw).collect()  # warm
        best, hits = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            hits = query_index(spark, idx, queries, n_probe=8,
                               rerank=True, **kw).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        got = {}
        for r in hits:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return round(best, 3), round(_recall(got, truth), 4)

    # THE DEFAULT — no shortlist flag anywhere
    d_serve, d_recall = serve()
    # the old fixed tier, for the same-table delta
    f_serve, f_recall = serve(rerank_factor=RERANK_FACTOR)
    print(json.dumps({
        "n_vectors": n, "cells": 64, "n_probe": 8,
        "build_s": round(build_s, 1), "train_frac": 0.1,
        "default_occupancy": {"serve_s": d_serve,
                              "recall_at_10": d_recall},
        "fixed_40": {"serve_s": f_serve, "recall_at_10": f_recall},
    }), flush=True)
    assert d_recall >= 0.9, d_recall


if __name__ == "__main__":
    main()
