#!/usr/bin/env python
"""Measure the persisted-index serving crossover at a production-shaped
config (judge r6 #5): default K_CELLS=16/N_PROBE=4 (the oracle
miniature) vs K_CELLS=64/N_PROBE=8. Reports serve latency (build
outside the timer, min of reps) and recall@10 against exact
brute-force cosine. Results are recorded in SCALE.md §13.

Usage: python scripts/sweep_ann_serving.py [sf_dir]
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
    N_QUERIES, ann_brute_force_topk)
from kingfisher_process_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("ann-serving-sweep")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_vec = emb.count()
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    truth = {}
    for r in ann_brute_force_topk(spark, sf_dir).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    rows = []
    for cells, n_probe in [(16, 4), (64, 8)]:
        idx = tempfile.mkdtemp(prefix=f"kps_sweep_ann{cells}_")
        t0 = time.perf_counter()
        build_index(spark, emb, idx, cells=cells)
        build_s = time.perf_counter() - t0
        # warm once, then min-of-reps on the serving path only
        query_index(spark, idx, queries, n_probe=n_probe).collect()
        best, hits = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            hits = query_index(spark, idx, queries, n_probe=n_probe).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        got = {}
        for r in hits:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        # got.get: a query whose probed cells yield zero candidates is
        # absent from got — that is recall 0 for it, not a KeyError
        recall = sum(len(got.get(q, set()) & truth[q]) for q in truth) / sum(
            len(truth[q]) for q in truth)
        rows.append({
            "cells": cells, "n_probe": n_probe,
            "fraction_scanned": round(n_probe / cells, 4),
            "build_s": round(build_s, 3),
            "serve_s": round(best, 4),
            "recall_at_10": round(recall, 4),
            "n_vectors": n_vec,
        })
        print(json.dumps(rows[-1]))
    print(json.dumps({"sf_dir": sf_dir, "rows": rows}))


if __name__ == "__main__":
    main()
