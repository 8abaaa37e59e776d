"""Persistent ANN index — the build-once / serve-many operational form
of the residual IVF-PQ probes.

`ann_ivfpq_residual_topk` trains and serves in one plan; a production
deployment trains once and serves millions of queries against an index
ON DISK. The index directory is:

- ``model.json`` — trained coarse centroids + residual PQ codebooks +
  the build parameters (driver-sized: k×dims + m×k×dsub ints),
- ``codes/`` — one row per corpus vector (vec_id, code_0..code_{M-1}),
  parquet **partitioned by cell**, so a query's probed cells map to a
  partition-pruned read: serving I/O is ``n_probe/k`` of the index, and
  the raw vectors never ship at all (8 bytes/vector of codes).

``query_index`` replays exactly the probes' serving arithmetic (exact
grid integers, broadcast per-(query, cell) ADC tables), so its output
is bit-identical to `ann_ivfpq_residual_topk` at the same parameters —
pinned by tests/test_ann_index.py.

Reference analogue: none (operational extension of the similarity
family, SURVEY §2.13).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kingfisher_process_spark.functions.similarity import (
    _code_exprs, _quantized, _residuals, _train_pq_on, adc_topk,
    explode_codes_narrow, route_probes, train_ivf_grid_centroids,
    K_CELLS, N_PROBE, PQ_M, PQ_TRAIN_K, TOP_K)


def build_index(spark: SparkSession, emb: DataFrame, out_dir: str,
                cells: int = K_CELLS, pq_k: int = PQ_TRAIN_K) -> dict:
    """Train the coarse quantizer and residual PQ codebooks, encode the
    corpus, and persist the index directory. Returns the build audit."""
    cents = train_ivf_grid_centroids(emb, k=cells)
    res = _residuals(_quantized(emb), cents)
    rcbs = _train_pq_on(res.select("vec_id", "qa"), k=pq_k)
    codes = res.selectExpr("vec_id", "cell", *_code_exprs(rcbs))
    (codes.repartition("cell").write.mode("overwrite")
     .partitionBy("cell").parquet(os.path.join(out_dir, "codes")))
    model = {
        "centroids": cents,
        "codebooks": rcbs,
        "params": {"cells": cells, "pq_k": pq_k, "pq_m": PQ_M},
    }
    with open(os.path.join(out_dir, "model.json"), "w") as f:
        json.dump(model, f)
    n = spark.read.parquet(os.path.join(out_dir, "codes")).count()
    return {"n_vectors": n, "cells": cells, "pq_k": pq_k,
            "bytes_per_vector": PQ_M, "index": out_dir}


def load_model(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "model.json")) as f:
        return json.load(f)


def query_index(spark: SparkSession, index_dir: str, queries: DataFrame,
                top_k: int = TOP_K, n_probe: int = N_PROBE) -> DataFrame:
    """Serve top-k from the persisted index: route each query to its
    ``n_probe`` nearest trained cells, build the per-(query, cell)
    residual ADC tables (broadcast), and score ONLY the probed cells'
    code partitions — the read is partition-pruned by the cell literals
    (plan-pinned in tests), never a full index scan."""
    model = load_model(index_dir)
    cents = [list(map(int, c)) for c in model["centroids"]]
    rcbs = [[[int(v) for v in c] for c in m] for m in model["codebooks"]]
    probes_df = route_probes(_quantized(queries), cents, n_probe=n_probe)
    # probed cells as LITERALS so the codes read partition-prunes
    probed = sorted({r["cell"] for r in
                     probes_df.select("cell").distinct().collect()})
    codes = (spark.read.parquet(os.path.join(index_dir, "codes"))
             .where(F.col("cell").isin(probed)))
    narrow = explode_codes_narrow(codes)
    return adc_topk(probes_df, narrow, rcbs, top_k=top_k)


def upsert_index(spark: SparkSession, emb: DataFrame,
                 index_dir: str) -> dict:
    """Incremental index maintenance: encode NEW vectors with the
    FROZEN model (no retraining — the production contract for online
    adds; retrain by rebuilding when drift warrants) and append them to
    the cell partitions. Appended files are small; fold them with the
    same compaction discipline as the streaming stores when the count
    grows. Returns the upsert audit."""
    model = load_model(index_dir)
    cents = [list(map(int, c)) for c in model["centroids"]]
    rcbs = [[[int(v) for v in c] for c in m] for m in model["codebooks"]]
    codes = (_residuals(_quantized(emb), cents)
             .selectExpr("vec_id", "cell", *_code_exprs(rcbs)))
    # idempotent under retries: a duplicated vec_id would double its ADC
    # contributions in query_index (each subspace code row matches
    # twice), silently corrupting rankings — anti-join the existing ids
    # (column-pruned read of just vec_id) before appending
    existing = (spark.read.parquet(os.path.join(index_dir, "codes"))
                .select("vec_id"))
    codes = codes.join(existing, "vec_id", "left_anti").localCheckpoint()
    n_new = codes.count()
    if n_new:
        (codes.repartition("cell").write.mode("append")
         .partitionBy("cell").parquet(os.path.join(index_dir, "codes")))
    total = spark.read.parquet(os.path.join(index_dir, "codes")).count()
    return {"n_added": n_new, "n_vectors": total, "index": index_dir}
