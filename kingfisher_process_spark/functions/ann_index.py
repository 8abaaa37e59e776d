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

import contextlib
import glob as _glob
import json
import os
import shutil
import uuid

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


@contextlib.contextmanager
def _writer_lock(index_dir: str):
    """Single-writer contract (r6 advice): two concurrent upserts could
    both pass the existence anti-join and double-append the same vec_id,
    which corrupts ADC rankings. An O_EXCL lock file in the index dir
    serializes writers; a second writer fails fast rather than corrupting
    the index. (Readers never take the lock — appends and the staged
    compaction swap are both safe to read through.)"""
    path = os.path.join(index_dir, ".writer_lock")
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"index writer lock held: {path} — another upsert/compaction "
            "is running (or crashed; remove the lock file after verifying "
            "no writer is alive)") from None
    try:
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.remove(path)


def _recover_codes(codes_dir: str) -> bool:
    """Complete a crash-stranded compaction swap on the codes tree.
    Mirrors streaming.maintenance.recover_store at cell granularity:
    staging with a ``_COMPLETE`` marker holds the only copy of its
    folded cells once their dirs moved to trash — finish that swap
    before any read. Cheap when there is nothing to do."""
    staging = os.path.join(codes_dir, ".compact_staging")
    marker = os.path.join(staging, "_COMPLETE")
    finished = False
    if os.path.isfile(marker):
        with open(marker) as f:
            cells = [c for c in f.read().split(",") if c]
        _finish_cell_swap(codes_dir, staging, cells)
        finished = True
    for t in _glob.glob(os.path.join(codes_dir, ".compact_trash-*")):
        shutil.rmtree(t, ignore_errors=True)
    return finished


def _finish_cell_swap(codes_dir: str, staging: str, cells: list[str]) -> None:
    """Swap staged cell partitions into place. Idempotent: a cell whose
    staged dir is gone was already swapped by a prior attempt."""
    trash = os.path.join(codes_dir, f".compact_trash-{uuid.uuid4().hex[:8]}")
    os.makedirs(trash, exist_ok=True)
    for c in cells:
        staged = os.path.join(staging, f"cell={c}")
        if not os.path.isdir(staged):
            continue
        live = os.path.join(codes_dir, f"cell={c}")
        if os.path.isdir(live):
            os.rename(live, os.path.join(trash, f"cell={c}"))
        os.rename(staged, live)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)


def compact_index(spark: SparkSession, index_dir: str,
                  min_files: int = 2) -> dict:
    """OPTIMIZE for the codes tree: fold every cell partition holding
    ``min_files``+ parquet files (the residue of upsert appends) back to
    one file per cell, via the staged-swap discipline of
    streaming/maintenance.py applied at cell granularity. Serving parity
    before/after is pinned by tests/test_ann_index.py. Only cells above
    the threshold are rewritten — compaction I/O is O(fragmented cells),
    not O(index)."""
    codes_dir = os.path.join(index_dir, "codes")
    with _writer_lock(index_dir):
        _recover_codes(codes_dir)
        frag = []
        for d in _glob.glob(os.path.join(codes_dir, "cell=*")):
            if len(_glob.glob(os.path.join(d, "*.parquet"))) >= min_files:
                frag.append(os.path.basename(d).split("=", 1)[1])
        if not frag:
            return {"n_cells_compacted": 0, "index": index_dir}
        staging = os.path.join(codes_dir, ".compact_staging")
        shutil.rmtree(staging, ignore_errors=True)
        src = [os.path.join(codes_dir, f"cell={c}") for c in frag]
        # one task per cell → one output file per cell directory
        (spark.read.option("basePath", codes_dir).parquet(*src)
         .repartition("cell")
         .write.mode("overwrite").partitionBy("cell").parquet(staging))
        with open(os.path.join(staging, "_COMPLETE"), "w") as f:
            f.write(",".join(frag))
        _finish_cell_swap(codes_dir, staging, frag)
        return {"n_cells_compacted": len(frag), "index": index_dir}


def query_index(spark: SparkSession, index_dir: str, queries: DataFrame,
                top_k: int = TOP_K, n_probe: int = N_PROBE) -> DataFrame:
    """Serve top-k from the persisted index: route each query to its
    ``n_probe`` nearest trained cells, build the per-(query, cell)
    residual ADC tables (broadcast), and score ONLY the probed cells'
    code partitions — the read is partition-pruned by the cell literals
    (plan-pinned in tests), never a full index scan."""
    _recover_codes(os.path.join(index_dir, "codes"))
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


def _existing_ids(spark: SparkSession, codes_dir: str,
                  cells: list[int]) -> DataFrame:
    """vec_ids already present in the given cells — the upsert's
    idempotence probe. The ``cell IN (...)`` literal filter reaches the
    scan as a PartitionFilter (plan-pinned in tests), so the read is
    O(touched cells), never the whole codes tree."""
    return (spark.read.parquet(codes_dir)
            .where(F.col("cell").isin(cells))
            .select("vec_id"))


def upsert_index(spark: SparkSession, emb: DataFrame,
                 index_dir: str) -> dict:
    """Incremental index maintenance: encode NEW vectors with the
    FROZEN model (no retraining — the production contract for online
    adds; retrain by rebuilding when drift warrants) and append them to
    the cell partitions. Single-writer (``.writer_lock``); fold the
    appended small files with ``compact_index`` past a file-count
    threshold. Returns the upsert audit."""
    codes_dir = os.path.join(index_dir, "codes")
    model = load_model(index_dir)
    cents = [list(map(int, c)) for c in model["centroids"]]
    rcbs = [[[int(v) for v in c] for c in m] for m in model["codebooks"]]
    with _writer_lock(index_dir):
        _recover_codes(codes_dir)
        codes = (_residuals(_quantized(emb), cents)
                 .selectExpr("vec_id", "cell", *_code_exprs(rcbs))
                 .localCheckpoint())
        # idempotent under retries: a duplicated vec_id would double its
        # ADC contributions in query_index (each subspace code row
        # matches twice), silently corrupting rankings — anti-join the
        # existing ids before appending. The FROZEN model routes a
        # retried vec_id to the SAME cell, so the existence read prunes
        # to the new codes' cells (r6 advice: the full-tree vec_id read
        # was O(index) per upsert; this is O(touched cells)).
        new_cells = sorted({r["cell"] for r in
                            codes.select("cell").distinct().collect()})
        existing = _existing_ids(spark, codes_dir, new_cells)
        codes = codes.join(existing, "vec_id", "left_anti").localCheckpoint()
        n_new = codes.count()
        if n_new:
            (codes.repartition("cell").write.mode("append")
             .partitionBy("cell").parquet(codes_dir))
    total = spark.read.parquet(codes_dir).count()
    return {"n_added": n_new, "n_vectors": total, "index": index_dir,
            "cells_touched": len(new_cells)}
