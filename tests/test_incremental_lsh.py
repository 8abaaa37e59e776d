"""Incremental LSH maintenance: the per-trigger step must be
replay-idempotent under at-least-once foreachBatch (r10 advice) — a
replayed trigger appends nothing to the bucket history, emits no
self-pairs, and its re-emitted pair rows carry the SAME
n_shared_bands the first run emitted (COUNT DISTINCT band), so the
consumer's MAX-fold converges to the batch oracle regardless."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from kingfisher_process_spark.functions.dedup import (
    _LSH_BUCKET_SCHEMA, d_minhash_lsh_pairs, incremental_lsh_step)
from kingfisher_process_spark.plans.base import load_tables
from tests.conftest import SF_SMOKE


def _fold(spark, pairs_dir):
    out = spark.read.schema(
        "doc_a BIGINT, doc_b BIGINT, n_shared_bands BIGINT") \
        .parquet(pairs_dir)
    return {(r["doc_a"], r["doc_b"]): r["n_shared_bands"] for r in
            (out.groupBy("doc_a", "doc_b")
             .agg(F.max("n_shared_bands").alias("n_shared_bands"))
             .collect())}


def test_replayed_trigger_is_idempotent(spark, tmp_path):
    docs = load_tables(spark, SF_SMOKE)["documents"] \
        .select("doc_id", "text")
    hist = str(tmp_path / "buckets")
    pairs = str(tmp_path / "pairs")
    a = docs.where(F.pmod(F.hash("doc_id"), F.lit(2)) == 0)
    b = docs.where(F.pmod(F.hash("doc_id"), F.lit(2)) == 1)
    incremental_lsh_step(a, hist, pairs)
    incremental_lsh_step(b, hist, pairs)
    first = _fold(spark, pairs)
    n_hist = spark.read.schema(_LSH_BUCKET_SCHEMA).parquet(hist).count()
    n_pair_files = len(glob.glob(os.path.join(pairs, "*.parquet")))

    # at-least-once: trigger B fires again with its buckets already in
    # the history
    incremental_lsh_step(b, hist, pairs)
    again = _fold(spark, pairs)

    # history did not grow (anti-join on (doc_id, band))
    assert spark.read.schema(_LSH_BUCKET_SCHEMA).parquet(hist).count() \
        == n_hist
    # pair rows were re-emitted (new files) but fold to the same map
    assert len(glob.glob(os.path.join(pairs, "*.parquet"))) \
        > n_pair_files
    assert again == first
    # no self-pairs (the n.doc_id != h.doc_id guard)
    assert all(da != db for da, db in again)


def test_two_slice_union_matches_batch_pairs(spark, tmp_path):
    docs = load_tables(spark, SF_SMOKE)["documents"] \
        .select("doc_id", "text")
    hist = str(tmp_path / "buckets")
    pairs = str(tmp_path / "pairs")
    for i in range(2):
        incremental_lsh_step(
            docs.where(F.pmod(F.hash("doc_id"), F.lit(2)) == i),
            hist, pairs)
    got = _fold(spark, pairs)
    want = {(r["doc_a"], r["doc_b"]): r["n_shared_bands"] for r in
            d_minhash_lsh_pairs(spark, SF_SMOKE).collect()}
    assert got == want
