"""Persistent ANN index: build-once/serve-many must reproduce the
oracle-checked in-plan probe bit for bit, and serving must read only
the probed cells' partitions."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from kingfisher_process_spark.functions.ann_index import (
    build_index, load_model, query_index)
from kingfisher_process_spark.functions.similarity import (
    N_QUERIES, ann_ivfpq_residual_topk)
from kingfisher_process_spark.plans.base import load_tables
from tests.conftest import SF_SMOKE


def test_index_serving_matches_in_plan_probe_and_prunes(spark, tmp_path):
    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    idx = str(tmp_path / "ann_idx")
    audit = build_index(spark, emb, idx)
    assert audit["n_vectors"] == emb.count()
    assert os.path.isfile(idx + "/model.json")
    model = load_model(idx)
    assert len(model["centroids"]) == audit["cells"]

    queries = emb.where(F.col("vec_id") < N_QUERIES)
    got = [tuple(r) for r in query_index(spark, idx, queries).collect()]
    want = [tuple(r) for r in
            ann_ivfpq_residual_topk(spark, SF_SMOKE).collect()]
    assert got == want  # bit-identical to the oracle-checked probe

    # the codes read must partition-prune to the probed cells
    probed = spark.read.parquet(idx + "/codes").where(
        F.col("cell").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^]]*cell", plan), plan


def test_upsert_encodes_with_frozen_model(spark, tmp_path):
    """Build on a prefix of the corpus, upsert the rest: the upserted
    vectors' codes must equal what a full encode under the SAME model
    produces, and queries see neighbors from both generations."""
    from kingfisher_process_spark.functions.ann_index import upsert_index
    from kingfisher_process_spark.functions.similarity import (
        _code_exprs, _quantized, _residuals)

    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    idx = str(tmp_path / "idx")
    old = emb.where(F.col("vec_id") < 400)
    new = emb.where(F.col("vec_id") >= 400)
    build_index(spark, old, idx)
    audit = upsert_index(spark, new, idx)
    assert audit["n_added"] == new.count()
    assert audit["n_vectors"] == emb.count()

    model = load_model(idx)
    cents = [list(map(int, c)) for c in model["centroids"]]
    rcbs = [[[int(v) for v in c] for c in m] for m in model["codebooks"]]
    want = (_residuals(_quantized(new), cents)
            .selectExpr("vec_id", "cell", *_code_exprs(rcbs)))
    got = (spark.read.parquet(idx + "/codes")
           .where(F.col("vec_id") >= 400)
           .select(*want.columns))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    hits = query_index(spark, idx, emb.where(F.col("vec_id") < N_QUERIES))
    ids = {r["neighbor_id"] for r in hits.collect()}
    assert any(i >= 400 for i in ids) and any(i < 400 for i in ids)


def test_upsert_retry_is_idempotent(spark, tmp_path):
    """Re-running the same upsert (operator retry) must not duplicate
    codes — a duplicated vector's subspace rows would double its ADC
    distance and corrupt rankings."""
    from kingfisher_process_spark.functions.ann_index import upsert_index

    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    idx = str(tmp_path / "idx")
    build_index(spark, emb.where(F.col("vec_id") < 400), idx)
    new = emb.where(F.col("vec_id") >= 400)
    first = upsert_index(spark, new, idx)
    again = upsert_index(spark, new, idx)
    assert first["n_added"] == new.count()
    assert again["n_added"] == 0
    assert again["n_vectors"] == emb.count()
    codes = spark.read.parquet(idx + "/codes")
    assert codes.count() == codes.select("vec_id").distinct().count()
