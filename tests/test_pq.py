"""PQ distance algebra: the shared-partials regrouping must be
bit-identical to the naive per-centroid chain (decimal addition is exact
and associative — this test is the proof on real data)."""

from __future__ import annotations

from kingfisher_process_spark.functions.similarity import (
    PQ_COMBOS, PQ_K, PQ_M, _pq_dist2_sql, _pq_partial_exprs)
from kingfisher_process_spark.plans.base import load_tables
from tests.conftest import SF_SMOKE


def test_regrouped_partials_equal_naive_chains(spark):
    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    naive = [
        f"({_pq_dist2_sql('embedding', m, c)}) AS naive_{m}_{c}"
        for m in range(PQ_M) for c in range(PQ_K)
    ]
    df = emb.selectExpr("vec_id", *naive, *_pq_partial_exprs("embedding"))
    mismatch = " OR ".join(
        f"naive_{m}_{c} <> ({a}_{m} + {b}_{m})"
        for m in range(PQ_M) for c, (a, b) in enumerate(PQ_COMBOS))
    assert df.where(mismatch).count() == 0
    # and the comparison isn't vacuous
    assert df.count() > 0
