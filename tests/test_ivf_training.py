"""Distributed Lloyd's k-means (IVF coarse quantizer) vs a NumPy
reference implementation with identical init and tie rules."""

from __future__ import annotations

import numpy as np
import pytest

from kingfisher_process_spark.functions.similarity import train_ivf_centroids
from kingfisher_process_spark.plans.base import load_tables
from tests.conftest import SF_SMOKE


def _numpy_kmeans(X, k, iters):
    cents = X[:k].astype(np.float64).copy()
    for _ in range(iters):
        dots = X @ cents.T                     # (n, k) inner products
        cells = np.argmax(dots, axis=1)        # argmax ties -> smallest idx
        for c in range(k):
            mask = cells == c
            if mask.any():
                cents[c] = X[mask].mean(axis=0)
    return cents


@pytest.mark.parametrize("k,iters", [(4, 3), (8, 5)])
def test_trainer_matches_numpy(spark, k, iters):
    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    rows = emb.orderBy("vec_id").collect()
    X = np.array([list(map(float, r["embedding"])) for r in rows], dtype=np.float64)

    got = np.array(train_ivf_centroids(emb.orderBy("vec_id"), k=k, iters=iters))
    want = _numpy_kmeans(X, k, iters)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_trainer_is_map_side(spark):
    """The assignment must not join or explode: per iteration the only
    wide node is the k-row aggregate exchange."""
    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    cents = train_ivf_centroids(emb, k=4, iters=1)
    assert len(cents) == 4 and len(cents[0]) == 64
