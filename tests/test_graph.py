"""PageRank beyond the probe: dangling-mass redistribution and mass
conservation on a fixture graph with sinks."""

from __future__ import annotations

from kingfisher_process_spark.functions.graph import (
    PR_SCALE, pagerank_ranks)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src bigint, dst bigint, w bigint")


def test_dangling_redistribution_conserves_mass(spark):
    """Star-into-sink graph: 1,2,3 -> 4, node 4 has no out-edges. The
    default form leaks node 4's mass every iteration; dangling=True
    returns it, so total rank stays ~|nodes|*SCALE (minus bounded
    floor-rounding loss) and sources keep nonzero rank."""
    e = _edges(spark, [(1, 4, 1), (2, 4, 1), (3, 4, 1)])
    n = 4
    iters = 5
    ranks = {r["node"]: r["rank"]
             for r in pagerank_ranks(e, iters=iters, dangling=True).collect()}
    assert set(ranks) == {1, 2, 3, 4}
    total = sum(ranks.values())
    # per iteration the floor-divisions lose < n + n_dangling units
    assert abs(total - n * PR_SCALE) < iters * 3 * n
    assert ranks[4] > ranks[1] > 0  # sink is the most central
    assert ranks[1] == ranks[2] == ranks[3]

    # the default (probe) form: sinks are not even nodes, and the
    # dangling mass leaks — documented divergence
    leaky = {r["node"]: r["rank"]
             for r in pagerank_ranks(e, iters=iters).collect()}
    assert set(leaky) == {1, 2, 3}


def test_dangling_matches_default_on_sink_free_graph(spark):
    """On a graph where every node has out-edges (e.g. any symmetric
    graph) the two forms must agree exactly — dangling mass is zero,
    the share term is 0, and the node sets coincide."""
    e = _edges(spark, [(1, 2, 2), (2, 1, 2), (2, 3, 1), (3, 2, 1),
                       (1, 3, 1), (3, 1, 1)])
    a = sorted(tuple(r) for r in pagerank_ranks(e, iters=3).collect())
    b = sorted(tuple(r) for r in
               pagerank_ranks(e, iters=3, dangling=True).collect())
    assert a == b


def test_convergence_deltas_shrink(spark):
    e = _edges(spark, [(1, 2, 1), (2, 3, 1), (3, 1, 1), (1, 3, 2)])
    deltas: list[int] = []
    pagerank_ranks(e, iters=8, deltas=deltas)
    assert len(deltas) == 8
    # geometric decay at the damping rate (0.85^k), monotone after the
    # first step; the CLI test pins the deep-iteration (20+) regime
    assert all(b <= a for a, b in zip(deltas[1:], deltas[2:]))
    assert deltas[-1] < deltas[0] // 3
