"""Iterative graph analytics — PageRank as a relational fixpoint.

The dedup family already runs one iterative graph algorithm
(connected components, `d_dup_clusters*`); this adds the weighted-graph
ranking shape: build the item co-purchase graph (parts appearing in the
same order), then run Jacobi PageRank iterations where each round is
ONE join (ranks → edges) + ONE groupBy (sum contributions per dst) —
the canonical Pregel-on-DataFrames step. All arithmetic is scaled
BIGINT with explicit floor division, so the DuckDB oracle replays the
iterations in unrolled CTEs and hash-matches exactly (float PageRank
would hit cross-engine summation-order drift).

Scale shape: the edge build is a self-join on the order key (partial
aggregation collapses duplicate pairs before the shuffle); each
iteration shuffles |edges| once on dst; ranks and degrees are
|nodes|-sized and broadcast when small. localCheckpoint between
iterations truncates lineage exactly like the cluster-propagation loop.

Reference analogue: none (extends the iterative family, SURVEY §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kingfisher_process_spark.plans.base import load_tables, probe

PR_SCALE = 1_000_000  # rank fixed-point scale
PR_ITERS = 3          # unrolled in the oracle; a CLI run sets 20+
PR_TOP = 20


def _pr_iter_sql(k: int) -> str:
    """One Jacobi iteration as SQL CTEs: r{k} -> r{k+1}."""
    return f"""
    contrib{k} AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(floor(r{k}.rank * e.w * 1.0 / d.outw)
                        AS BIGINT)) AS BIGINT) AS s
      FROM edges e
      JOIN r{k} ON r{k}.node = e.src
      JOIN deg d ON d.node = e.src
      GROUP BY e.dst),
    r{k + 1} AS (
      SELECT n.node,
             CAST({int(0.15 * PR_SCALE)}
                  + floor(85 * COALESCE(c.s, 0) / 100.0) AS BIGINT) AS rank
      FROM nodes n LEFT JOIN contrib{k} c ON c.node = n.node)"""


def copurchase_edges(li: DataFrame) -> DataFrame:
    """Weighted co-purchase edges from (l_orderkey, l_partkey) lines:
    parts sharing an order, weight = co-occurrence count. Partial
    aggregation collapses duplicate pairs before the shuffle."""
    a = li.selectExpr("l_orderkey AS k", "l_partkey AS src")
    b = li.selectExpr("l_orderkey AS k2", "l_partkey AS dst")
    return (a.join(b, (F.col("k") == F.col("k2"))
                   & (F.col("src") != F.col("dst")))
            .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
            .localCheckpoint())


def pagerank_ranks(edges: DataFrame, iters: int = PR_ITERS,
                   deltas: list[int] | None = None,
                   dangling: bool = False) -> DataFrame:
    """Integer-exact Jacobi PageRank over (src, dst, w) edges: ``iters``
    rounds of ONE join + ONE groupBy, BIGINT fixed-point throughout.
    Pass ``deltas`` to collect the per-iteration L1 rank delta
    (Σ|rank_new − rank_old| in PR_SCALE units — the convergence report;
    costs one extra |nodes|-join per iteration, only when requested).

    ``dangling=False`` (the probe's form): nodes are those WITH
    out-edges and dangling mass is NOT redistributed — a node with no
    outgoing edges contributes nothing, so ranks sum to less than
    |nodes|·SCALE. The co-purchase graph is symmetric, so no mass
    dangles there and the forms coincide.

    ``dangling=True`` (conventional PageRank): nodes are src ∪ dst, and
    each iteration redistributes floor(Σ dangling rank / |nodes|) to
    every node before damping — still exact BIGINT (the floor division
    loses < |nodes| units of mass per iteration to rounding, the price
    of cross-engine determinism). Costs one 1-row aggregate per
    iteration (the dangling-mass scalar); the shuffle shape is
    unchanged."""
    # (node, outw) materialized ONCE and carried through every
    # iteration's rank table (r12): the old form re-derived `deg` and
    # `nodes` from `edges` INSIDE each iteration's plan — two extra
    # |edges|-scale aggregations per round. Attaching the static outw
    # to the rank rows makes each round exactly ONE broadcast join
    # (ranks into edges) + ONE groupBy + ONE |nodes|-scale left join,
    # and turns the dangling-mass anti-join into a filter on the rank
    # table (outw IS NULL ⇔ no out-edges).
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").alias("outw"))
    if dangling:
        nd = (edges.select(F.col("src").alias("node"))
              .unionByName(edges.select(F.col("dst").alias("node")))
              .distinct()
              .join(deg, "node", "left")
              .localCheckpoint())
        n_nodes = nd.count()
    else:
        # nodes ≡ deg's keys when sinks drop; lazy — materializes
        # inside iteration 1's job rather than as its own dispatch
        nd = deg.localCheckpoint(eager=False)
    ranks = nd.select("node", "outw",
                      F.lit(PR_SCALE).cast("bigint").alias("rank"))
    for _ in range(iters):
        contrib = (edges
                   .join(ranks.withColumnRenamed("node", "src"), "src")
                   .selectExpr(
                       "dst AS node",
                       "CAST(floor(rank * w * 1.0 / outw) AS BIGINT) AS c")
                   .groupBy("node").agg(F.sum("c").alias("s")))
        share = 0
        if dangling:
            dm = (ranks.where(F.col("outw").isNull())
                  .agg(F.sum("rank")).collect()[0][0] or 0)
            share = int(dm) // n_nodes
        nxt = (nd.join(contrib, "node", "left")
               .selectExpr(
                   "node", "outw",
                   f"CAST({int(0.15 * PR_SCALE)}"
                   f" + floor(85 * (COALESCE(s, 0) + {share}) / 100.0)"
                   f" AS BIGINT) AS rank")
               .localCheckpoint())
        if deltas is not None:
            deltas.append(int(
                ranks.selectExpr("node", "rank AS old")
                .join(nxt, "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
                .collect()[0][0] or 0))
        ranks = nxt
    return ranks.select("node", "rank")


@probe(
    "g_item_pagerank",
    f"""
    WITH pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey),
    edges AS (SELECT src, dst, w FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS outw
            FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM nodes),
    {",".join(_pr_iter_sql(k) for k in range(PR_ITERS))}
    SELECT node AS partkey, rank
    FROM r{PR_ITERS}
    ORDER BY rank DESC, partkey
    LIMIT {PR_TOP}
    """,
    survey_ids="iterative-ext,J1,A5,O5",
)
def g_item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PR_TOP} parts by integer-exact PageRank over the co-purchase
    graph after {PR_ITERS} Jacobi iterations. Contribution of u to v is
    floor(rank(u) * w(u,v) / outweight(u)); the damping step is
    0.15*SCALE + floor(85 * Σ / 100) — every operation BIGINT, so
    partial-aggregation order cannot change the result and the oracle's
    unrolled replay matches bit-exactly."""
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_partkey")
    ranks = pagerank_ranks(copurchase_edges(li), iters=PR_ITERS)
    return (ranks.selectExpr("node AS partkey", "rank")
            .orderBy(F.desc("rank"), "partkey").limit(PR_TOP))
