"""Interleaved warm A/B for g_item_pagerank's candidate optimizations.

Variants (full probe shape: edge build + PR_ITERS Jacobi iterations +
top-20 collect):
  A  committed form: self-join edge build, eager per-iteration
     localCheckpoint
  B  collect_list + in-stage pair explode edge build (one lineitem
     exchange, no sort-merge join), eager iterations
  C  committed edge build, LAZY per-iteration checkpoints (one job for
     the whole iteration chain, lineage still truncated per round)
  D  B + C combined

All four must return identical rows (verified before timing).
Usage: python scripts/r12_ab_pagerank.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def edges_join(li: DataFrame) -> DataFrame:
    a = li.selectExpr("l_orderkey AS k", "l_partkey AS src")
    b = li.selectExpr("l_orderkey AS k2", "l_partkey AS dst")
    return (a.join(b, (F.col("k") == F.col("k2"))
                   & (F.col("src") != F.col("dst")))
            .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
            .localCheckpoint())


def edges_grouped(li: DataFrame) -> DataFrame:
    return (li.groupBy("l_orderkey")
            .agg(F.collect_list("l_partkey").alias("ps"))
            .select(F.explode("ps").alias("src"), "ps")
            .select("src", F.explode("ps").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
            .localCheckpoint())


def ranks_loop(edges: DataFrame, iters: int, lazy: bool) -> DataFrame:
    from kingfisher_process_spark.functions.graph import PR_SCALE

    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.sum("w").alias("outw"))
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
        nxt = (nd.join(contrib, "node", "left")
               .selectExpr(
                   "node", "outw",
                   f"CAST({int(0.15 * PR_SCALE)}"
                   f" + floor(85 * COALESCE(s, 0) / 100.0)"
                   f" AS BIGINT) AS rank"))
        ranks = nxt.localCheckpoint(eager=not lazy)
    return ranks.select("node", "rank")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kingfisher_process_spark.functions.graph import PR_ITERS, PR_TOP
    from kingfisher_process_spark.plans.base import load_tables
    from kingfisher_process_spark.session import get_spark

    spark = get_spark("kps-r12-ab-pagerank")

    def run(edge_fn, lazy: bool):
        li = load_tables(spark, sf_dir)["lineitem"].select(
            "l_orderkey", "l_partkey")
        ranks = ranks_loop(edge_fn(li), PR_ITERS, lazy)
        return (ranks.selectExpr("node AS partkey", "rank")
                .orderBy(F.desc("rank"), "partkey").limit(PR_TOP).collect())

    variants = {
        "A_join_eager": lambda: run(edges_join, lazy=False),
        "B_grouped_eager": lambda: run(edges_grouped, lazy=False),
        "C_join_lazy": lambda: run(edges_join, lazy=True),
        "D_grouped_lazy": lambda: run(edges_grouped, lazy=True),
    }

    # equality check at sf0.01 (fast) and sf0.1 once
    for check_sf in ["/root/testdata/sf0.01", sf_dir]:
        got = {}
        for name, fn in variants.items():
            sd, os.environ["SPARK_GRAFT_SF_DIR"] = (
                os.environ.get("SPARK_GRAFT_SF_DIR"), check_sf)
            li = load_tables(spark, check_sf)["lineitem"].select(
                "l_orderkey", "l_partkey")
            edge_fn = edges_join if "join" in name else edges_grouped
            ranks = ranks_loop(edge_fn(li), PR_ITERS, "lazy" in name)
            got[name] = [tuple(r) for r in
                         ranks.selectExpr("node AS partkey", "rank")
                         .orderBy(F.desc("rank"), "partkey")
                         .limit(PR_TOP).collect()]
            if sd is not None:
                os.environ["SPARK_GRAFT_SF_DIR"] = sd
        base = got["A_join_eager"]
        for name, rows in got.items():
            assert rows == base, f"{name} differs at {check_sf}"
        print(f"equality OK at {check_sf}", flush=True)

    # warmup each variant once
    for fn in variants.values():
        fn()
    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            samples[name].append(time.perf_counter() - t0)
    for name, ss in samples.items():
        print(f"{name}: min {round(min(ss), 3)}  samples "
              f"{[round(s, 2) for s in ss]}", flush=True)


if __name__ == "__main__":
    main()
