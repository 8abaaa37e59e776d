"""Isolate the r12 'fused-stage pathology' (judge r12 #5): why does the
exchange-free map-side argmax cell assignment lose to the
crossJoin+partial-agg exchange form in ann_ivf_topk?

Hypothesis under test: Spark's ONLY cross-branch physical reuse is
ReusedExchange. The assignment table feeds TWO consumers (the candidate
join's corpus side and, transitively, the rerank). With the exchange
form, both consumers read one shuffle's output; with the exchange-free
form there is no reuse point, so every consumer branch re-embeds the
full scan+argmax subtree and the 'saved' exchange is paid back as N
recomputations of the assignment scan.

The script builds both forms, asserts value equality, counts plan
occurrences of the parquet scan / argmax subtree, and interleaves warm
noop timings of (a) assignment alone, (b) the full probe pipeline.

Usage: python scripts/r13_ab_ivf_fused.py
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kingfisher_process_spark.functions.similarity import (
    K_CELLS, N_PROBE, N_QUERIES, TOP_K, dot_col, norm_col)
from kingfisher_process_spark.plans.base import load_tables
from kingfisher_process_spark.session import get_spark


def fused_pipeline(spark, sf_dir):
    """The r12 reverted shape, reconstructed: centroids collected to a
    literal array, cell assignment as a map-side HOF argmax (no corpus
    exchange before the candidate join)."""
    from kingfisher_process_spark.functions.dedup import fanout

    t = load_tables(spark, sf_dir)
    cent_rows = (t["embeddings"].where(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + K_CELLS))
        .select("vec_id", "embedding").orderBy("vec_id").collect())

    def dec(x):
        return f"CAST({x} AS DECIMAL(14,12))"

    # literal centroid array with precomputed norms (decimal-exact, same
    # arithmetic as dot_col/norm_col)
    cb = "array({})".format(", ".join(
        "named_struct('cid', CAST({cid} AS BIGINT), 'ce', array({v}))".format(
            cid=r["vec_id"],
            v=", ".join(f"CAST({float(x)} AS DOUBLE)" for x in r["embedding"]))
        for r in cent_rows))
    # cos(v, c) = dot/(nv*nc); argmax by (cos DESC, cid ASC) ==
    # array_max of struct(cos, -cid)
    dot = ("aggregate(zip_with(embedding, cb.ce,"
           " (x, y) -> CAST(CAST(x AS DOUBLE) * y AS DECIMAL(14,12))),"
           " CAST(0 AS DECIMAL(19,12)),"
           " (acc, x) -> CAST(acc + x AS DECIMAL(19,12)))")
    emb = fanout(t["embeddings"]).select(
        "vec_id", "embedding", norm_col(F.col("embedding")).alias("nv"))
    scored_cells = (
        f"transform({cb}, cb -> named_struct("
        f" 'cos', CAST({dot} AS DOUBLE) / (nv * aggregate(zip_with(cb.ce,"
        f"   cb.ce, (x, y) -> CAST(x * y AS DECIMAL(14,12))),"
        f"   CAST(0 AS DECIMAL(19,12)),"
        f"   (acc, x) -> CAST(acc + x AS DECIMAL(19,12)), s -> sqrt(CAST(s AS DOUBLE)))),"
        f" 'neg', -cb.cid))")
    asg = emb.selectExpr(
        "vec_id AS neighbor_id", "embedding AS ne", "nv AS nn",
        f"-array_max({scored_cells}).neg AS cid")
    probes_df = emb.where(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS query_id", "embedding AS qe", "nv AS nq",
        f"explode(transform(slice(array_sort({scored_cells},"
        f" (l, r) -> CASE WHEN l.cos > r.cos THEN -1 WHEN l.cos < r.cos THEN 1"
        f" WHEN l.neg > r.neg THEN -1 WHEN l.neg < r.neg THEN 1 ELSE 0 END),"
        f" 1, {N_PROBE}), s -> -s.neg)) AS cid")
    scored = (
        asg.join(F.broadcast(probes_df), "cid")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                (dot_col(F.col("qe"), F.col("ne")) / (F.col("nq") * F.col("nn")))
                .alias("cosine")))
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return asg, (
        scored.withColumn("rnk", F.row_number().over(wk))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
        .orderBy("query_id", "rnk"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kps-r13-ivf-fused")
    import __spark_entry__ as em

    reg = em._registry()
    current = reg["ann_ivf_topk"].fn(spark, sf_dir)
    asg_fused, fused = fused_pipeline(spark, sf_dir)

    a = [tuple(r) for r in current.collect()]
    b = [tuple(r) for r in fused.collect()]
    assert a == b, f"value mismatch: {len(a)} vs {len(b)}; " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), None))
    print(f"equality OK ({len(a)} rows)")

    def plan_counts(df, label):
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
        exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        reused = plan.count("ReusedExchange")
        argmax = plan.count("array_max") + plan.count("max(struct(cos")
        print(f"{label}: parquet scans={scans} Exchange={exchanges} "
              f"ReusedExchange={reused} argmax-subtrees~{argmax} "
              f"plan_chars={len(plan)}")

    plan_counts(current, "exchange form ")
    plan_counts(fused, "fused form    ")

    # timings: assignment alone, then full pipeline, interleaved
    for label, df in (("asg-only fused", asg_fused),):
        df.write.format("noop").mode("overwrite").save()
    ts: dict[str, list] = {}
    for _ in range(3):
        for label, df in (("full exchange", current), ("full fused", fused),
                          ("asg-only fused", asg_fused)):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.setdefault(label, []).append(time.perf_counter() - t0)
    for label, xs in ts.items():
        print(f"{label}: min {min(xs):.3f}  {[round(x, 3) for x in xs]}")


if __name__ == "__main__":
    main()
