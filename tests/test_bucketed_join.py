"""Bucketed co-located joins: the write-once-join-many layout device.

Asserts the 100 TB claim directly on the physical plan: two tables
bucketed by the same key into the same bucket count join with ZERO
exchanges (and, with in-bucket sort, zero sorts) — the join reads
pre-matched files. A third case proves the guard: a bucketed table
joined to an unbucketed one still shuffles the unbucketed side only.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from kingfisher_process_spark.store import write_bucketed

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    stats = docs.select(
        "doc_id", F.length("text").alias("n_chars_v2"))
    write_bucketed(docs, "b_docs", ["doc_id"], N_BUCKETS,
                   path=str(base / "b_docs"), sort_by=["doc_id"])
    write_bucketed(stats, "b_stats", ["doc_id"], N_BUCKETS,
                   path=str(base / "b_stats"), sort_by=["doc_id"])
    yield spark.table("b_docs"), spark.table("b_stats")
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_stats")


def _executed_plan(df):
    df.collect()  # AQE finalizes the plan only after execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString prints the final plan AND the initial
    # plan; keep only the final section so operators aren't counted twice
    return plan.split("== Initial Plan ==")[0]


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    docs, stats = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = docs.join(stats, "doc_id").select("doc_id", "source",
                                                   "n_chars_v2")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_correct(spark, bucketed_pair):
    docs, stats = bucketed_pair
    joined = docs.join(stats, "doc_id")
    assert joined.count() == docs.count()
    bad = joined.where(F.col("n_chars_v2") != F.length("text")).count()
    assert bad == 0


def test_unbucketed_side_still_shuffles(spark, bucketed_pair):
    """Contrast case: joining a bucketed table to an unbucketed one
    shuffles only the unbucketed side — PROVIDED the shuffle partition
    count matches the bucket count (otherwise Spark re-shuffles both to
    its preferred parallelism; at real scale bucket counts are sized to
    the cluster so the counts agree)."""
    docs, _ = bucketed_pair
    plain = spark.read.parquet(
        f"{SF_SMOKE}/documents.parquet"
    ).select("doc_id", F.col("lang").alias("lang_v2"))
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", str(N_BUCKETS))
    try:
        plan = _executed_plan(docs.join(plain, "doc_id"))
        # exactly one side shuffles: the unbucketed one
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
