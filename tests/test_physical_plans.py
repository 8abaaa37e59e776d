"""Physical-plan assertions — the scale guarantees are properties of the
PLAN, not just the answer. Each headline probe's executed strategy is
pinned here: filters reach the parquet scan, projections prune the read
schema, small dimensions broadcast, aggregates partial-combine map-side,
and no row-at-a-time Python UDF (BatchEvalPython) appears anywhere. A
regression that silently flips a broadcast join to sort-merge or un-pushes
a filter still passes value checks at sf0.001 — these tests are what
catch it."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

REGISTRY = entrymod._registry()


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_q6_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    # shipdate/discount/quantity predicates must reach the parquet reader
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(l_shipdate", plan), plan
    assert "LessThan(l_quantity" in plan
    # projection pruning: the scan reads the 4 needed columns, not all 16
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and len(m.group(1).split(",")) <= 4, m.group(0)


def test_q5_broadcasts_small_dims(spark):
    plan = plan_of(spark, "q5_region_revenue")
    # region/nation/supplier side must broadcast — a shuffle join of
    # lineitem against a 5-row dim is the canonical 100TB mistake
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BroadcastExchange" in plan


def test_q1_partial_aggregation(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # map-side combine: two HashAggregate nodes (partial + final) around
    # one exchange — the shuffle moves pre-aggregated rows, not lineitem
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
    assert "partial_sum" in plan, plan


def test_j2_anti_join_broadcasts(spark):
    plan = plan_of(spark, "j2_customers_without_orders")
    assert "LeftAnti" in plan, plan


def test_no_row_python_udfs_in_headline_plans(spark):
    # BatchEvalPython = row-at-a-time Python UDF — banned from every
    # registered probe; Python stages must be Arrow-vectorized
    # (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).
    offenders = []
    for name in ("q1_pricing_summary", "q3_unshipped_orders",
                 "q9_product_profit", "p5_json_extract_agg",
                 "d_minhash_lsh_pairs", "ann_brute_force_topk",
                 "t_quality_scores", "j4_explode_token_counts",
                 "w1_running_customer_spend", "e_sessionize",
                 "d_simhash_near_pairs", "d_decontaminate",
                 "ann_ivf_topk", "s_embedding_near_dups", "t_pii_redact",
                 "j5_recursive_tree", "o3_latest_order_per_customer",
                 "u3_except_inactive_customers",
                 "w3_median_spend_by_segment", "q21_waiting_supplier"):
        if "BatchEvalPython" in plan_of(spark, name):
            offenders.append(name)
    assert not offenders, offenders


def test_minhash_single_wide_aggregate(spark):
    # K min-hash functions fold into ONE groupBy (no xK row explosion):
    # the plan has exactly one exchange below the signature aggregate
    plan = plan_of(spark, "d_minhash_lsh_pairs")
    assert "FlatMapGroupsInPandas" not in plan
    assert "BatchEvalPython" not in plan


def test_ann_topk_prunes_before_shuffle(spark):
    # per-query top-k must push a partial group-limit below the exchange
    # (WindowGroupLimit both map- and reduce-side) — never shuffle the
    # full n_queries x n_corpus similarity matrix to rank it
    plan = plan_of(spark, "ann_brute_force_topk")
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_topk_global_limit_is_take_ordered(spark):
    # global ORDER BY ... LIMIT k compiles to TakeOrderedAndProject
    # (per-partition heap + driver merge), never a full sort
    plan = plan_of(spark, "a6_top_buyers")
    assert "TakeOrderedAndProject" in plan, plan


def test_repetition_metrics_partial_aggregation(spark):
    # the top-bigram count must partial-combine map-side: each document's
    # repeated bigrams die in the combine, so the shuffle carries distinct
    # (doc_id, bigram) rows, not one row per corpus token
    plan = plan_of(spark, "t_repetition_metrics")
    assert "partial_count" in plan or "partial_max" in plan, plan
    assert "BatchEvalPython" not in plan


def test_stratified_split_single_shuffle(spark):
    # the split is a pure map-side expression; exactly one aggregate
    # exchange may appear (the groupBy), never a repartition or sort of
    # the corpus before it
    plan = plan_of(spark, "t_stratified_split")
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "BatchEvalPython" not in plan


def test_curation_funnel_reuses_staged_flags(spark):
    # the staged lang/quality flags are computed ONCE (cached) and every
    # funnel stage reads the cache — not one documents scan per stage —
    # and the cluster labels arrive pre-materialized (checkpointed RDD),
    # so the funnel never re-runs the label-propagation loop
    plan = plan_of(spark, "d_curation_funnel")
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert plan.count("Scan ExistingRDD") >= 1, plan


def test_events_ts_filter_pushes_through_normalization(spark):
    """normalize_events_ts rebuilds ts (nanos div / ntz cast); a filter on
    the normalized column must still reach the parquet scan — Catalyst
    transposes the predicate below the cast. Regression guard for the
    lazy-loader path."""
    from pyspark.sql import functions as F

    from kingfisher_process_spark.plans.base import load_tables

    ev = load_tables(spark, SF_SMOKE)["events"]
    df = ev.where(F.col("ts") > "2024-01-01").select("event_id")
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert re.search(r"PushedFilters: \[.*ts", plan), plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and len(m.group(1).split(",")) <= 2, m.group(0)


def test_ngram_capped_hot_shingles_broadcast(spark):
    """The max_df guard must subtract hot shingles with a BROADCAST
    anti-join (the hot set is tiny by construction) — never a shuffle of
    the full posting list."""
    from kingfisher_process_spark.functions.dedup import ngram_jaccard_pairs
    from kingfisher_process_spark.plans.base import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"]
    df = ngram_jaccard_pairs(docs, max_df=100)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert re.search(r"BroadcastHashJoin.*LeftAnti", plan), plan


def test_sequence_packing_window_is_partitioned(spark):
    """The global prefix sum must run as per-partition windows + offset
    join, never a bare unpartitioned running-total window (single-task
    funnel). The physical plan's Window node must carry a partition spec
    and the offset side must broadcast."""
    plan = plan_of(spark, "t_sequence_packing")
    assert "Window" in plan, plan
    # an unpartitioned window renders as "Window [..], [ts ASC]" with no
    # partition-by clause; the partitioned form lists the pid key
    m = re.search(r"Arguments: \[sum\(nt[^\]]*\], \[pid", plan)
    assert m, plan
    assert "BroadcastExchange" in plan, plan


def test_runtime_bloom_filter_injects_on_selective_dim_join(spark):
    """Runtime-filter posture: with a selective dimension filter, Spark's
    runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter.enabled,
    on by default) is injected on the fact side — at 100 TB the bloom
    prunes fact rows BEFORE the join shuffle, the declarative analogue of
    a hand-built semi-join reduction. Local data sits under the
    application-side scan threshold (10 GiB), so the test lowers it to
    exercise the path the production scale hits naturally."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        o = (spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
             .where(F.col("o_orderpriority") == "1-URGENT"))
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_pq_adc_broadcasts_table_and_stays_map_side(spark):
    plan = plan_of(spark, "ann_pq_adc_topk")
    # the 32-entry/query ADC table must broadcast; the code scan must
    # never shuffle against it sort-merge
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # encode is pure projection work — no exchange before the join other
    # than the broadcast itself and the final per-query aggregation
    assert "BatchEvalPython" not in plan


def test_pq_encode_is_shuffle_free(spark):
    from kingfisher_process_spark.functions.similarity import pq_encode
    from kingfisher_process_spark.plans.base import load_tables

    df = pq_encode(load_tables(spark, SF_SMOKE)["embeddings"])
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan, plan  # map-side projections only


def test_bpe_pair_count_partial_aggregates(spark):
    # the per-round pair count must combine map-side: the shuffle carries
    # (pair, partial) rows, not one row per pair occurrence
    from pyspark.sql import functions as F

    from kingfisher_process_spark.plans.base import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"]
    vocab = (
        docs.select(F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split("word", "").alias("l"), "freq")
    )
    pairs = vocab.select(
        "freq",
        F.explode(F.arrays_zip(
            F.slice("l", 1, F.size("l") - 1),
            F.slice(F.col("l"), 2, F.size("l") - 1))).alias("p"),
    ).select(F.col("p.0").alias("a"), F.col("p.1").alias("b"), "freq")
    best = (pairs.groupBy("a", "b").agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b").limit(1))
    plan = spark._jvm.PythonSQLUtils.explainString(
        best._jdf.queryExecution(), "formatted")
    assert "partial_sum" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan  # argmax is a heap, not a sort


def test_profile_approx_drops_expand_and_extra_exchange(spark):
    # exact=True pays the multi-distinct Expand (each distinct column
    # fans the input out before the shuffle); exact=False must be ONE
    # fully map-side-combining aggregation — no Expand node, and no
    # exchange beyond the single-partition agg + final orderBy
    from kingfisher_process_spark.functions.audit import (
        ORDERS_PROFILE_COLS, profile_table)
    from kingfisher_process_spark.plans.base import load_tables

    orders = load_tables(spark, SF_SMOKE)["orders"]

    def plan(exact):
        df = profile_table(orders, ORDERS_PROFILE_COLS, exact=exact)
        return spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")

    exact_plan, approx_plan = plan(True), plan(False)
    assert "Expand" in exact_plan  # the cost the toggle removes
    assert "Expand" not in approx_plan, approx_plan
    assert approx_plan.count("Exchange") < exact_plan.count("Exchange"), (
        approx_plan)
    assert approx_plan.count("Exchange") <= 2, approx_plan


def test_trained_pq_encode_is_shuffle_free(spark):
    from kingfisher_process_spark.functions.similarity import (
        pq_encode_trained, train_pq_codebooks)
    from kingfisher_process_spark.plans.base import load_tables

    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    df = pq_encode_trained(emb, train_pq_codebooks(emb))
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan, plan  # map-side projections only
    assert "BatchEvalPython" not in plan


def test_residual_ivfpq_broadcasts_and_no_cartesian(spark):
    plan = plan_of(spark, "ann_ivfpq_residual_topk")
    # probed-cell membership and the per-(query, cell) residual ADC
    # table must broadcast; nothing may fall back to a cartesian or a
    # row-at-a-time Python stage
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_incremental_compile_broadcasts_dirty_set(spark):
    # the dirty-OCID set drives one anti join (keep) and one semi join
    # (redo) — both must be broadcast (the set is proportional to the
    # CHANGE, never the corpus), and the fingerprint aggregates must
    # partially combine map-side
    plan = plan_of(spark, "ocds_incremental_compile")
    assert "BroadcastHashJoin LeftAnti" in plan.replace("  ", " "), plan
    assert "BroadcastHashJoin LeftSemi" in plan.replace("  ", " "), plan
    assert "partial_sum" in plan, plan


def test_semantic_dedup_equijoins_on_cell_no_python(spark):
    plan = plan_of(spark, "d_semantic_dedup")
    # the within-cell pair search must be an equi-join on the cell key —
    # never a cartesian/nested-loop over the corpus — and the grid-L2
    # ball test stays a codegen'd BIGINT fold, not a Python stage
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert re.search(r"Left keys \[1\]: \[cell#\d+L?\]", plan), plan
    assert re.search(r"Right keys \[1\]: \[cell_b#\d+L?\]", plan), plan


def test_shingle_and_bigram_generators_stay_linear(spark):
    """InferFiltersFromGenerate clones the explode's generator expression
    into a pre-exchange filter with column refs inlined. The
    transform(sequence, i -> element_at(toks, i)) idiom is quadratic
    under that inlining (each element re-runs split(text)); the
    zip_with-over-slices form is linear. Pin that no element_at-indexed
    generator survives anywhere in these probes' plans."""
    for name in ("d_minhash_lsh_pairs",
                 "t_repetition_metrics", "d_ngram_jaccard_pairs"):
        plan = plan_of(spark, name)
        assert "element_at" not in plan, (name, plan[:2000])
        assert "zip_with" in plan, (name, plan[:2000])
    # t_ngram_lm_score's bigram projection runs inside its shared
    # checkpoint job since r12 (the served plan roots at the checkpoint,
    # so the generator no longer appears there) — pin the linearity
    # property on the feature subtree the checkpoint materializes, plus
    # element_at-absence on the served plan.
    from kingfisher_process_spark.functions.text import _lm_bigram_features
    from kingfisher_process_spark.plans.base import load_tables

    feat = _lm_bigram_features(load_tables(spark, SF_SMOKE)["documents"])
    feat_plan = spark._jvm.PythonSQLUtils.explainString(
        feat._jdf.queryExecution(), "formatted")
    assert "zip_with" in feat_plan, feat_plan[:2000]
    assert "element_at" not in feat_plan, feat_plan[:2000]
    served = plan_of(spark, "t_ngram_lm_score")
    assert "element_at" not in served, served[:2000]


def test_semantic_decontaminate_broadcasts_benchmark_no_shuffle(spark):
    """The corpus side must not shuffle: benchmark broadcasts, the ball
    test runs on the scan side of a BroadcastHashJoin."""
    plan = plan_of(spark, "s_semantic_decontaminate")
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan


def test_bpe_pack_broadcasts_wordlen_map(spark):
    """The word->trained-length map joins the exploded corpus as a
    broadcast; no row-at-a-time Python anywhere."""
    plan = plan_of(spark, "t_bpe_pack_pipeline")
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "BatchEvalPython" not in plan


def test_funnel_frontiers_broadcast_into_each_stage(spark):
    """Each funnel stage joins the previous |users|-row frontier as a
    broadcast — no full event-stream shuffle per stage."""
    plan = plan_of(spark, "e_funnel_conversion")
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "BatchEvalPython" not in plan


def test_gapfill_fill_window_is_partitioned_by_user(spark):
    """Every gapfill window (the r12 grid-free form uses span-bound
    min/max + a next-observed-hour min instead of the old last(hv)
    running fill) must be partitioned on user_id — a bare unpartitioned
    running window is the single-task funnel smell — and the grid-free
    plan must stay free of the sequence-explode Generate it removed."""
    plan = plan_of(spark, "e_gapfill_forward")
    wins = re.findall(r"windowspecdefinition\(([^,)]*)", plan)
    assert wins and all(w.startswith("user_id") for w in wins), plan
    assert "Generate" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_pagerank_iterations_stay_jvm_side(spark):
    plan = plan_of(spark, "g_item_pagerank")
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan, plan[:1500]
