"""Regenerate PLANS.md: formatted physical plans for representative
probes, with the scale property each plan is supposed to exhibit stated
next to it so a reviewer can check claim against plan in one glance.

Usage: python scripts/gen_plans.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (probe, the scale property the plan must show)
SHOWCASE = [
    ("q6_forecast_revenue",
     "Filters and projection reach the parquet scan (PushedFilters + "
     "2-column ReadSchema); single partial+final aggregate, no join."),
    ("q5_region_revenue",
     "Small dims (region/nation/customer/supplier) broadcast; only the "
     "fact tables shuffle. One exchange per agg boundary, none per dim."),
    ("j2_customers_without_orders",
     "Anti join with the filtered side broadcast — no full-data shuffle "
     "for a 'customers without X' query."),
    ("o3_latest_order_per_customer",
     "Deterministic first-row-per-key via window; single hash exchange "
     "on the key, TakeOrderedAndProject for the presentation sort."),
    ("e_dedup_consecutive",
     "LAG window and the per-user aggregation share ONE hash exchange "
     "(the groupBy reuses the window's partitioning)."),
    ("t_bm25_search",
     "No explode: term frequencies are in-row array expressions; corpus "
     "stats broadcast as one row; top-k is TakeOrderedAndProject (heaps, "
     "no global sort)."),
    ("t_table_fingerprint",
     "Orderless XOR fingerprint: partial_bit_xor/partial_count on the "
     "map side; the only shuffle carries |sources| rows."),
    ("j7_salted_skew_join",
     "Fact side salted (pmod over xxhash64), dim exploded N_SALTS ways; "
     "join key is (key, salt) so a hot key spans N_SALTS reducers."),
    ("t_global_shuffle_shards",
     "Distributed global rank: range exchange + per-partition "
     "row_number + broadcast P-row offsets — no single-task global "
     "window."),
    ("d_minhash_lsh_pairs",
     "LSH banding: the self-join shuffles on (band, bucket) — bucket-"
     "shaped, never all-pairs; signatures cached (1 row/doc)."),
    ("e_key_skew_audit",
     "Skew detection costs one pass: partially-aggregated groupBy on the "
     "key, then a broadcast cross join with the 1-row totals."),
    ("m_embed_ann",
     "Multimodal composition: Arrow-batched mapInPandas feature stage, "
     "then de-quantize + centroid argmax as map-side expressions; census "
     "is a 4-key partial-agg groupBy."),
    ("ann_pq_adc_topk",
     "Trained PQ/ADC: encode is a map-side projection (integer-grid "
     "quantize + HOF argmin over literal K=16 centroids — no shuffle, "
     "stays in whole-stage codegen); the scan side joins 8 code "
     "rows/vector against a BROADCAST 128-entry/query distance table; "
     "top-k per query via window over |queries| partitions."),
    ("ocds_compile_skewed",
     "Per-OCID skew routing: count agg reads ONLY the ocid column "
     "(pruned scan), hot set broadcast into semi/anti joins (no literal "
     "id list); cold tail takes one MapInPandas pass, hot OCIDs the "
     "partial/finalize FlatMapGroupsInPandas pair."),
    ("ann_ivfpq_residual_topk",
     "Residual IVF-PQ serving: quantize + cell-assign + residual encode "
     "are map-side projections; the scan side joins codes per probed "
     "cell against BROADCAST per-(query, cell) residual ADC tables; "
     "raw vectors never shuffle."),
    ("ocds_incremental_compile",
     "Incremental recompile: two column-pruned fingerprint aggregates "
     "(partial-combined md5-slice sums), dirty set BROADCAST into the "
     "keep anti-join and redo semi-join, merge engine touches only "
     "dirty OCIDs; the equality audit is one full-outer hash join."),
    ("d_semantic_dedup",
     "SemDeDup: cell assignment is a map-side argmin over literal "
     "trained centroids; the pair join is cell-keyed (broadcast build "
     "side, fanned-out probe side so the 64-dim BIGINT fold "
     "parallelizes); never all-pairs."),
    ("t_ngram_lm_score",
     "Bigram LM: zip_with-over-slices n-grams (linear even when "
     "InferFiltersFromGenerate clones them below the exchange); "
     "wordcount-shaped training with map-side partial agg; pruned LM "
     "BROADCAST into the scoring join under the count gate."),
    ("t_quality_classifier",
     "Model filter as scan-side compute: the hashed-feature linear "
     "margin is ONE array fold per row inside whole-stage codegen — "
     "no explode, no shuffle before the presentation sort."),
    ("m_audio_features",
     "Two Arrow-batched mapInPandas stages (WAV encode, real decode + "
     "featurize), blob-local, no shuffle; one narrow row leaves per "
     "blob."),
    ("t_k_anonymity_enforce",
     "One partial+final count per ladder rung over a SHRINKING "
     "remainder; the per-level size table joins back as a broadcast; "
     "the documents scan reads only the 3 quasi-identifier columns."),
    ("ann_index_rerank_topk",
     "Persisted-index refine tier: BOTH index scans (codes, vectors) "
     "carry PartitionFilters over the probed cells; the 4x-k ADC "
     "shortlist and the query vectors join as BROADCASTs, so the "
     "exact grid-L2 rescore touches O(shortlist) rows and raw vectors "
     "never shuffle."),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from kingfisher_process_spark.session import get_spark

    import __spark_entry__ as em

    spark = get_spark("kps-plans", cpus=8)
    reg = em._registry()
    out = [
        "# PLANS — physical plans of representative probes",
        "",
        "Generated by `python scripts/gen_plans.py` (sf0.01, AQE on). Each",
        "section states the scale property the plan must exhibit, then the",
        "`explain(formatted)` output to check it against. Regenerate after",
        "changing any of these operators.",
        "",
    ]
    for name, claim in SHOWCASE:
        df = reg[name].fn(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out += [f"## {name}", "", f"**Claim:** {claim}", "",
                "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
