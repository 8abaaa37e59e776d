"""Capture explain("formatted") plans for the r12 optimization round.

Usage: python scripts/r12_plans.py <suffix> [probe ...]
Writes plans/r12/<probe>_<suffix>.txt for each probe (default: the
candidate list below). Plan capture only builds the DataFrame (probes
whose fn trains/collects pay that once per session — memoized helpers
keep it bounded); nothing is executed beyond what fn itself runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Lazy probes worth a plan snapshot: bench cost or plan-shape interest.
DEFAULT = [
    "g_item_pagerank",
    "d_simhash_banded_pairs",
    "d_minhash_lsh_pairs",
    "d_dup_clusters",
    "d_semantic_dedup",
    "d_decontaminate",
    "d_shared_window_dups",
    "e_gapfill_forward",
    "e_scd2_intervals",
    "t_ngram_lm_score",
    "t_pretrain_corpus_pipeline",
    "t_k_anonymity_enforce",
    "j5_recursive_tree",
    "w3_median_spend_by_segment",
    "q9_product_profit",
    "q21_waiting_supplier",
    "sk_theta_setops",
    "sk_qdigest_quantiles",
    "s_embedding_near_dups",
    "s_semantic_decontaminate",
    "ann_ivfpq_residual_topk",
    "ann_pq_rerank_topk",
    "ann_ivfpq_topk",
    "ann_ivf_trained_topk",
    "m_embed_ann",
    "j7_salted_skew_join",
    "t_sequence_packing",
    "t_global_shuffle_shards",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as em
    from kingfisher_process_spark.session import get_spark

    spark = get_spark("kps-r12-plans", cpus=8)
    reg = em._registry()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = reg[name].fn(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
