"""Capture explain("formatted") plans for the r13 optimization round.

Usage: python scripts/r13_plans.py <suffix> [probe ...]
Writes plans/r13/<probe>_<suffix>.txt for each probe (default: the
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
    "ocds_incremental_compile",
    "ocds_compile_pipeline",
    "ocds_compile_skewed",
    "st_dedup_watermarked",
    "st_incremental_rollup",
    "st_incremental_rollup_partitioned",
    "ann_ivf_topk",
    "ann_ivfpq_residual_topk",
    "d_simhash_banded_pairs",
    "t_ngram_lm_score",
    "t_pretrain_corpus_pipeline",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as em
    from kingfisher_process_spark.session import get_spark

    spark = get_spark("kps-r13-plans", cpus=8)
    reg = em._registry()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
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
