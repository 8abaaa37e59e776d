"""Scale measurement beyond sf0.1 (judge r12 #4): synthesize a 10x
corpus from sf0.1 (deterministic shifted copies — keys offset per copy,
document text perturbed per copy so dedup pair populations stay
realistic) under /root/sfgen/sf1x, then time throughput-regime probes
on it. Run once with SPARK_GRAFT_CPUS=32 and once with 8; the ratio is
the core-scaling evidence sf0.1 cannot give (it is scheduling-bound —
8-core ~= 32-core there, BENCH_r12_c8).

Usage:
  python scripts/r13_scale_probe.py gen          # build /root/sfgen/sf1x
  SPARK_GRAFT_CPUS=32 python scripts/r13_scale_probe.py time
  SPARK_GRAFT_CPUS=8  python scripts/r13_scale_probe.py time
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kingfisher_process_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/root/sfgen/sf1x"
COPIES = 10

PROBES = [
    "d_minhash_lsh_pairs",
    "d_simhash_banded_pairs",
    "e_gapfill_forward",
    "sk_theta_setops",
    "q9_product_profit",
    "t_ngram_lm_score",
]


def gen() -> None:
    spark = get_spark("kps-r13-scalegen")
    os.makedirs(DST, exist_ok=True)

    def shifted(name, copies_expr):
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = [copies_expr(df, i) for i in range(COPIES)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # testdata tables are single FILES (some operators read footers
        # with pyarrow directly) — write one part and move it into place
        tmp = f"{DST}/_tmp_{name}"
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        if os.path.isdir(f"{DST}/{name}.parquet"):
            shutil.rmtree(f"{DST}/{name}.parquet")
        shutil.move(part, f"{DST}/{name}.parquet")
        shutil.rmtree(tmp)

    M = 10_000_000  # key offset per copy — far above any sf0.1 key

    shifted("lineitem", lambda df, i: df.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(i * M)))
    shifted("orders", lambda df, i: df.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(i * M)).withColumn(
        "o_custkey", F.col("o_custkey") + F.lit(i * M)))
    shifted("customer", lambda df, i: df.withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(i * M)))
    shifted("events", lambda df, i: df.withColumn(
        "event_id", F.col("event_id") + F.lit(i * M)).withColumn(
        "user_id", F.col("user_id") + F.lit(i * M)))
    shifted("documents", lambda df, i: df.withColumn(
        "doc_id", F.col("doc_id") + F.lit(i * M)).withColumn(
        "text", F.concat(F.col("text"), F.lit(f" copytoken{i}"))))
    for name in ["part", "supplier", "nation", "region", "embeddings"]:
        shutil.copy(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet") \
            if os.path.isfile(f"{SRC}/{name}.parquet") else \
            shutil.copytree(f"{SRC}/{name}.parquet", f"{DST}/{name}.parquet",
                            dirs_exist_ok=True)
    print("generated", DST)


def time_probes() -> None:
    import __spark_entry__ as em

    spark = get_spark("kps-r13-scaletime")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reg = em._registry()
    reg["q1_pricing_summary"].fn(spark, SRC).collect()  # JVM warm
    out = {}
    for name in PROBES:
        p = reg[name]
        try:
            p.fn(spark, SRC).collect()  # shape warm at sf0.1
        except Exception:
            pass
        xs = []
        for _ in range(2):
            t0 = time.perf_counter()
            p.fn(spark, DST).collect()
            xs.append(time.perf_counter() - t0)
        out[name] = round(min(xs), 3)
        print(f"cpus={cpus} {name}: {out[name]}  {[round(x, 2) for x in xs]}",
              flush=True)
    print({"cpus": cpus, "timings": out})


if __name__ == "__main__":
    if sys.argv[1:] == ["gen"]:
        gen()
    else:
        time_probes()
