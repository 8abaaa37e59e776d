"""OCDS pipeline as a driver-visible probe: synthesize release packages
from the ``orders`` table, run the full load→compile pipeline, and answer
the analyst top-buyers query (docs/querying-data.rst:103-125) over the
compiled collection.

No DuckDB oracle (the merge engine is not SQL-expressible — SURVEY §2.12);
the driver records the weaker rows-only check. The merge semantics
themselves are pinned by the golden tests (tests/test_merge_golden.py).
"""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kingfisher_process_spark.plans.base import load_tables, probe


@probe("ocds_compile_pipeline", None, survey_ids="S1-S8,C1,C3,P5,A5,A6,O5")
def ocds_compile_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_pipeline(spark, sf_dir, two_phase=False)


@probe("ocds_compile_two_phase", None, survey_ids="C1,C3,skew-ext")
def ocds_compile_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pipeline through the two-phase partial merge (the hot-OCID
    skew path, operators/merge_partial.py) — must produce the same
    analyst answer as the single-phase probe."""
    return _run_pipeline(spark, sf_dir, two_phase=True)


VERSIONED_SQL = """
  SELECT 'ocds-kps-' || o_orderkey AS ocid,
         CAST(2 AS BIGINT) AS n_status_versions,
         'active' AS status_first,
         'complete' AS status_last,
         CAST(o_totalprice AS DECIMAL(38,6)) AS award_amount
  FROM (SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 2000)
  ORDER BY ocid
"""


@probe("ocds_versioned_release", VERSIONED_SQL, survey_ids="C3,versioned-ext")
def ocds_versioned_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-release merge (merge.create_versioned_release) as a
    value-checked probe: two synthetic releases per OCID with a tender
    status transition active→complete, so the oracle can predict the
    version history exactly — entry counts, first/last values, and the
    award amount surviving Decimal-faithful round-trips."""
    import pandas as pd
    from decimal import Decimal

    t = load_tables(spark, sf_dir)
    orders = t["orders"].orderBy("o_orderkey").limit(2000).select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd'T'00:00:00'Z'").alias("d"),
    )
    ocid = F.concat(F.lit("ocds-kps-"), "o_orderkey").alias("ocid")
    r1 = orders.select(ocid, F.to_json(F.struct(
        F.concat(F.lit("ocds-kps-"), "o_orderkey").alias("ocid"),
        F.concat(F.col("o_orderkey").cast("string"), F.lit("-1")).alias("id"),
        F.col("d").alias("date"),
        F.array(F.lit("tender")).alias("tag"),
        F.struct(F.concat(F.lit("t-"), "o_orderkey").alias("id"),
                 F.lit("active").alias("status")).alias("tender"),
    )).alias("data"))
    r2 = orders.select(ocid, F.to_json(F.struct(
        F.concat(F.lit("ocds-kps-"), "o_orderkey").alias("ocid"),
        F.concat(F.col("o_orderkey").cast("string"), F.lit("-2")).alias("id"),
        F.concat(F.substring("d", 1, 4), F.lit("-12-31T00:00:00Z")).alias("date"),
        F.array(F.lit("award")).alias("tag"),
        F.struct(F.concat(F.lit("t-"), "o_orderkey").alias("id"),
                 F.lit("complete").alias("status")).alias("tender"),
        F.array(F.struct(
            F.concat(F.lit("a-"), "o_orderkey").alias("id"),
            F.struct(F.col("o_totalprice").alias("amount"),
                     F.lit("USD").alias("currency")).alias("value"),
        )).alias("awards"),
    )).alias("data"))

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        from kingfisher_process_spark.operators import merge as M
        from kingfisher_process_spark.util import canonical_json

        releases = [_json.loads(s, parse_float=Decimal) for s in pdf["data"]]
        # deterministic same-date order (stable date sort preserves it)
        releases.sort(key=lambda r: r["id"])
        v = M.create_versioned_release(releases)
        return pd.DataFrame([{"ocid": pdf["ocid"].iloc[0],
                              "versioned": canonical_json(v)}])

    ver = r1.unionAll(r2).groupBy("ocid").applyInPandas(
        merge_group, "ocid string, versioned string")
    return ver.select(
        "ocid",
        F.json_array_length(F.get_json_object("versioned", "$.tender.status"))
        .cast("long").alias("n_status_versions"),
        F.get_json_object("versioned", "$.tender.status[0].value").alias("status_first"),
        F.get_json_object("versioned", "$.tender.status[1].value").alias("status_last"),
        F.get_json_object("versioned", "$.awards[0].value.amount[0].value")
        .cast("decimal(38,6)").alias("award_amount"),
    ).orderBy("ocid")


def _run_pipeline(spark: SparkSession, sf_dir: str, two_phase: bool) -> DataFrame:
    from kingfisher_process_spark.pipeline import process_collection
    from kingfisher_process_spark.store import Store

    t = load_tables(spark, sf_dir)
    # two releases per order (tender then award) so every OCID exercises a
    # real merge; buyer = customer
    orders = t["orders"].orderBy("o_orderkey").limit(2000).select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd'T'00:00:00'Z'").alias("d"),
    )
    r1 = orders.select(F.to_json(F.struct(
        F.concat(F.lit("ocds-kps-"), "o_orderkey").alias("ocid"),
        F.concat(F.col("o_orderkey").cast("string"), F.lit("-1")).alias("id"),
        F.col("d").alias("date"),
        F.array(F.lit("tender")).alias("tag"),
        F.struct(
            F.concat(F.lit("t-"), "o_orderkey").alias("id"),
            F.lit("active").alias("status"),
        ).alias("tender"),
    )).alias("j"))
    r2 = orders.select(F.to_json(F.struct(
        F.concat(F.lit("ocds-kps-"), "o_orderkey").alias("ocid"),
        F.concat(F.col("o_orderkey").cast("string"), F.lit("-2")).alias("id"),
        F.concat(F.substring("d", 1, 4), F.lit("-12-31T00:00:00Z")).alias("date"),
        F.array(F.lit("award")).alias("tag"),
        F.struct(F.col("o_custkey").alias("id")).alias("buyer"),
        F.array(F.struct(
            F.concat(F.lit("a-"), "o_orderkey").alias("id"),
            F.struct(
                F.col("o_totalprice").alias("amount"),
                F.lit("USD").alias("currency"),
            ).alias("value"),
        )).alias("awards"),
    )).alias("j"))

    releases = [json.loads(r["j"]) for r in r1.union(r2).collect()]

    # 8 package files (deterministic round-robin) — the realistic input
    # shape (a collection is many files, file_worker consumes them
    # independently) and what makes the parse stage parallel
    tmp = tempfile.mkdtemp(prefix="kps_ocds_")
    paths = []
    for i in range(8):
        pkg = {"uri": f"synthetic:orders:{i}", "version": "1.1",
               "publisher": {"name": "kps-bench"},
               "releases": releases[i::8]}
        path = f"{tmp}/pkg{i}.json"
        with open(path, "w") as f:
            json.dump(pkg, f)
        paths.append(path)

    store = Store(spark, f"{tmp}/store")
    result = process_collection(
        spark, store, "bench_orders", "2020-01-01 00:00:00", paths,
        compile_=True, two_phase_compile=two_phase,
    )
    comp_id = result["collections"]["compiled"]

    crs = store.read("compiled_release").where(F.col("collection_id") == comp_id)
    data = store.read("data").select(F.col("id").alias("data_id"), "data")
    # analyst query: top buyers by award value over compiled releases
    awards = (
        crs.join(data, "data_id")
        .select(
            "ocid",
            F.get_json_object("data", "$.buyer.id").alias("buyer"),
            F.get_json_object("data", "$.awards[0].value.amount")
            .cast("decimal(38,6)").alias("amount"),
        )
    )
    return (
        awards.groupBy("buyer")
        .agg(F.sum("amount").alias("total_award_value"),
             F.count(F.lit(1)).alias("n_awards"))
        .orderBy(F.desc("total_award_value"), "buyer")
        .limit(10)
    )
