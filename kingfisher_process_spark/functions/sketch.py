"""Streaming-mergeable sketches as relational plans.

The reference keeps exact cached counts (models.py cached_*_count); a
100 TB ingest wants sub-linear summaries too. Everything here is
DETERMINISTIC — hash functions are md5-derived like the dedup/minhash
family — so the probes are exact-oracle-checkable in DuckDB, unlike
Spark's built-in approx sketches (HLL / CountMinSketch with random seeds).

Count-Min Sketch as a plan: the sketch IS a (depth x width) count table,
i.e. a groupBy — it inherits map-side partial aggregation (each task
builds a partial sketch; the shuffle merges D*W cells, not rows), which is
exactly how CMS merging is supposed to work at scale. Estimation is a
broadcast join of the queried keys against the D matching cells taking
MIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kingfisher_process_spark.functions.dedup import H60_SQL, h60
from kingfisher_process_spark.plans.base import load_tables, probe

CMS_DEPTH = 4
CMS_WIDTH = 64


def _bucket(key, d: int):
    """Row-d hash bucket: independent-enough permutations come from
    seeding the md5 input, same trick as the minhash SEED_CONSTS."""
    return F.pmod(h60(F.concat(F.lit(f"cms{d}:"), key)), F.lit(CMS_WIDTH))


def cms_build(df: DataFrame, key, depth: int = CMS_DEPTH) -> DataFrame:
    """(row, bucket, cnt) — the Count-Min table for ``key``'s frequency
    distribution. One shuffle of at most depth*width cells thanks to
    map-side partials; rows the data never hashes into are simply absent
    (an absent cell is a zero)."""
    rows = [
        df.select(F.lit(d).alias("row"), _bucket(key, d).alias("bucket"))
        for d in range(depth)
    ]
    union = rows[0]
    for r in rows[1:]:
        union = union.unionAll(r)
    return union.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = CMS_DEPTH) -> DataFrame:
    """Point-query the sketch for each distinct key in ``keys``: the CMS
    estimate is MIN over the D cells the key hashes to (>= true count,
    always). The sketch side is depth*width rows — broadcast."""
    k = keys.select(F.col(key_col).alias("key")).distinct()
    probes_ = [
        k.select("key", F.lit(d).alias("row"),
                 _bucket(F.col("key"), d).alias("bucket"))
        for d in range(depth)
    ]
    union = probes_[0]
    for p in probes_[1:]:
        union = union.unionAll(p)
    return (
        union.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


_CMS_BUCKET_SQL = "CAST(" + H60_SQL.format(x="('cms{d}:' || event_type)") + " % 64 AS BIGINT)"

_CMS_ROWS_SQL = " UNION ALL ".join(
    f"SELECT {d} AS row, {_CMS_BUCKET_SQL.format(d=d)} AS bucket FROM events"
    for d in range(CMS_DEPTH)
)


@probe(
    "sk_count_min_event_types",
    f"""
    WITH cells AS ({_CMS_ROWS_SQL})
    SELECT row, bucket, COUNT(*) AS cnt
    FROM cells
    GROUP BY row, bucket
    ORDER BY row, bucket
    """,
    survey_ids="sketch-ext,A1",
)
def sk_count_min_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min table for event_type frequencies — bit-identical in
    both engines because the hash rows are md5-derived, so the sketch
    itself (not a sampled estimate) is the verified artifact."""
    t = load_tables(spark, sf_dir)
    return cms_build(t["events"], F.col("event_type")).orderBy("row", "bucket")


BLOOM_BITS = 4096
BLOOM_K = 3


def _bloom_pos_sql(key_sql: str, i: int) -> str:
    """DuckDB: bit position i for a key — seeded md5, mod BLOOM_BITS."""
    seeded = f"'bf{i}:' || CAST({key_sql} AS VARCHAR)"
    return f"CAST({H60_SQL.format(x=seeded)} % {BLOOM_BITS} AS BIGINT)"


def _bloom_pos_cols(key) -> list:
    """The BLOOM_K seeded-hash bit positions for a key expression — the
    ONE definition both the build side and the probe side use (a seed or
    hash change that touched only one side would silently break the
    no-false-negatives guarantee)."""
    return [
        F.pmod(h60(F.concat(F.lit(f"bf{i}:"), key.cast("string"))),
               F.lit(BLOOM_BITS))
        for i in range(BLOOM_K)
    ]


def bloom_positions(df: DataFrame, key) -> DataFrame:
    """(pos) — the distinct bloom bit positions set by ``key``'s values
    (BLOOM_K seeded hashes per key). Building the filter IS a distinct —
    map-side partials reduce each task to <= BLOOM_BITS rows before the
    one tiny shuffle, the same merge-for-free property as cms_build."""
    return (
        df.select(F.explode(F.array(*_bloom_pos_cols(key))).alias("pos"))
        .distinct()
    )


@probe(
    "sk_bloom_prejoin_audit",
    f"""
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    dim_pos AS (
      {" UNION ".join(f"SELECT {_bloom_pos_sql('c_custkey', i)} AS pos FROM dim"
                      for i in range(BLOOM_K))}
    ),
    probe_keys AS (SELECT DISTINCT o_custkey AS k FROM orders),
    probe_pos AS (
      {" UNION ".join(f"SELECT k, {_bloom_pos_sql('k', i)} AS pos FROM probe_keys"
                      for i in range(BLOOM_K))}
    ),
    flagged AS (
      SELECT pp.k,
             MIN(CASE WHEN dp.pos IS NULL THEN 0 ELSE 1 END) AS all_hit
      FROM probe_pos pp LEFT JOIN dim_pos dp ON pp.pos = dp.pos
      GROUP BY pp.k
    ),
    truth AS (
      SELECT k, CASE WHEN k IN (SELECT c_custkey FROM dim) THEN 1 ELSE 0 END
             AS is_member
      FROM probe_keys
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
           CAST(SUM(t.is_member) AS BIGINT) AS n_true_members,
           CAST(SUM(f.all_hit) AS BIGINT) AS n_maybe,
           CAST(SUM(CASE WHEN f.all_hit = 1 AND t.is_member = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives,
           CAST(SUM(CASE WHEN f.all_hit = 0 AND t.is_member = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negatives
    FROM flagged f JOIN truth t ON f.k = t.k
    """,
    survey_ids="sketch-ext,J3,A1",
)
def sk_bloom_prejoin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom filter as a pre-join runtime filter, audited
    against ground truth: the dim side (one customer segment) sets
    BLOOM_K seeded md5 bits in a {BLOOM_BITS}-bit space; every probe-side
    key is classified maybe-in/definitely-out, then compared to the
    exact semi-join. The audit emits the false-positive count (the price
    of the filter) and the false-negative count (must be 0 — Bloom
    filters never miss members; the oracle equality proves it).

    This is the hand-rolled, engine-portable twin of Spark's injected
    runtime bloom filter (tests/test_physical_plans.py pins the
    built-in): at 100 TB you broadcast the {BLOOM_BITS}-bit dim filter
    and drop definitely-out fact rows BEFORE the join shuffle; the
    position-set build is a distinct with map-side partials (each task
    reduces to <= {BLOOM_BITS} rows), so the filter costs one tiny
    shuffle regardless of dim size.

    Reference analogue: none (sketch family; complements
    sk_count_min_event_types).
    """
    t = load_tables(spark, sf_dir)
    dim = t["customer"].where(F.col("c_mktsegment") == "BUILDING") \
                       .select("c_custkey")
    dim_pos = bloom_positions(dim, F.col("c_custkey"))
    probe_keys = t["orders"].select(F.col("o_custkey").alias("k")).distinct()
    probe_pos = probe_keys.select(
        "k", F.explode(F.array(*_bloom_pos_cols(F.col("k")))).alias("pos"),
    ).distinct()
    flagged = (
        probe_pos.join(F.broadcast(dim_pos.withColumn("hit", F.lit(1))),
                       "pos", "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(0))).alias("all_hit"))
    )
    truth = probe_keys.join(
        dim.select(F.col("c_custkey").alias("k")).distinct()
        .withColumn("is_member", F.lit(1)),
        "k", "left").na.fill({"is_member": 0})
    return (
        flagged.join(truth, "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_probe_keys"),
             F.sum("is_member").cast("bigint").alias("n_true_members"),
             F.sum("all_hit").cast("bigint").alias("n_maybe"),
             F.sum(F.when((F.col("all_hit") == 1) & (F.col("is_member") == 0), 1)
                   .otherwise(0)).cast("bigint").alias("n_false_positives"),
             F.sum(F.when((F.col("all_hit") == 0) & (F.col("is_member") == 1), 1)
                   .otherwise(0)).cast("bigint").alias("n_false_negatives"))
    )


HIST_BUCKETS = 64  # equi-width histogram resolution (production: 1-4k)
HIST_QS_PM = (500, 900, 990)  # quantiles requested, per-mille


@probe(
    "sk_histogram_quantiles",
    f"""
    WITH b AS (
      SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders),
    h AS (
      SELECT LEAST(CAST(floor((o_totalprice - b.mn)
                               / ((b.mx - b.mn) / {HIST_BUCKETS}.0))
                     AS BIGINT), {HIST_BUCKETS - 1}) AS bk,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders, b GROUP BY 1),
    cum AS (
      SELECT bk, c,
             SUM(c) OVER (ORDER BY bk
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM h),
    qs AS (SELECT UNNEST([{", ".join(str(q) for q in HIST_QS_PM)}]) AS qpm),
    tgt AS (SELECT qpm, CAST(ceil(qpm * n / 1000.0) AS BIGINT) AS r,
                   mn, mx FROM qs, b),
    pick AS (
      SELECT t.qpm, t.r, MIN(cm.bk) AS bk
      FROM tgt t JOIN cum cm ON cm.cum >= t.r GROUP BY t.qpm, t.r)
    SELECT p.qpm AS qpm, CAST(p.bk AS BIGINT) AS bucket,
           t.mn + ((t.mx - t.mn) / {HIST_BUCKETS}.0)
                  * (p.bk + (p.r - (cm.cum - cm.c)) * 1.0 / cm.c)
             AS est_value
    FROM pick p JOIN cum cm ON cm.bk = p.bk JOIN tgt t ON t.qpm = p.qpm
    ORDER BY qpm
    """,
    survey_ids="sketch-ext,A4,A5,O5",
)
def sk_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram quantile sketch — the fourth classic sketch
    (after CMS, Bloom, HLL): two passes (bounds, bucket counts) replace
    the full sort an exact percentile needs, and the histogram is
    streaming-mergeable (bucket counts ADD, exactly like CMS cells).
    Estimates p50/p90/p99 of o_totalprice by linear interpolation within
    the covering bucket; deterministic — every operation is IEEE
    +,-,*,/ on identical operands in both engines, so unlike Spark's
    percentile_approx (randomized KLL) this is exact-oracle-checkable.
    CI separately pins |est - exact percentile| <= one bucket width.

    Scale shape: pass 1 is a 1-row global agg (broadcast); pass 2 a
    {HIST_BUCKETS}-group groupBy with map-side partial aggregation; the
    quantile extraction runs on {HIST_BUCKETS} rows. No sort anywhere.
    """
    o = load_tables(spark, sf_dir)["orders"]
    b = o.agg(F.min("o_totalprice").alias("mn"),
              F.max("o_totalprice").alias("mx"),
              F.count(F.lit(1)).cast("bigint").alias("n"))
    h = (o.crossJoin(F.broadcast(b))
         .selectExpr(
             f"LEAST(CAST(floor((o_totalprice - mn)"
             f" / ((mx - mn) / {HIST_BUCKETS}.0)) AS BIGINT),"
             f" {HIST_BUCKETS - 1}) AS bk")
         .groupBy("bk").agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    cum = h.selectExpr(
        "bk", "c",
        "SUM(c) OVER (ORDER BY bk"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum")
    qs = spark.range(1).selectExpr(
        f"explode(array({', '.join(str(q) for q in HIST_QS_PM)})) AS qpm")
    tgt = qs.crossJoin(F.broadcast(b)).selectExpr(
        "qpm", "CAST(ceil(qpm * n / 1000.0) AS BIGINT) AS r", "mn", "mx")
    pick = (tgt.join(F.broadcast(cum), F.col("cum") >= F.col("r"))
            .groupBy("qpm", "r").agg(F.min("bk").alias("bk")))
    est = (pick.join(F.broadcast(cum), "bk")
           .join(F.broadcast(tgt.select("qpm", "mn", "mx")), "qpm")
           .selectExpr(
               "qpm", "CAST(bk AS BIGINT) AS bucket",
               f"mn + ((mx - mn) / {HIST_BUCKETS}.0)"
               f" * (bk + (r - (cum - c)) * 1.0 / c) AS est_value"))
    return est.orderBy("qpm")
