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
