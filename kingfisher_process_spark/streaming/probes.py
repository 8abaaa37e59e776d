"""Driver-visible Structured Streaming probes.

The reference is an incremental, message-driven pipeline (SURVEY §2.10);
its Spark mapping is Structured Streaming. These probes run a REAL
streaming query (``readStream`` → event-time window + watermark →
``writeStream``) with ``availableNow`` so the stream drains the parquet
input and terminates — the result is then a plain DataFrame the
correctness gate can hash against DuckDB. The same plan keeps running
un-drained (processingTime trigger) on a live ingest directory at scale.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kingfisher_process_spark.plans.base import probe

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


@probe(
    "st_hourly_rollup",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           SUM(CAST(value AS DECIMAL(38,6))) AS total_value
    FROM events
    GROUP BY hour_start, event_type
    ORDER BY hour_start, event_type
    """,
    survey_ids="streaming-ext,A5,O1",
)
def st_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed aggregation as a genuine streaming query.

    ``withWatermark`` bounds state for late data (reference's completion
    semantics are not time-based — SURVEY §2.10 — but a 100 TB event
    ingest needs watermarked windows); ``availableNow`` drains the input
    so the probe terminates. Complete output mode emits every window at
    drain time, which makes the result equal to the batch rollup — the
    DuckDB oracle checks exactly that equivalence.
    """
    # TIMESTAMP(NANOS) parquet: read as raw nanos, rebuild micros (same
    # truncation DuckDB applies) — see plans/base.load_tables
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # FileStreamSource wants a DIRECTORY (the live-ingest shape: files
    # arriving into a drop dir); stage the single bench file behind one
    import os
    import tempfile

    drop_dir = tempfile.mkdtemp(prefix="kps_stream_events_")
    os.symlink(os.path.abspath(f"{sf_dir}/events.parquet"),
               os.path.join(drop_dir, "events.parquet"))
    stream = (
        spark.readStream
        .schema(EVENTS_STREAM_SCHEMA)
        .parquet(drop_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value"))
    )
    sink = f"st_hourly_rollup_{uuid.uuid4().hex[:8]}"
    q = (
        windowed.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("hour_start"),
            "event_type", "n_events", "total_value",
        )
        .orderBy("hour_start", "event_type")
    )
