"""Incremental materialized-view maintenance: a foreachBatch sink that
folds each micro-batch's PARTIAL aggregate into a persisted accumulator
table, so the rollup is maintained as data arrives instead of recomputed
from history.

The merge is ADDITIVE (counts and decimal sums are algebraic), so
re-aggregating `old UNION ALL batch_partial` is exact — decimal
accumulation makes batch order irrelevant, and the final view equals a
full recompute bit-for-bit (the ``st_incremental_rollup`` probe shares
``st_hourly_rollup``'s DuckDB oracle to prove it).

Scale posture: the per-batch partial is batch-sized (then map-side
reduced to |touched groups| rows); the accumulator rewrite is O(view
size), not O(history) — the IVM trade. At 100 TB the accumulator is
partitioned by a time column and only touched partitions rewrite, the
same replaceWhere device as ``Store.merge_upsert``; this module keeps
the single-directory form (crash-safe write-aside + swap) since a
rollup view is |hours × types| rows at any corpus size.

Reference analogue: none — the reference recomputes collection counts on
demand (`finisher.py`); this is the Spark-native continuous-aggregate
surface (the batch twin is `e_multires_rollup`'s hour→day
re-aggregation).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_partial(events: DataFrame) -> DataFrame:
    """Map a batch of events to its partial hourly aggregate —
    (hour_start, event_type, n_events, total_value decimal)."""
    return (
        events
        .groupBy(F.date_format("ts", "yyyy-MM-dd HH:00").alias("hour_start"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value"))
    )


def merge_partial_into(acc_dir: str):
    """foreachBatch function: additively fold the batch's partial
    aggregate into the accumulator directory (write-aside + swap, so a
    crash leaves either the old or the new view, never a torn one)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = hourly_partial(batch_df)
        if os.path.isdir(acc_dir):
            old = spark.read.parquet(acc_dir)
            merged = (
                old.unionByName(part)
                .groupBy("hour_start", "event_type")
                .agg(F.sum("n_events").alias("n_events"),
                     F.sum("total_value").cast("decimal(38,6)")
                     .alias("total_value"))
            )
        else:
            merged = part
        tmp = acc_dir + "__next"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(acc_dir):
            bak = acc_dir + "__bak"
            shutil.rmtree(bak, ignore_errors=True)
            os.replace(acc_dir, bak)
            os.replace(tmp, acc_dir)
            shutil.rmtree(bak, ignore_errors=True)
        else:
            os.replace(tmp, acc_dir)

    return fn
