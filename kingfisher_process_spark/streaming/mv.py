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


_BATCH_MARKER = "_last_batch_id"  # "_"-prefixed: invisible to parquet scans


def _recover(acc_dir: str) -> None:
    """If a crash left the accumulator renamed aside (the single-rename
    window in Store._swap_in), restore it before folding anything."""
    bak = acc_dir + "__precompact"
    if not os.path.isdir(acc_dir) and os.path.isdir(bak):
        os.replace(bak, acc_dir)


def _applied_batch(acc_dir: str, run_id: str) -> int:
    """Last folded batch_id for THIS run identity; -1 if the marker
    belongs to a different run (checkpoint reset / other query) — those
    batch ids restart at 0 and must not be mistaken for replays."""
    marker = os.path.join(acc_dir, _BATCH_MARKER)
    if os.path.isfile(marker):
        with open(marker) as f:
            raw = f.read().strip()
        rid, _, bid = raw.rpartition(":")
        if rid == run_id and bid:
            return int(bid)
    return -1


def merge_partial_into(acc_dir: str, run_id: str = ""):
    """foreachBatch function: additively fold the batch's partial
    aggregate into the accumulator directory. Idempotent under
    at-least-once delivery — the applied (run_id, batch_id) travels
    INSIDE the accumulator dir (a "_"-prefixed marker parquet ignores),
    so a replayed batch whose id is already committed is skipped, and
    the marker swaps atomically with the data it describes. ``run_id``
    is the query's checkpoint identity: pass the checkpoint path (or
    any token that lives and dies with it) so that a checkpoint RESET —
    which restarts batch ids at 0 — is not mistaken for a replay and
    silently skipped; a marker from a different run_id never
    suppresses a fold. The swap itself
    reuses Store._swap_in (backup-rename → replace → rollback on
    failure); _recover() heals the one crash window where the live dir
    sits renamed aside."""
    from kingfisher_process_spark.store import Store

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover(acc_dir)
        if os.path.isdir(acc_dir) and _applied_batch(acc_dir, run_id) >= batch_id:
            return  # replayed micro-batch: already folded in
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
        with open(os.path.join(tmp, _BATCH_MARKER), "w") as f:
            f.write(f"{run_id}:{batch_id}")
        Store._swap_in(tmp, acc_dir)

    return fn


def merge_partial_into_partitioned(acc_dir: str, run_id: str = ""):
    """Day-partitioned fold — the 100 TB form of ``merge_partial_into``:
    the accumulator lives as ``acc_dir/day=YYYY-MM-DD/`` partitions and a
    micro-batch rewrites ONLY the partitions its event-times touch
    (replaceWhere semantics, same device as ``Store.merge_upsert``).
    An idle day's files are never read or written, so the per-batch cost
    is O(touched-days x per-day view), not O(whole view) — with a
    watermarked source, touched days ≈ 1-2 regardless of history depth.

    Idempotency is PER PARTITION: each day dir carries its own
    (run_id, batch_id) marker and swaps atomically with it, so a crash
    midway through a multi-day batch replays only the days that had not
    yet committed — the already-swapped days skip, and no day is ever
    folded twice.
    """
    from kingfisher_process_spark.store import Store

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = (hourly_partial(batch_df)
                .withColumn("day", F.substring("hour_start", 1, 10))
                .cache())
        try:
            days = sorted(r["day"] for r in part.select("day").distinct().collect())
            for day in days:
                ddir = os.path.join(acc_dir, f"day={day}")
                _recover(ddir)
                if os.path.isdir(ddir) and _applied_batch(ddir, run_id) >= batch_id:
                    continue  # this day already committed for this batch
                day_part = part.where(F.col("day") == day).drop("day")
                if os.path.isdir(ddir):
                    old = spark.read.parquet(ddir)
                    merged = (
                        old.unionByName(day_part)
                        .groupBy("hour_start", "event_type")
                        .agg(F.sum("n_events").alias("n_events"),
                             F.sum("total_value").cast("decimal(38,6)")
                             .alias("total_value"))
                    )
                else:
                    merged = day_part
                tmp = ddir + "__next"
                shutil.rmtree(tmp, ignore_errors=True)
                merged.write.mode("overwrite").parquet(tmp)
                with open(os.path.join(tmp, _BATCH_MARKER), "w") as f:
                    f.write(f"{run_id}:{batch_id}")
                os.makedirs(acc_dir, exist_ok=True)
                Store._swap_in(tmp, ddir)
        finally:
            part.unpersist()

    return fn


def read_partitioned_view(spark, acc_dir: str) -> DataFrame:
    """Read the day-partitioned accumulator back as one view (the day
    column returns as a partition column; scans prune on it)."""
    return spark.read.parquet(acc_dir)
