"""Incremental materialized-view maintenance: a foreachBatch sink that
folds each micro-batch's PARTIAL aggregate into a persisted accumulator
table, so the rollup is maintained as data arrives instead of recomputed
from history.

The merge is ADDITIVE (counts and decimal sums are algebraic), so
re-aggregating `old UNION ALL batch_partial` is exact — decimal
accumulation makes batch order irrelevant, and the final view equals a
full recompute bit-for-bit (the ``st_incremental_rollup`` probes share
``st_hourly_rollup``'s DuckDB oracle to prove it).

Scale posture: the per-batch partial is batch-sized (then map-side
reduced to |touched groups| rows). ``merge_partial_into`` rewrites the
whole accumulator per batch — fine while a rollup view is |hours ×
types| rows; ``merge_partial_into_partitioned`` is the 100 TB form: the
accumulator lives as day=YYYY-MM-DD partitions and a batch rewrites ONLY
the days its event-times touch (replaceWhere semantics, the same device
as ``Store.merge_upsert``). With a watermarked source, touched days ≈
1-2 regardless of history depth.

Durability: both sinks commit through one ``_fold_into`` helper —
idempotent under at-least-once delivery (the applied (run_id, batch_id)
marker travels inside the directory it describes and swaps atomically
with it), crash-safe (backup-rename → replace → rollback, with recovery
for the single-rename window), and with ALL side directories
underscore-prefixed so Spark's partition discovery never sees a tmp or
backup as data. ``run_id`` is the query's checkpoint identity: pass the
checkpoint path so a checkpoint RESET (batch ids restart at 0) is never
mistaken for a replay.

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

_BATCH_MARKER = "_last_batch_id"  # "_"-prefixed: invisible to parquet scans


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


def _side_dirs(dst_dir: str) -> tuple[str, str]:
    """(tmp, backup) for a fold target, placed OUTSIDE any partition-
    discovery tree: when dst is a day= partition dir, side dirs live in
    a ``<acc>__work`` sibling of the accumulator root (an underscore
    prefix alone does not exempt a ``name=value`` dir from partition
    parsing — Spark raises CONFLICTING_PARTITION_COLUMN_NAMES); when dst
    IS the accumulator root, its parent is never scanned and plain
    siblings suffice."""
    parent, name = os.path.split(os.path.normpath(dst_dir))
    if "=" in name:
        work = parent + "__work"
        os.makedirs(work, exist_ok=True)
        name = name.replace("=", "~")
    else:
        work = parent
    return (os.path.join(work, f"_next_{name}"),
            os.path.join(work, f"_bak_{name}"))


def _recover(dst_dir: str) -> None:
    """Heal any interrupted fold: restore the backup if the live dir is
    missing (crash in the single-rename window), drop it if the swap had
    already committed (crash before backup cleanup), and clear stale
    tmp dirs either way."""
    tmp, bak = _side_dirs(dst_dir)
    if os.path.isdir(bak):
        if not os.path.isdir(dst_dir):
            os.replace(bak, dst_dir)
        else:
            shutil.rmtree(bak, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


def _applied_batch(dst_dir: str, run_id: str) -> int:
    """Last folded batch_id for THIS run identity; -1 if the marker
    belongs to a different run (checkpoint reset / other query) — those
    batch ids restart at 0 and must not be mistaken for replays."""
    marker = os.path.join(dst_dir, _BATCH_MARKER)
    if os.path.isfile(marker):
        with open(marker) as f:
            raw = f.read().strip()
        rid, _, bid = raw.rpartition(":")
        if rid == run_id and bid:
            return int(bid)
    return -1


def _fold_into(spark, part_df: DataFrame, dst_dir: str,
               run_id: str, batch_id: int) -> None:
    """Commit one partial into one directory: recover, replay-skip,
    re-aggregate, write-aside with the marker, swap with rollback."""
    _recover(dst_dir)
    if os.path.isdir(dst_dir) and _applied_batch(dst_dir, run_id) >= batch_id:
        return  # replayed micro-batch: already folded in
    if os.path.isdir(dst_dir):
        old = spark.read.parquet(dst_dir)
        merged = (
            old.unionByName(part_df)
            .groupBy("hour_start", "event_type")
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("total_value").cast("decimal(38,6)")
                 .alias("total_value"))
        )
    else:
        merged = part_df
    tmp, bak = _side_dirs(dst_dir)
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _BATCH_MARKER), "w") as f:
        f.write(f"{run_id}:{batch_id}")
    if os.path.isdir(dst_dir):
        os.replace(dst_dir, bak)
        try:
            os.replace(tmp, dst_dir)
        except OSError:
            os.replace(bak, dst_dir)  # roll back to the pre-fold view
            raise
        shutil.rmtree(bak, ignore_errors=True)
    else:
        os.makedirs(os.path.dirname(dst_dir), exist_ok=True)
        os.replace(tmp, dst_dir)


def merge_partial_into(acc_dir: str, run_id: str = ""):
    """foreachBatch function: fold each batch's partial hourly aggregate
    into a single accumulator directory (whole-view rewrite per batch —
    see module docstring for the semantics _fold_into guarantees)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        _fold_into(batch_df.sparkSession, hourly_partial(batch_df),
                   acc_dir, run_id, batch_id)

    return fn


def merge_partial_into_partitioned(acc_dir: str, run_id: str = ""):
    """Day-partitioned foreachBatch fold: rewrites ONLY the
    ``acc_dir/day=YYYY-MM-DD`` partitions the batch's event-times touch.
    Idempotency is PER PARTITION — each day dir carries its own
    (run_id, batch_id) marker and swaps atomically with it, so a crash
    midway through a multi-day batch replays only the days that had not
    yet committed."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = (hourly_partial(batch_df)
                .withColumn("day", F.substring("hour_start", 1, 10))
                .cache())
        try:
            days = sorted(r["day"] for r in part.select("day").distinct().collect())
            os.makedirs(acc_dir, exist_ok=True)

            def fold_day(day: str) -> None:
                _fold_into(spark,
                           part.where(F.col("day") == day).drop("day"),
                           os.path.join(acc_dir, f"day={day}"),
                           run_id, batch_id)

            if len(days) <= 1:
                for day in days:
                    fold_day(day)
            else:
                # Per-day folds are INDEPENDENT (distinct dst dirs, each
                # with its own marker/backup/tmp names), so overlap them
                # (optimization guide §2.6): a multi-day batch's tiny
                # per-day jobs back-fill each other's stage tails
                # instead of running strictly sequentially. Crash
                # semantics are unchanged — per-day idempotency markers
                # already cover a batch that committed only SOME days,
                # whatever order they committed in.
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=min(4, len(days))) as pool:
                    list(pool.map(fold_day, days))
        finally:
            part.unpersist()

    return fn


def read_partitioned_view(spark, acc_dir: str) -> DataFrame:
    """Read the day-partitioned accumulator back as one view (the day
    column returns as a partition column; scans prune on it)."""
    return spark.read.parquet(acc_dir)
