"""Small-file compaction for batch_id-partitioned maintenance stores.

The streaming maintainers (`materialized_compile_upsert`,
`semantic_dedup_upsert`) write one ``batch_id=N`` directory per
micro-batch — the idempotent-replay device (a retried batch overwrites
its own partition). The cost is the lakehouse small-files problem: a
long-running maintenance loop accumulates thousands of tiny parquet
files, and at 100 TB the per-trigger directory listing and footer reads
come to dominate the dirty-set reads the layout exists to serve. This
is what OPTIMIZE/compaction does on a transaction-logged table, done
here at the directory layout level.

``compact_batches`` folds every ``batch_id<=upto`` partition into a
single ``batch_id=upto`` partition (preserving any INNER partitioning —
``bucket=``/``cell=`` — so partition-pruned dirty reads keep working),
via a hidden staging directory and an all-renames swap:

1. read batches ``<= upto``, rewrite into ``.compact_staging`` (dot
   prefix: invisible to Spark's file index and to ``batch_id=*`` globs),
2. rename the old batch directories into a hidden trash directory,
3. rename the staged partition into place, 4. delete the trash.

Contracts (documented, test-pinned):

- **Watermark**: only compact batches the stream has committed (its
  checkpoint is past them). A replay of a compacted batch_id would
  re-append rows the compacted partition already holds — the same rule
  every log-structured store applies before folding segments.
- **Quiescence**: run between triggers (foreachBatch is serial per
  query, so calling it from inside the batch function — after the
  upsert — is safe). A crash anywhere leaves the store recoverable: the
  next compact_batches call FIRST completes any prior run's finished
  staging (at the upto recorded in its marker — even if the new call
  asks for a different upto), then proceeds with its own fold.
- ``batch_id`` VALUES are not load-bearing in either store (the compile
  merge orders by release date, the SemDeDup summary ignores it); only
  the partition's replay-overwrite semantics matter, and those are
  preserved for every batch above the watermark.

Reference analogy: the reference's continuous maintenance loop
(process/management/commands/compiler.py:128-181) assumes PostgreSQL
compacts under it; a parquet-layout maintainer has to own this step.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import SparkSession

from kingfisher_process_spark.functions.artifact_fs import (
    list_parquet_recursive, list_partition_dirs, list_trash_dirs)

_BATCH_RE = re.compile(r"^batch_id=(\d+)$")
_MARKER_RE = re.compile(r"^upto=(\d+) ")


def batch_ids(store_dir: str) -> list[int]:
    """Committed batch partitions present in the store, ascending."""
    out = []
    for d in list_partition_dirs(store_dir, "batch_id"):
        m = _BATCH_RE.match(os.path.basename(d))
        if m and os.path.isdir(d):
            out.append(int(m.group(1)))
    return sorted(out)


def recover_store(store_dir: str) -> bool:
    """Complete any stranded compaction swap so the store is fully
    visible to readers. MUST run before every read/upsert of a store
    that compact_batches may have touched: a crash mid-``_finish_swap``
    leaves folded batches visible only in hidden staging/trash dirs, and
    an upsert that reads the store first would recompute against
    incomplete history and persist removals derived from it (r6 advice —
    silent divergence from the batch oracle, not just staleness).

    Idempotent and cheap when there is nothing to do (one stat + one
    listing). Returns True if a stranded swap was completed.

    - Staging with a ``_COMPLETE`` marker holds the ONLY copy of its
      folded batches once their dirs moved to trash — finish THAT swap
      at the upto recorded in the marker (never a caller-supplied one;
      resuming under a different upto used to rmtree staged data).
    - Trash dirs are redundant once any live staging has been consumed
      (the staged partition — or the already-swapped store — holds the
      same rows), so they are safe to drop.
    """
    staging = os.path.join(store_dir, ".compact_staging")
    marker = os.path.join(staging, "_COMPLETE")
    finished = False
    if os.path.isfile(marker):
        with open(marker) as f:
            m = _MARKER_RE.match(f.read())
        if m:
            _finish_swap(store_dir, staging, int(m.group(1)))
            finished = True
    for t in list_trash_dirs(store_dir):
        shutil.rmtree(t, ignore_errors=True)
    return finished


def compact_batches(spark: SparkSession, store_dir: str, upto: int) -> int:
    """Fold every ``batch_id<=upto`` partition into one ``batch_id=upto``
    partition, preserving inner partition directories. Returns the
    number of batch partitions folded this call (0 = nothing to do).
    The caller guarantees ``upto`` is at or below the stream's committed
    watermark and that no trigger is concurrently writing."""
    staging = os.path.join(store_dir, ".compact_staging")
    marker = os.path.join(staging, "_COMPLETE")
    recover_store(store_dir)
    olds = [b for b in batch_ids(store_dir) if b <= upto]
    if len(olds) <= 1:
        return 0
    shutil.rmtree(staging, ignore_errors=True)
    staged_part = os.path.join(staging, f"batch_id={upto}")
    # read ONLY the folded range; basePath surfaces inner partition
    # columns (bucket/cell) so partitionBy can re-lay them out. A batch
    # that produced zero rows wrote only _SUCCESS — no part files — and
    # schema inference would fail on it; fold only file-backed dirs
    # (the file-less ones still fold away via the rename step).
    src_dirs = [os.path.join(store_dir, f"batch_id={b}") for b in olds]
    with_files = [d for d in src_dirs if list_parquet_recursive(d)]
    if with_files:
        src = spark.read.option("basePath", store_dir).parquet(*with_files)
        inner = [c for c in src.columns
                 if c != "batch_id" and _is_partition_dir(store_dir, c)]
        body = src.drop("batch_id")
        # the point is FEWER files: route each inner partition's rows to
        # one task (one output file per directory); no inner layout →
        # one file total
        body = body.repartition(*inner) if inner else body.coalesce(1)
        writer = body.write.mode("overwrite")
        if inner:
            writer = writer.partitionBy(*inner)
        writer.parquet(staged_part)
    else:
        os.makedirs(staged_part)  # all-empty fold → one empty partition
    with open(marker, "w") as f:
        f.write(f"upto={upto} folded={len(olds)}")
    _finish_swap(store_dir, staging, upto)
    return len(olds)


def _finish_swap(store_dir: str, staging: str, upto: int) -> None:
    """Steps 2-4: move source dirs to trash, rename the staged partition
    in, clean up. Idempotent — safe to call on a resumed crash at any
    point after the staging's marker was written."""
    staged_part = os.path.join(staging, f"batch_id={upto}")
    if not os.path.isdir(staged_part):
        # the staged partition was already renamed in by a prior run;
        # only the staging shell (marker) is left
        shutil.rmtree(staging, ignore_errors=True)
        return
    trash = os.path.join(store_dir, f".compact_trash-{uuid.uuid4().hex[:8]}")
    os.makedirs(trash)
    for b in [b for b in batch_ids(store_dir) if b <= upto]:
        os.rename(os.path.join(store_dir, f"batch_id={b}"),
                  os.path.join(trash, f"batch_id={b}"))
    os.rename(staged_part, os.path.join(store_dir, f"batch_id={upto}"))
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)


def _is_partition_dir(store_dir: str, col: str) -> bool:
    """True if ``col`` appears as an inner partition directory level."""
    return any(list_partition_dirs(b, col)
               for b in list_partition_dirs(store_dir, "batch_id"))
