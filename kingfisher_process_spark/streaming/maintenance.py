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
  upsert — is safe). A crash between steps 2 and 3 leaves the staged
  data in the hidden directory; rerunning the compaction completes the
  swap (step 1 detects and reuses complete staging).
- ``batch_id`` VALUES are not load-bearing in either store (the compile
  merge orders by release date, the SemDeDup summary ignores it); only
  the partition's replay-overwrite semantics matter, and those are
  preserved for every batch above the watermark.

Reference analogy: the reference's continuous maintenance loop
(process/management/commands/compiler.py:128-181) assumes PostgreSQL
compacts under it; a parquet-layout maintainer has to own this step.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import uuid

from pyspark.sql import SparkSession

_BATCH_RE = re.compile(r"^batch_id=(\d+)$")


def batch_ids(store_dir: str) -> list[int]:
    """Committed batch partitions present in the store, ascending."""
    out = []
    for d in glob.glob(os.path.join(store_dir, "batch_id=*")):
        m = _BATCH_RE.match(os.path.basename(d))
        if m and os.path.isdir(d):
            out.append(int(m.group(1)))
    return sorted(out)


def compact_batches(spark: SparkSession, store_dir: str, upto: int) -> int:
    """Fold every ``batch_id<=upto`` partition into one ``batch_id=upto``
    partition, preserving inner partition directories. Returns the
    number of batch partitions folded (0 = nothing to do). The caller
    guarantees ``upto`` is at or below the stream's committed watermark
    and that no trigger is concurrently writing."""
    staging = os.path.join(store_dir, ".compact_staging")
    staged_part = os.path.join(staging, f"batch_id={upto}")
    marker = os.path.join(staging, "_COMPLETE")
    # trash from any PRIOR run is always redundant: it is only created
    # after staging completed (marker), and the staged partition — or
    # the already-swapped store — holds the same rows. Clear it first.
    for t in glob.glob(os.path.join(store_dir, ".compact_trash-*")):
        shutil.rmtree(t, ignore_errors=True)
    olds = [b for b in batch_ids(store_dir) if b <= upto]
    # a completed staging with few/no source dirs left means a prior run
    # crashed between the trash move and the final rename — FINISH the
    # swap (returning 0 here would strand the staged data and lose the
    # folded batches)
    resuming = os.path.isfile(marker) and os.path.isdir(staged_part)
    if len(olds) <= 1 and not resuming:
        return 0
    if not resuming:
        shutil.rmtree(staging, ignore_errors=True)
        # read ONLY the folded range; basePath surfaces inner partition
        # columns (bucket/cell) so partitionBy can re-lay them out
        src = (spark.read.option("basePath", store_dir)
               .parquet(*[os.path.join(store_dir, f"batch_id={b}")
                          for b in olds]))
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
        with open(marker, "w") as f:
            f.write(f"upto={upto} folded={len(olds)}")
    trash = os.path.join(store_dir, f".compact_trash-{uuid.uuid4().hex[:8]}")
    os.makedirs(trash)
    for b in olds:
        os.rename(os.path.join(store_dir, f"batch_id={b}"),
                  os.path.join(trash, f"batch_id={b}"))
    os.rename(staged_part, os.path.join(store_dir, f"batch_id={upto}"))
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)
    return len(olds)


def _is_partition_dir(store_dir: str, col: str) -> bool:
    """True if ``col`` appears as an inner partition directory level."""
    return bool(glob.glob(os.path.join(store_dir, "batch_id=*", f"{col}=*")))
