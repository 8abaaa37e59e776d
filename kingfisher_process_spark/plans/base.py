"""Probe registry infrastructure.

Every implemented operator (SURVEY.md §2) gets a named probe: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
ANSI-SQL oracle string DuckDB runs on the same parquet tables. The driver
hash-compares both at sf0.01 — this is the correctness gate.

Determinism rules used throughout (so Spark and DuckDB hash-match exactly):

- SUMs over doubles go through ``CAST(x AS DECIMAL(38,6))`` first: the
  per-row cast is deterministic (ties with the decimal grid are impossible
  for binary doubles at scale 6) and decimal addition is exact and
  associative, so partial-aggregation order cannot change the result.
- Ratios/averages divide exact decimal sums cast to double — one IEEE
  division, identical in both engines.
- Temporal outputs are formatted to strings (``date_format`` /
  ``strftime``) so timezone/object-representation differences vanish.
- Every ORDER BY ends with a unique tiebreak column.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# DataFrame handles memoized per (session, sf_dir): the testdata parquet is
# immutable, and re-running spark.read.parquet per probe call costs ~90 ms
# of file-listing + footer reads per table (~0.9 s per probe). Views are
# still re-registered on every call so alternating sf_dirs in one session
# (parity tests do this) always point the views at the right data.
_TABLE_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}

# The driver's testdata files are written as ONE parquet row group per
# table, and parquet reads are row-group granular — so every scan runs as
# a single task no matter how many input splits Spark makes, and each
# probe's scan+partial-agg is pinned to 1 of 32 cores. The engine-side fix
# (the same thing OPTIMIZE/compaction does on a lakehouse table) is a
# one-time rewrite into multiple files sized so the default bin-packing
# (openCostInBytes 4 MB) yields one task per file. Cached per source
# (path, mtime, size) in the system tmp dir; atomic rename makes
# concurrent builders (driver verify + bench) converge on one copy.
_SPLIT_MIN_ROWS = 64_000
_SPLIT_TARGET_ROWS = 16_000
_SPLIT_MAX_FILES = 32


def _parallel_copy(src: str) -> str:
    """Return a path to a multi-file copy of ``src`` (or ``src`` itself
    when it is already parallel enough / too small to matter)."""
    import hashlib
    import tempfile

    import pyarrow.parquet as pq

    st = os.stat(src)
    f = pq.ParquetFile(src)
    rows = f.metadata.num_rows
    n_files = min(_SPLIT_MAX_FILES, max(1, rows // _SPLIT_TARGET_ROWS))
    if rows < _SPLIT_MIN_ROWS or f.metadata.num_row_groups >= n_files or n_files <= 2:
        return src
    key = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:{n_files}".encode()).hexdigest()[:16]
    out_dir = os.path.join(tempfile.gettempdir(), "kps_opt_cache", key)
    if os.path.isdir(out_dir):
        return out_dir
    tbl = f.read()
    tmp_dir = out_dir + f".tmp-{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    step = -(-rows // n_files)
    for i in range(n_files):
        part = tbl.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, os.path.join(tmp_dir, f"part-{i:05d}.parquet"))
    try:
        os.replace(tmp_dir, out_dir)
    except OSError:
        # lost the race to another process — its copy is equivalent
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read the driver's parquet tables and register them as temp views.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as raw nanos (legacy conf) and
    rebuild a microsecond timestamp — same truncation DuckDB applies when
    it loads nanos into its micros-based TIMESTAMP.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, sf_dir)
    tables = _TABLE_CACHE.get(key)
    if tables is None:
        tables = {}
        for name in TABLE_NAMES:
            df = spark.read.parquet(_parallel_copy(f"{sf_dir}/{name}.parquet"))
            if name == "events":
                # integer DIV — float division loses precision at 1e18 nanos
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            tables[name] = df
        _TABLE_CACHE[key] = tables
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


@dataclass
class Probe:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver's weaker rows-only check
    survey_ids: str = ""  # which SURVEY §2 operators this exercises


REGISTRY: dict[str, Probe] = {}


def probe(name: str, oracle: str | None, survey_ids: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Probe(name, fn, oracle, survey_ids)
        return fn

    return deco


def dec(col_sql: str) -> str:
    """SQL fragment: deterministic decimal cast for a summed double."""
    return f"CAST({col_sql} AS DECIMAL(38,6))"
