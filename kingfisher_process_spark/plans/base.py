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


# DataFrame handles memoized per (session, sf_dir, table): the testdata
# parquet is immutable, and re-running spark.read.parquet per probe call
# costs ~90 ms of file-listing + footer reads per table. Views are still
# re-registered on every access so alternating sf_dirs in one session
# (parity tests do this) always point the views at the right data.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}

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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Make ``events.ts`` a TIMESTAMP regardless of how the parquet file
    stored it.

    Testdata generations have flip-flopped between TIMESTAMP(NANOS)
    (which, under ``nanosAsLong``, Spark reads as a raw ``bigint`` of
    epoch nanos) and plain ``timestamp[us]`` (read natively). Convert
    ONLY the bigint form — integer DIV, since float division loses
    precision at 1e18 nanos; the truncation to micros matches what DuckDB
    does loading nanos into its micros-based TIMESTAMP. A native
    timestamp column passes through untouched.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        # Native timestamp[us] read (inferTimestampNTZ). Probes are written
        # against TIMESTAMP (LTZ): with the session tz pinned UTC the cast
        # maps wall-clock → the same instant timestamp_micros produced.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


class LazyTables:
    """Per-table lazy loader: each parquet source is read (and its temp
    view registered) only when a probe first touches it, so one broken
    source can never fail the ~70 probes that don't read it. Mapping-like
    for the access pattern every probe uses (``t["lineitem"]``)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._app_id = spark.sparkContext.applicationId

    def __getitem__(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(name)
        key = (self._app_id, self._sf_dir, name)
        df = _TABLE_CACHE.get(key)
        if df is None:
            df = self._spark.read.parquet(
                _parallel_copy(f"{self._sf_dir}/{name}.parquet"))
            if name == "events":
                df = normalize_events_ts(df)
            _TABLE_CACHE[key] = df
        df.createOrReplaceTempView(name)
        return df

    def __contains__(self, name: str) -> bool:
        return name in TABLE_NAMES

    def __iter__(self):
        return iter(TABLE_NAMES)

    def __len__(self) -> int:
        return len(TABLE_NAMES)

    def keys(self):
        return list(TABLE_NAMES)

    def items(self):
        return [(n, self[n]) for n in TABLE_NAMES]


def load_tables(spark: SparkSession, sf_dir: str) -> LazyTables:
    """Lazy handle over the driver's parquet tables.

    Tables load on first access (see :class:`LazyTables`); ``events.ts``
    is normalized to TIMESTAMP whichever physical type the parquet file
    used (see :func:`normalize_events_ts`).
    """
    # Harmless when ts is already timestamp[us]; required to read a
    # TIMESTAMP(NANOS) generation at all (vectorized reader rejects it).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The driver may hand us a session without our factory's tz pin;
    # temporal probes format instants, so determinism requires UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Engine tuning posture on externally-created sessions (the driver's
    # session has Spark defaults: AQE off in older confs, 200 shuffle
    # partitions). All runtime-settable; results are unaffected, plans
    # coalesce to the data instead of 200 near-empty tasks per exchange.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try:
        par = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(par, 8)))
    except Exception:
        pass
    return LazyTables(spark, sf_dir)


@dataclass
class Probe:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver's weaker rows-only check
    survey_ids: str = ""  # which SURVEY §2 operators this exercises


REGISTRY: dict[str, Probe] = {}


def oracle_of(name: str) -> str:
    """Oracle SQL of an already-registered probe — for probes that
    compose other probes (audits, cross-checking implementations) and
    must share their output contract exactly."""
    return REGISTRY[name].oracle


def probe(name: str, oracle: str | None, survey_ids: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Probe(name, fn, oracle, survey_ids)
        return fn

    return deco


def dec(col_sql: str) -> str:
    """SQL fragment: deterministic decimal cast for a summed double."""
    return f"CAST({col_sql} AS DECIMAL(38,6))"
