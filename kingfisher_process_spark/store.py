"""Parquet-backed table store — the engine's relational envelope.

The reference keeps ten PostgreSQL tables around a schemaless JSONB payload
(process/models.py:30-406; docs/database.rst:14-46). Here each table is a
parquet directory under a base path, with a typed StructType envelope and
the JSON payload held as a raw canonical string (see util.canonical_json —
decimal fidelity is why payloads never round-trip through Spark JSON types).

Scale posture: ``release``/``record``/``compiled_release``/``data`` are the
big tables; they are written partitioned by ``collection_id`` so per-
collection stages (compile, check, wipe) prune partitions at the scan, and
sorted within files by ``ocid`` so min/max parquet stats narrow OCID probes.
A wipe/delete is a partition drop, not a row delete (the reference needs
keyset-paginated deletes, deleteorphan.py:27-44 — Spark doesn't).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schemas follow process/models.py (see FIXTURES.md §2). Text dates stay
# strings on purpose: lexicographic comparison is reference semantics
# (process/views.py:193-194).

_long = T.LongType()
_str = T.StringType()
_bool = T.BooleanType()
_int = T.IntegerType()
_ts = T.TimestampType()


def _schema(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, T.StructType] = {
    "collection": _schema(
        ("id", _long), ("source_id", _str), ("data_version", _str), ("sample", _bool),
        ("steps", T.ArrayType(_str)), ("options", _str), ("expected_files_count", _int),
        ("data_type", _str), ("compilation_started", _bool), ("compilation_enqueued", _bool),
        ("parent_id", _long), ("transform_type", _str), ("scrapyd_job", _str),
        ("cached_releases_count", _long), ("cached_records_count", _long),
        ("cached_compiled_releases_count", _long),
        ("store_start_at", _ts), ("store_end_at", _ts), ("deleted_at", _ts), ("completed_at", _ts),
    ),
    "collection_file": _schema(
        ("id", _long), ("collection_id", _long), ("filename", _str), ("url", _str),
        ("compilation_started", _bool),
    ),
    "collection_note": _schema(
        ("id", _long), ("collection_id", _long), ("note", _str), ("data", _str),
        ("stored_at", _ts), ("code", _str),
    ),
    "processing_step": _schema(
        ("id", _long), ("collection_id", _long), ("collection_file_id", _long),
        ("ocid", _str), ("name", _str),
    ),
    "data": _schema(("id", _long), ("hash_md5", _str), ("data", _str)),
    "package_data": _schema(("id", _long), ("hash_md5", _str), ("data", _str)),
    "release": _schema(
        ("id", _long), ("collection_id", _long), ("collection_file_id", _long),
        ("ocid", _str), ("release_id", _str), ("release_date", _str),
        ("data_id", _long), ("package_data_id", _long),
    ),
    "record": _schema(
        ("id", _long), ("collection_id", _long), ("collection_file_id", _long),
        ("ocid", _str), ("data_id", _long), ("package_data_id", _long),
    ),
    "compiled_release": _schema(
        ("id", _long), ("collection_id", _long), ("collection_file_id", _long),
        ("ocid", _str), ("release_date", _str), ("data_id", _long),
    ),
    "release_check": _schema(("id", _long), ("release_id", _long), ("cove_output", _str)),
    "record_check": _schema(("id", _long), ("record_id", _long), ("cove_output", _str)),
}

# Tables partitioned by collection for pruning + partition-drop deletes.
PARTITIONED_BY_COLLECTION = {"release", "record", "compiled_release", "collection_file",
                             "collection_note", "processing_step"}


class Store:
    """A directory of parquet tables with the reference's schema."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        self._next_ids: dict[str, int] = {}
        os.makedirs(base_dir, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            not f.startswith(("_", ".")) for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        if table not in SCHEMAS:
            raise KeyError(table)
        if not self.exists(table):
            return self.spark.createDataFrame([], SCHEMAS[table])
        df = self.spark.read.schema(SCHEMAS[table]).parquet(self.path(table))
        return df.select(*[f.name for f in SCHEMAS[table].fields])

    def append(self, table: str, df: DataFrame) -> None:
        self._write(table, df, "append")

    def overwrite(self, table: str, df: DataFrame) -> None:
        self._write(table, df, "overwrite")

    def _write(self, table: str, df: DataFrame, mode: str) -> None:
        cols = [f.name for f in SCHEMAS[table].fields]
        out = df.select(*[F.col(c).cast(SCHEMAS[table][c].dataType) for c in cols])
        # re-apply names lost by cast()
        out = out.toDF(*cols)
        writer = out.write.mode(mode)
        if table in PARTITIONED_BY_COLLECTION:
            writer = writer.partitionBy("collection_id")
        writer.parquet(self.path(table))
        # id watermark now unknown unless the writer advances it explicitly
        self._next_ids.pop(table, None)

    def drop_collection_partition(self, table: str, collection_id: int) -> None:
        """Delete one collection's rows — a partition drop, O(1) metadata."""
        p = os.path.join(self.path(table), f"collection_id={collection_id}")
        if os.path.isdir(p):
            shutil.rmtree(p)

    def register_views(self, prefix: str = "") -> None:
        for table in SCHEMAS:
            self.read(table).createOrReplaceTempView(prefix + table)

    def next_id(self, table: str) -> int:
        """Next surrogate id (driver-side max+1; ids within a batch are
        assigned distributed via per-partition offsets —
        with_sequential_ids). Cached between writes: writers that know the
        ids they appended call advance_next_id, everything else falls back
        to a max() scan after the cache is invalidated by _write."""
        if table in self._next_ids:
            return self._next_ids[table]
        if not self.exists(table):
            nid = 1
        else:
            row = self.read(table).agg(F.max("id").alias("m")).collect()[0]
            nid = (row["m"] or 0) + 1
        self._next_ids[table] = nid
        return nid

    def advance_next_id(self, table: str, value: int) -> None:
        """Record the id watermark after an append whose ids are known."""
        self._next_ids[table] = value

    def export_jdbc(self, table: str, url: str, dbtable: str | None = None,
                    mode: str = "append", properties: dict | None = None) -> None:
        """JDBC sink option (the declared Spark SQL + JDBC write path):
        mirror one store table into an external RDBMS. The write is
        distributed (one JDBC connection per partition); requires the
        target's JDBC driver jar on the Spark classpath."""
        self.read(table).write.mode(mode).jdbc(
            url, dbtable or table, properties=properties or {})


def with_sequential_ids(df: DataFrame, start: int,
                        order_by: list[str] | None = None,
                        ) -> tuple[DataFrame, int, DataFrame]:
    """Assign contiguous ids start..start+n-1, ordered by ``order_by``.
    Returns (df_with_ids, n, pinned) — n comes free from the offsets job
    (callers never need a separate count() action); ``pinned`` is the
    cached intermediate the caller must ``unpersist()`` once the ids have
    been consumed by an action.

    Scale-safe: a bare ``row_number().over(Window.orderBy(...))`` funnels
    every row through ONE task — the classic 100 TB killer. Instead:
    range-partition sort (parallel, what orderBy itself compiles to), then
    per-partition offsets (a tiny #partitions-row aggregate on the driver)
    plus a partition-local row_number, which parallelizes across executors.

    Contiguity matters because the reference's record compile picks the
    first record by id (record_compiler.py:58-75) — ids must be stable.
    """
    from pyspark.sql import Window

    if order_by:
        # Explicit partition count: AQE cannot re-coalesce this shuffle
        # (the cache below pins the plan), so inheriting the global
        # shuffle.partitions would fix tiny writes at 200 tasks.
        n_parts = max(2, df.sparkSession.sparkContext.defaultParallelism * 2)
        df = df.repartitionByRange(n_parts, *order_by).sortWithinPartitions(*order_by)
    df = df.withColumn("_mid", F.monotonically_increasing_id())
    # cache pins the partitioning so the counts job and the id job see the
    # same layout (id consistency between the append and the returned map)
    df = df.withColumn("_pid", F.spark_partition_id()).cache()

    counts = {
        r["_pid"]: r["cnt"]
        for r in df.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], start
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    n = acc - start
    if not offsets:
        empty = df.drop("_mid", "_pid").withColumn("id", F.lit(None).cast("long"))
        return empty, 0, df

    # offsets as a broadcast join (a literal map would bloat the plan at
    # thousands of partitions)
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*(order_by or ["_mid"]))
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("id", F.col("_off") + F.col("_rn") - F.lit(1))
    )
    return out.drop("_mid", "_pid", "_rn", "_off"), n, df
