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
        assigned distributed via row_number/zipWithIndex offsets)."""
        if not self.exists(table):
            return 1
        row = self.read(table).agg(F.max("id").alias("m")).collect()[0]
        return (row["m"] or 0) + 1


def with_sequential_ids(df: DataFrame, start: int, order_by: list[str] | None = None) -> DataFrame:
    """Assign contiguous ids start..start+n-1.

    Uses zipWithIndex-free pure-DataFrame approach: a window row_number over
    a deterministic order when given, else monotonically_increasing_id rank.
    Contiguity matters because the reference's record compile picks the
    first record by id (record_compiler.py:58-75) — ids must be stable.
    """
    from pyspark.sql import Window

    if order_by:
        w = Window.orderBy(*order_by)
    else:
        df = df.withColumn("_mid", F.monotonically_increasing_id())
        w = Window.orderBy("_mid")
    out = df.withColumn("id", F.row_number().over(w) + F.lit(start - 1))
    return out.drop("_mid") if "_mid" in out.columns else out
