"""Z-order (Morton) layout: files written z-ordered on (a, b) carry
NARROW per-file min/max footer stats in BOTH dimensions, where a plain
single-column sort is narrow only in its leading column — asserted
directly on the parquet footers via pyarrow, the stats the row-group
pruner actually uses."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kingfisher_process_spark.store import write_zordered, zorder_value

N_FILES = 8


def _per_file_spans(path, col_a, col_b):
    """[(span_a, span_b)] per parquet file, from footer min/max stats."""
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins = {col_a: [], col_b: []}
        maxs = {col_a: [], col_b: []}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mins[name].append(col.statistics.min)
                    maxs[name].append(col.statistics.max)
        if mins[col_a] and mins[col_b]:
            spans.append((max(maxs[col_a]) - min(mins[col_a]),
                          max(maxs[col_b]) - min(mins[col_b])))
    return spans


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    # grid data: a and b independent, 256 x 256
    df = (spark.range(256 * 256)
          .select((F.col("id") % 256).alias("a"),
                  (F.col("id") / 256).cast("long").alias("b"),
                  F.col("id").alias("payload")))

    z_path = str(tmp_path / "zorder")
    write_zordered(df, z_path, "a", "b", n_files=N_FILES, bits=8)
    lin_path = str(tmp_path / "linear")
    (df.repartitionByRange(N_FILES, "a").sortWithinPartitions("a")
       .write.mode("overwrite").parquet(lin_path))

    z_spans = _per_file_spans(z_path, "a", "b")
    lin_spans = _per_file_spans(lin_path, "a", "b")
    assert len(z_spans) == N_FILES and len(lin_spans) == N_FILES

    # the linear layout leaves b unclustered: every file spans ~the full
    # b range; z-order must beat that by at least 2x on average while
    # keeping a clustered too (each file covers a rectangle, not a
    # stripe)
    z_b = sum(s[1] for s in z_spans) / N_FILES
    lin_b = sum(s[1] for s in lin_spans) / N_FILES
    assert lin_b > 200  # sanity: single-column sort does NOT cluster b
    assert z_b * 2 <= lin_b, (z_b, lin_b)
    z_a = sum(s[0] for s in z_spans) / N_FILES
    assert z_a < 256  # a stays clustered as well (a rectangle, not random)


def test_zorder_value_interleaves_bits(spark):
    rows = (spark.range(1)
            .select(zorder_value(F.lit(0b101), F.lit(0b011), bits=3)
                    .alias("z")).collect())
    # a bits -> even positions, b bits -> odd: a=101, b=011
    # z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 0b011011
    assert rows[0]["z"] == 0b011011


def test_zordered_read_roundtrip(spark, tmp_path):
    df = (spark.range(10_000)
          .select((F.col("id") % 100).alias("a"),
                  (F.col("id") / 100).cast("long").alias("b")))
    path = str(tmp_path / "z")
    write_zordered(df, path, "a", "b", n_files=4, bits=8)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.where((F.col("a") == 3) & (F.col("b") == 7)).count() == 1
