"""Z-order (Morton) layout: files written z-ordered on (a, b) carry
NARROW per-file min/max footer stats in BOTH dimensions, where a plain
single-column sort is narrow only in its leading column — asserted
directly on the parquet footers via pyarrow, the stats the row-group
pruner actually uses. The SQL-string form (`functions/zorder.z_expr`,
what the probe/oracle hash-check) is pinned equivalent to the Column
form (`store.zorder_value`, what the writer uses)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kingfisher_process_spark.functions.zorder import z_expr
from kingfisher_process_spark.plans.base import load_tables
from kingfisher_process_spark.store import write_zordered, zorder_value
from tests.conftest import SF_SMOKE

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


def test_z_expr_sql_equivalent_to_zorder_value_column(spark):
    """The SQL-string form the probe/oracle hash-check must equal the
    Column form the writer sorts by, over a dense bit-pattern sweep."""
    df = (spark.range(4096)
          .select((F.col("id") % 64).alias("a"),
                  (F.col("id") / 64).cast("long").alias("b")))
    mismatch = (df.select(
        zorder_value(F.col("a"), F.col("b"), bits=6).alias("zc"),
        F.expr(z_expr("a", "b", bits=6)).alias("ze"))
        .where(F.col("zc") != F.col("ze")).count())
    assert mismatch == 0


def test_zordered_read_roundtrip(spark, tmp_path):
    df = (spark.range(10_000)
          .select((F.col("id") % 100).alias("a"),
                  (F.col("id") / 100).cast("long").alias("b")))
    path = str(tmp_path / "z")
    write_zordered(df, path, "a", "b", n_files=4, bits=8)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.where((F.col("a") == 3) & (F.col("b") == 7)).count() == 1


def _skippable(path_glob, a_col, a_rng, b_col, b_rng):
    """Fraction of files whose row-group stats exclude the predicate
    a IN a_rng AND b IN b_rng (skip if ANY column's range misses)."""
    files = sorted(glob.glob(path_glob))
    assert files
    skipped = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        can_skip = False
        for col, (lo, hi) in ((a_col, a_rng), (b_col, b_rng)):
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(cols[col]).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if min(mins) > hi or max(maxs) < lo:
                can_skip = True
        skipped += can_skip
    return skipped / len(files), len(files)


def test_zorder_layout_prunes_more_files_than_single_key_sort(spark, tmp_path):
    o = load_tables(spark, SF_SMOKE)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    n_files = 16

    flat = str(tmp_path / "by_date")
    (o.repartitionByRange(n_files, "o_orderdate")
     .sortWithinPartitions("o_orderdate")
     .write.mode("overwrite").parquet(flat))

    zed = str(tmp_path / "zorder")
    write_zordered(o, zed, "o_custkey % 65536",
                   "CAST(floor(o_totalprice / 8.0) AS BIGINT)",
                   n_files=n_files)

    # same row multiset either way
    assert (spark.read.parquet(zed).count()
            == spark.read.parquet(flat).count() == o.count())

    # a small rectangle in (custkey, totalprice) space
    a_rng = (100, 400)          # o_custkey
    b_rng = (50_000.0, 100_000.0)  # o_totalprice
    flat_frac, nf = _skippable(flat + "/part-*.parquet",
                               "o_custkey", a_rng, "o_totalprice", b_rng)
    z_frac, nz = _skippable(zed + "/part-*.parquet",
                            "o_custkey", a_rng, "o_totalprice", b_rng)
    # date-sorted files each span ~the whole custkey/price domain: no
    # file is skippable; the z-layout must make most files skippable
    assert z_frac >= flat_frac + 0.5, (flat_frac, z_frac, nf, nz)
    assert z_frac >= 0.5, z_frac
