"""Z-order clustering: the layout benefit, measured on real parquet
footers — not asserted from theory. For a conjunctive two-column range
predicate, a file can be skipped when its (min, max) stats exclude the
range on EITHER column; the z-ordered layout keeps files rectangular in
(a, b) space so both columns' stats are tight, while a single-key sort
leaves the second column's per-file ranges near-global (unskippable)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from kingfisher_process_spark.functions.zorder import write_zordered
from kingfisher_process_spark.plans.base import load_tables
from tests.conftest import SF_SMOKE


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
    write_zordered(o, "o_custkey % 65536",
                   "CAST(floor(o_totalprice / 8.0) AS BIGINT)", zed,
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
