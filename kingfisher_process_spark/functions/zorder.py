"""Z-order (Morton) clustering — multi-column data skipping.

The CLUSTERING utility lives in `store.py` (`zorder_value` — Column
form — and `write_zordered`, the range-sorted writer); this module
carries the cross-engine EXPRESSION forms the correctness gate needs:
`z_expr` (Spark SQL string) and `z_expr_duckdb` must produce identical
codes (equivalence with store.zorder_value is test-pinned), and the
`z_order_codes` probe hash-checks the interleave against DuckDB.

`tests/test_zorder.py` measures the layout effect on real parquet
footers: per-file min/max spans narrow in BOTH dimensions, and a
conjunctive two-column predicate skips most z-ordered files where a
single-key sort skips none.
Reference analogue: none (storage-layout extension, SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from kingfisher_process_spark.plans.base import load_tables, probe

Z_BITS = 16  # bits interleaved per column → 32-bit z-value


def z_expr(a_sql: str, b_sql: str, bits: int = Z_BITS) -> str:
    """SQL expression: Morton-interleave the low ``bits`` bits of two
    non-negative BIGINT expressions (a → even positions, b → odd)."""
    return (
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT),"
        f" (acc, i) -> acc"
        f" + shiftleft(shiftright(CAST({a_sql} AS BIGINT), i) & 1, 2 * i)"
        f" + shiftleft(shiftright(CAST({b_sql} AS BIGINT), i) & 1, 2 * i + 1))"
    )


def z_expr_duckdb(a_sql: str, b_sql: str, bits: int = Z_BITS) -> str:
    # fully parenthesized: DuckDB's |/<</& precedence differs from
    # arithmetic and silently reassociates an unbracketed interleave
    return (
        f"list_sum(list_transform(generate_series(0, {bits - 1}),"
        f" i -> (((CAST({a_sql} AS BIGINT) >> i) & 1) << (2 * i))"
        f" + (((CAST({b_sql} AS BIGINT) >> i) & 1) << (2 * i + 1))))"
    )


# z inputs must fit 2^Z_BITS MONOTONICALLY — a modulo WRAPS the domain
# and destroys locality (a file then spans the whole real range even
# though its z-range is tight); quantize with floor-division instead.
# floor() explicitly: CAST truncates in Spark but rounds in DuckDB.
_ZA = "o_custkey % 65536"  # custkey < 65536 at every test sf: identity
_ZB = "CAST(floor(o_totalprice / 8.0) AS BIGINT)"  # 500k/8 < 2^16


@probe(
    "z_order_codes",
    f"""
    SELECT o_orderkey,
           CAST({z_expr_duckdb(_ZA, _ZB)} AS BIGINT) AS z
    FROM orders
    ORDER BY z, o_orderkey
    LIMIT 100
    """,
    survey_ids="storage-ext,O1,O5",
)
def z_order_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton codes for (o_custkey, o_totalprice) — the clustering key
    write_zordered sorts by. The probe pins the bit interleave exactly
    (wrong bit order, wrong masking, or signed-shift bugs all break the
    hash); the layout benefit is measured in tests/test_zorder.py
    against real parquet footers. The code is one map-side fold in
    whole-stage codegen; the top-100 is TakeOrderedAndProject.
    """
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.selectExpr("o_orderkey", f"{z_expr(_ZA, _ZB)} AS z")
        .orderBy("z", "o_orderkey").limit(100)
    )
