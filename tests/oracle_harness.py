"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a probe's Spark DataFrame and its DuckDB oracle SQL on the same
parquet tables, then compares row count, column names, and values
(order-insensitive, exact — the probes are engineered for bitwise
determinism; see plans/base.py docstring).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from kingfisher_process_spark.plans.base import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm_decimal(v):
    # Decimal('1.500000') and Decimal('1.5') compare equal via ==; use a
    # canonical string so sorting/sets work.
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        return ("float", "nan" if math.isnan(v) else repr(v))
    if isinstance(v, int):
        return ("int", v)
    if v is None:
        return ("null",)
    return ("str", str(v))


# Spark output type → pandas dtype kind the driver's hasher will see.
# DECIMAL is banned outright: it serializes as object(Decimal) from Spark
# but float64 from DuckDB, which broke 16 driver hashes in round 2.
_KIND = {"tinyint": "i", "smallint": "i", "int": "i", "bigint": "i",
         "float": "f", "double": "f", "boolean": "b"}


def _type_policy_errors(spark_df, con, sql: str, name: str) -> list[str]:
    """Driver-parity output-type policy: no DECIMAL output columns, and
    numeric columns must land on the same pandas dtype kind in both
    engines (catches DuckDB SUM(int)→HUGEINT→float64 vs Spark bigint).

    ``sql`` here is whatever ``compare`` hands in — since the
    single-execution change below, that is a scan of the materialized
    oracle result, not the original oracle query, so this check no
    longer re-runs the (sometimes multi-minute) oracle a second time.
    DuckDB's pandas dtype mapping depends only on the result's column
    types and values, both of which the temp table preserves exactly."""
    errors: list[str] = []
    expected = {}
    for f in spark_df.schema.fields:
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            errors.append(
                f"{name}: output column {f.name} is {t} — emit double/bigint"
                " (decimal hashes differently per engine in the driver)")
        if t in _KIND:
            expected[f.name] = _KIND[t]
    if expected:
        pdf = con.execute(sql).df()
        for col, kind in expected.items():
            if col in pdf.columns and len(pdf) and pdf[col].dtype.kind != kind:
                errors.append(
                    f"{name}: column {col} pandas kind mismatch "
                    f"spark={kind} duck={pdf[col].dtype.kind} "
                    f"({pdf[col].dtype}) — add a CAST in the oracle SQL")
    return errors


def compare(spark_df, con, sql: str, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    # Execute the oracle ONCE into a connection-local temp table and
    # serve both the value fetch and the dtype-policy check from scans
    # of it (r13: the three unrolled-BPE oracles run 60-75 s each at
    # sf0.001 and the old shape executed every numeric-output oracle
    # twice — 400 s of the local parity walk was duplicate DuckDB work).
    # CTAS stores the exact result types, so both consumers see exactly
    # what a direct execution produced. The CTAS runs on a worker thread
    # so the two engines' work overlaps (independent computations —
    # optimization guide §2.6); only that thread touches the connection
    # until join() returns.
    import threading

    duck_err: list[BaseException] = []

    def _run_oracle():
        try:
            con.execute(
                f"CREATE OR REPLACE TEMP TABLE _kps_oracle_result AS {sql}")
        except BaseException as e:  # re-raised on the caller below
            duck_err.append(e)

    t = threading.Thread(target=_run_oracle)
    t.start()
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    t.join()
    if duck_err:
        raise duck_err[0]
    sql = "SELECT * FROM _kps_oracle_result"
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        errors.append(f"{name}: columns differ spark={spark_cols} duck={duck_cols}")
        return errors
    errors.extend(_type_policy_errors(spark_df, con, sql, name))
    if len(spark_rows) != len(duck_rows):
        errors.append(f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = {c: i for i, c in enumerate(duck_cols)}
    s_set = sorted(
        tuple(_norm_decimal(r[i]) for i in order) for r in spark_rows
    )
    d_set = sorted(
        tuple(_norm_decimal(r[dorder[spark_cols[i]]]) for i in order) for r in duck_rows
    )
    if s_set != d_set:
        diff_s = [r for r in s_set if r not in d_set][:3]
        diff_d = [r for r in d_set if r not in s_set][:3]
        errors.append(
            f"{name}: values differ; spark-only sample={diff_s} duck-only sample={diff_d}"
        )
    return errors
