#!/usr/bin/env python
"""Pre-freeze driver-gate rehearsal: run the FIRST-50 registry window
(the probes the round driver will verify) against their DuckDB oracles
at sf0.01 — the driver's exact scale — and report per-probe status.

Usage: python scripts/verify_cap.py [sf_dir] [n]
Exit code 0 iff every checked probe matches (rows-only probes count as
pass when they return >= 0 rows with a stable schema).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duckdb_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false").getOrCreate())
    reg = entrymod._registry()
    cap = list(reg)[:n]
    con = duckdb_connection(sf_dir)
    n_fail = 0
    for name in cap:
        p = reg[name]
        try:
            df = p.fn(spark, sf_dir)
            if p.oracle is None:
                rows = df.collect()
                print(f"ROWS-ONLY {name}: {len(rows)} rows")
                continue
            errors = compare(df, con, p.oracle, name)
        except Exception as e:  # noqa: BLE001 — report and keep walking
            errors = [f"exception: {e!r:.300}"]
        if errors:
            n_fail += 1
            print(f"FAIL {name}: {errors}")
        else:
            print(f"PASS {name}")
    con.close()
    print(f"\n{n - n_fail}/{n} green at {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
