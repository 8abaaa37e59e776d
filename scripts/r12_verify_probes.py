#!/usr/bin/env python
"""Focused oracle-parity check for named registry probes.

Usage: python scripts/r12_verify_probes.py <sf_dir> <probe> [probe ...]
Exit 0 iff every named probe matches its DuckDB oracle at sf_dir.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duckdb_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false").getOrCreate())
    reg = entrymod._registry()
    con = duckdb_connection(sf_dir)
    n_fail = 0
    for name in names:
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
    print(f"\n{len(names) - n_fail}/{len(names)} green at {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
