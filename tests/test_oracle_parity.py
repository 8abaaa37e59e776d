"""Every registered probe must hash-match its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (run per-round at sf0.01);
catching divergence locally at the smaller scale keeps iteration fast.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duckdb_connection

REGISTRY = entrymod._registry()
ORACLE_PROBES = [name for name, p in REGISTRY.items() if p.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_PROBES)
def test_probe_matches_oracle(spark, duck, name):
    p = REGISTRY[name]
    df = p.fn(spark, SF_SMOKE)
    errors = compare(df, duck, p.oracle, name)
    assert not errors, "\n".join(errors)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


N_PROBES = 196  # bump when registering a probe — guards against the
# _registry() import-guard silently swallowing a module and shrinking
# the corpus the driver verifies


def test_queries_have_callables():
    q = entrymod.queries()
    assert len(q) == N_PROBES, (
        f"registry has {len(q)} probes, expected {N_PROBES} — "
        "a probe module failed to import (the ImportError guard in "
        "__spark_entry__._registry hides which; import them directly)")
    for name, fn in q.items():
        assert callable(fn), name
