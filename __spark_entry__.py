"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The probe corpus lives in ``kingfisher_process_spark`` (plans/queries.py
plus functions/*); this module just exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    # Import side effects populate the probe registry.
    import kingfisher_process_spark.plans.queries  # noqa: F401

    try:
        import kingfisher_process_spark.functions.text  # noqa: F401
        import kingfisher_process_spark.functions.dedup  # noqa: F401
        import kingfisher_process_spark.functions.similarity  # noqa: F401
        import kingfisher_process_spark.functions.multimodal  # noqa: F401
        import kingfisher_process_spark.streaming.probes  # noqa: F401
    except ImportError:
        pass
    try:
        import kingfisher_process_spark.plans.ocds_entry  # noqa: F401
    except ImportError:
        pass
    from kingfisher_process_spark.plans.base import REGISTRY

    return REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _registry()
    return reg["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: p.fn for name, p in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return {name: p.oracle for name, p in _registry().items() if p.oracle is not None}
