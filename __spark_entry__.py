"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``timefusion_spark``; this module just exposes
the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from timefusion_spark import registry


def _ensure_loaded() -> None:
    registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference README
    quick-start dashboard query shape (README.md:140-144) — count per
    operation name over a time window, ordered by count."""
    _ensure_loaded()
    from timefusion_spark.functions.register import register_all
    from timefusion_spark.registry import REGISTRY
    from timefusion_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)  # driver-owned sessions: UTC + ns-parquet
    register_all(spark)  # SQL surface live for every session the driver opens
    return REGISTRY["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    _ensure_loaded()
    from timefusion_spark.registry import REGISTRY

    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted where the
    operator is not SQL-expressible → rows-only check)."""
    _ensure_loaded()
    from timefusion_spark.registry import REGISTRY

    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
