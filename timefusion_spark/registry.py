"""Query registry — the single source for the driver contract.

Every implemented operator from SURVEY.md §2 registers here with:
  - a Spark callable (spark, sf_dir) -> DataFrame
  - an equivalent ANSI-SQL oracle string for DuckDB (or None for
    non-SQL-expressible operators → driver runs a rows-only check).

``__spark_entry__.queries()`` / ``oracle_sql()`` just read this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco


def load_all() -> None:
    """Import every query module so their registrations run."""
    from timefusion_spark.queries import (  # noqa: F401
        dedup_llm,
        functions_pg,
        json_variant,
        multimodal,
        pipeline_scale,
        relational,
        similarity,
        slt_parity,
        sources_q,
        storage_mor,
        text_analysis,
        timeseries,
    )
