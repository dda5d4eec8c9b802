"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Table-provider cache, the Spark analog of the reference's per-
# (project, table, version) cached delta-rs provider (database.rs:
# 11650-11840): the driver testdata is immutable, so the analyzed
# DataFrame (file listing + footer schema) is reused across queries in a
# session. Reusing the same plan objects also lets Spark skip already-
# materialized shuffle stages on warm re-runs — the Foyer-cache analog
# behind BASELINE.md's warm-cache reference numbers.
_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (column-pruned, pushdown-friendly scan).

    events.parquet stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
    parquet reader rejects; read it as long (legacy nanosAsLong) and floor
    to microseconds — the same truncation DuckDB applies, so oracle
    comparisons line up exactly.
    """
    key = (id(spark), sf_dir, name)
    cached = _CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # Also set in session.py's builder; re-asserted here (idempotent,
        # check-first) because the driver may hand us ITS session, built
        # without the engine's confs.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _CACHE[key] = df
    return df
