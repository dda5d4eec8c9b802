"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (column-pruned, pushdown-friendly scan).

    events.parquet stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
    parquet reader rejects; read it as long (legacy nanosAsLong) and floor
    to microseconds — the same truncation DuckDB applies, so oracle
    comparisons line up exactly.
    """
    if name == "events":
        # Also set in session.py's builder; re-asserted here (idempotent,
        # check-first) because the driver may hand us ITS session, built
        # without the engine's confs.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
