"""Queries over the engine's custom Python DataSource connectors."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timefusion_spark.registry import query

_GEN_N = 5000


@query(
    "q_custom_source",
    oracle=f"""
    WITH gen AS (
        SELECT i AS event_id,
               (i * 37 + 11) % 100 AS user_id,
               ['click','view','purchase','error'][(i % 4) + 1] AS event_type,
               (i * 2654435761) % 1000000 AS value_milli
        FROM generate_series(0, {_GEN_N - 1}) t(i)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(value_milli) AS BIGINT) / 1000.0, 3) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM gen
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Custom Python DataSource connector (§2.1 sources — the gRPC-feed "
    "analog, sources/eventgen.py): rows are generated worker-side per "
    "input partition by closed-form integer arithmetic, so the DuckDB "
    "oracle reproduces the source EXACTLY via generate_series — the "
    "connector itself is under the correctness gate. Sums ride on the "
    "integer milli-value so no float associativity can drift the hash.",
)
def q_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.sources import register_sources

    register_sources(spark)
    ev = spark.read.format("eventgen").option("n", _GEN_N).load()
    return (
        ev.select(
            "event_type",
            "user_id",
            F.round(F.col("value") * 1000).cast("long").alias("value_milli"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value_milli") / 1000.0, 3).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )
