"""SparkSession factory with the engine's standard configuration.

Mirrors the reference's session tuning (`database.rs:3021-3123`: pushdown
filters on, target_partitions = CPU quota, memory pool) with the Spark
equivalents: AQE, parquet filter pushdown (default-on), shuffle partitions
sized to cores, UTC session timezone so timestamps compare exactly against
microsecond-UTC semantics (`schemas/otel_logs_and_spans.yaml` Timestamp(µs,UTC)).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "timefusion_spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or fetch) the engine session.

    local[N] for tests/bench; on a real cluster the same confs apply minus
    master. Every conf here is scale-motivated:
      - AQE + coalesce/skew-join: runtime re-plan at 100 TB (replaces the
        reference's hand-tuned target_partitions, database.rs:3046).
      - shuffle.partitions sized to cores locally; AQE coalesces up.
      - Arrow enabled: Pandas-UDF operators move columnar, not row-by-row.
    """
    cpus = str(cpus or _DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # µs-typed parquet timestamps (the reference's storage contract).
        # Spark's INT96 default writes timestamps with NO pushdown-usable
        # row-group stats — a `ts > now()-1h` scan then reads every row
        # (the reference's recent_window_pruning.rs over-read bug class).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        # An existing session ignores builder confs; re-assert the
        # runtime-settable ones that affect CORRECTNESS (a driver-owned
        # session may carry a non-UTC zone or reject ns-parquet).
        ensure_runtime_confs(active)
        return active
    builder = builder.master(f"local[{cpus}]").config("spark.driver.memory", "48g")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Re-assert runtime-settable confs that affect correctness on a
    session the engine did not build (e.g. the driver's)."""
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"),
        # Maintenance jobs overwrite single partitions; static mode would
        # truncate the whole table/rollup directory on a driver-owned
        # session. The write sites also assert this locally (save/restore),
        # but a session-level default keeps ad-hoc callers safe too.
        ("spark.sql.sources.partitionOverwriteMode", "dynamic"),
    ):
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
