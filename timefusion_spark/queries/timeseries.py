"""Time-series / observability queries on the `events` table.

These mirror the reference's dashboard workload (README.md:140-226 and
tests/slt): time_bucket aggregation, error-rate FILTER aggregates, moving
averages over buckets, latest-event dedup (the DedupExec/merge-on-read
semantics of read_dedup.rs re-expressed as a window view), and top-K by
recency (ordered_union_for_topk.rs analog).

Scale notes: every query groups/windows on (bucket | user) keys that
hash-partition evenly; time_bucket is pure JVM expression arithmetic
(no UDF); the dedup view is a single window shuffle on the dedup keys —
the same shuffle the reference's DedupExec repartitioning implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timefusion_spark.functions.time import time_bucket
from timefusion_spark.queries._tables import t
from timefusion_spark.registry import query


@query(
    "q_time_bucket_counts",
    oracle="""
    SELECT timezone('UTC', to_timestamp(floor(epoch(ts) / 300) * 300)) AS bucket,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY bucket, event_type
    """,
    doc="time_bucket('5 minutes', ts) aggregation — functions.rs:1043-1093 "
    "TimescaleDB-compatible bucketing as pure expression arithmetic.",
)
def q_time_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            time_bucket("5 minutes", F.col("ts")).alias("bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("bucket", "event_type")
    )


@query(
    "q_dashboard_count_window",
    oracle="""
    SELECT COUNT(*) AS n_1h,
           COUNT(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-15 12:00:00'
                              AND ts <  TIMESTAMP '2024-01-15 12:05:00') AS n_5m
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15 12:00:00'
      AND ts <  TIMESTAMP '2024-01-15 13:00:00'
    """,
    doc="The BASELINE dashboard-count rows (207-377 ms 5-min window, "
    "336-343 ms 1-h window — docs/2026-08-03-overnight-optimization-"
    "report.md:107,120): a single windowed count whose time predicate "
    "pushes down to parquet row-group pruning; both windows answered in "
    "one scan via a FILTER aggregate.",
)
def q_dashboard_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    lo, hi = "2024-01-15 12:00:00", "2024-01-15 13:00:00"
    five = "2024-01-15 12:05:00"
    return ev.where(
        (F.col("ts") >= F.lit(lo).cast("timestamp"))
        & (F.col("ts") < F.lit(hi).cast("timestamp"))
    ).agg(
        F.count(F.lit(1)).alias("n_1h"),
        F.count(
            F.when(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(five).cast("timestamp")),
                1,
            )
        ).alias("n_5m"),
    )


@query(
    "q_dashboard_24h",
    oracle="""
    SELECT timezone('UTC', to_timestamp(floor(epoch(ts) / 3600) * 3600)) AS bucket,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
      AND ts <  TIMESTAMP '2024-01-16 00:00:00'
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="The BASELINE 24-h dashboard window (12.2 s - timeout@95 s "
    "pre-optimization, docs/2026-08-03-overnight-optimization-"
    "report.md:108,258): hourly tiles over a full day — counts, error "
    "counts, distinct users, totals — in ONE scan with the 24-h predicate "
    "pushed to row-group pruning. The reference's hardest latency row; "
    "here it is a single partial-agg shuffle over 24 bucket keys.",
)
def q_dashboard_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    lo, hi = "2024-01-15 00:00:00", "2024-01-16 00:00:00"
    return (
        ev.where(
            (F.col("ts") >= F.lit(lo).cast("timestamp"))
            & (F.col("ts") < F.lit(hi).cast("timestamp"))
        )
        .groupBy(time_bucket("1 hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("bucket")
    )


@query(
    "q_error_rate",
    oracle="""
    SELECT timezone('UTC', to_timestamp(floor(epoch(ts) / 3600) * 3600)) AS bucket,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
           ROUND(COUNT(*) FILTER (WHERE event_type = 'error') * 100.0 / COUNT(*), 4) AS error_pct
    FROM events
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="Hourly error-rate dashboard tile — README.md:181-183 FILTER pattern.",
)
def q_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    n_err = F.count(F.when(F.col("event_type") == "error", 1))
    return (
        ev.groupBy(time_bucket("1 hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            n_err.alias("n_errors"),
            F.round(n_err * 100.0 / F.count(F.lit(1)), 4).alias("error_pct"),
        )
        .orderBy("bucket")
    )


@query(
    "q_latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC) AS rn
        FROM events
    ) x
    WHERE rn = 1
    ORDER BY user_id
    """,
    doc="Keep-greatest dedup semantics (read_dedup.rs keep-greatest policy, "
    "schema_loader.rs:32-38 NULLS LAST): last-write-wins view as a window.",
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc_nulls_last(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    )


@query(
    "q_recent_events_topk",
    oracle="""
    SELECT event_id, ts, user_id, event_type, ROUND(value, 2) AS value
    FROM events
    ORDER BY ts DESC, event_id
    LIMIT 50
    """,
    doc="`ORDER BY ts DESC LIMIT 50` recency top-K — the reference's "
    "flagship low-latency path (BASELINE 377 ms over 6 h); Spark's "
    "TakeOrderedAndProject + parquet row-group stats give the early stop.",
)
def q_recent_events_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id"))
        .limit(50)
        .select("event_id", "ts", "user_id", "event_type", F.round("value", 2).alias("value"))
    )


@query(
    "q_moving_avg",
    oracle="""
    SELECT bucket, event_type, n,
           ROUND(AVG(n) OVER (
               PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_n
    FROM (
        SELECT timezone('UTC', to_timestamp(floor(epoch(ts) / 3600) * 3600)) AS bucket,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ) b
    ORDER BY event_type, bucket
    """,
    doc="Moving average over time buckets — README.md:220-226 window example.",
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    bucketed = ev.groupBy(
        time_bucket("1 hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("bucket").rowsBetween(-2, 0)
    return bucketed.select(
        "bucket",
        "event_type",
        "n",
        F.round(F.avg("n").over(w), 4).alias("moving_avg_n"),
    ).orderBy("event_type", "bucket")


@query(
    "q_percentile_duration",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4)  AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Percentile tiles (percentile_agg/approx_percentile, "
    "functions.rs:1096-1267). Exact `percentile` here so the oracle "
    "hash-matches; `approx_percentile` (t-digest-like sketch) is the "
    "scale path — see functions/percentile.py.",
)
def q_percentile_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


def _tdigest_sketch_oracle() -> str:
    from timefusion_spark.functions import tdigest as TD

    partial = TD.oracle_compress_sql("pts", ["event_type", "shard"])
    merged = TD.oracle_compress_sql("cent1", ["event_type"])
    return f"""
    WITH pts AS (
        SELECT event_type, CAST(user_id % 4 AS INT) AS shard,
               value AS m, CAST(1 AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
    ),
    cent1 AS ({partial}),
    cent2 AS ({merged}),
    q AS (
        SELECT event_type, m,
               SUM(c) OVER (PARTITION BY event_type ORDER BY m, c
                   ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS tot
        FROM cent2
    )
    SELECT event_type,
           ROUND(MIN(CASE WHEN cum >= CEIL(0.50 * tot) THEN m END), 4) AS p50,
           ROUND(MIN(CASE WHEN cum >= CEIL(0.95 * tot) THEN m END), 4) AS p95,
           ROUND(MIN(CASE WHEN cum >= CEIL(0.99 * tot) THEN m END), 4) AS p99
    FROM q
    GROUP BY event_type
    ORDER BY event_type
    """


@query(
    "q_percentile_sketch",
    oracle=_tdigest_sketch_oracle(),
    doc="Two-step mergeable percentile sketch (percentile_agg / "
    "approx_percentile, functions.rs:1096-1267): bounded rank-based "
    "t-digests (k1 asin scale, δ=200 centroid cap — functions.rs:1107) "
    "built per (event_type, user shard) with NO range prior, MERGED per "
    "event_type, then quantiles read from the merged digest — the "
    "partial-state roll-up the reference's t-digest UDAF provides. The "
    "construction is deterministic (rank-based scale + sorted left-fold "
    "means, functions/tdigest.py), so the oracle runs the SAME algorithm "
    "in SQL and the exact-hash gate applies to an approximate sketch.",
)
def q_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.functions import tdigest as TD

    ev = t(spark, sf_dir, "events").withColumn("shard", (F.col("user_id") % 4).cast("int"))
    partials = TD.tdigest_agg(ev, ["event_type", "shard"], "value")
    merged = TD.tdigest_merge(partials, ["event_type"])
    out = TD.with_quantiles(merged, {"p50": 0.50, "p95": 0.95, "p99": 0.99})
    return out.select(
        "event_type",
        F.round("p50", 4).alias("p50"),
        F.round("p95", 4).alias("p95"),
        F.round("p99", 4).alias("p99"),
    ).orderBy("event_type")


@query(
    "q_json_props_extract",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="JSON extraction from the semi-structured props column "
    "(datafusion-functions-json parity, SURVEY §2.9): get_json_object "
    "stays JVM-side.",
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(F.round(F.avg(k), 4).alias("avg_k"), F.max(k).alias("max_k"))
        .orderBy("event_type")
    )


@query(
    "q_sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                         > 1800 * 1000000 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    doc="Sessionization: lag + gap>30min cumulative-sum session ids — the "
    "standard Spark window composition (no stateful UDF needed in batch).",
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_ts = F.lag("ts").over(w_order)
    # µs-precision gap (matches the oracle's epoch_us) — unix_timestamp would
    # truncate to whole seconds and split sub-second boundary gaps differently.
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev_ts)) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(w_cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "q_asof_join",
    oracle="""
    WITH l AS (SELECT * FROM events WHERE event_id % 10 = 0),
    r AS (
        SELECT user_id, ts, MAX(value) AS status_value
        FROM events WHERE event_id % 97 = 0
        GROUP BY user_id, ts
    )
    SELECT l.event_type,
           COUNT(*) AS n,
           CAST(COUNT(r.status_value) AS BIGINT) AS n_matched,
           ROUND(SUM(COALESCE(r.status_value, 0)), 2) AS total_asof
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    GROUP BY l.event_type
    ORDER BY l.event_type
    """,
    doc="As-of join (beyond-reference operator, operators/asof.py): each "
    "event enriched with the latest prior per-user status value via the "
    "union-and-carry merge — one shuffle + one window, never the "
    "O(|L|*|R|) theta-join. Oracle uses DuckDB's native ASOF JOIN.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events")
    left = ev.where(F.col("event_id") % 10 == 0)
    right = (
        ev.where(F.col("event_id") % 97 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("status_value"))
    )
    joined = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("status_value_asof").alias("n_matched"),
            F.round(F.sum(F.coalesce("status_value_asof", F.lit(0.0))), 2).alias(
                "total_asof"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "q_hypertable_rollup",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
    doc="Hypertable rollup / continuous aggregate (beyond-reference "
    "operator): hourly partial aggregates MATERIALIZED to a rollup table, "
    "then daily tiles served by re-aggregating the rollup — counts and "
    "sums compose exactly, so the result equals aggregating raw data "
    "(which is what the oracle computes).",
)
def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.queries._tables import cached_storage_table
    from timefusion_spark.storage.schema import FieldDef, TableSchema

    # the materialized hourly aggregate is a build-once sidecar — a
    # continuous aggregate is REUSED across queries, and rebuilding the
    # rollup per invocation made every warm run measure the build, not
    # the serving path (review r12)
    def schema_factory() -> TableSchema:
        return TableSchema(
            table_name="hypertable_rollup",
            fields=[
                FieldDef("bucket", 'Timestamp(Microsecond, Some("UTC"))', False),
                FieldDef("event_type", "Utf8", False),
                FieldDef("n", "Int64", False),
                FieldDef("sum_value", "Float64", True),
            ],
            time_column="bucket",
        )

    def build_df() -> DataFrame:
        return t(spark, sf_dir, "events").groupBy(
            time_bucket("1 hour", F.col("ts")).alias("bucket"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))

    rollup = cached_storage_table(
        spark, sf_dir, "hypertable_rollup", "v1", schema_factory, build_df
    )
    daily = (
        rollup.read()
        .groupBy(
            F.col("bucket").cast("date").cast("string").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_value"), 2).alias("total_value"),
        )
        .orderBy("day", "event_type")
    )
    return daily.localCheckpoint(eager=True)


@query(
    "q_distinct_sketch",
    oracle="""
    WITH f AS (
        SELECT event_type,
               COUNT(DISTINCT substring(md5(CAST(user_id AS VARCHAR)), 1, 3)) AS filled
        FROM events GROUP BY event_type
    ), x AS (
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT f.event_type,
           CAST(f.filled AS BIGINT) AS filled,
           CASE WHEN f.filled >= 4096 THEN NULL
                ELSE ROUND(-4096.0 * ln(1 - f.filled / 4096.0), 2)
                END AS est_distinct,
           x.exact_distinct
    FROM f JOIN x ON f.event_type = x.event_type
    ORDER BY f.event_type
    """,
    doc="Mergeable approximate-distinct sketch (linear counting, the "
    "approx_count_distinct / HLL analog with an engine-portable hash): "
    "bucket = first 3 hex chars of md5(user_id) → 4096-slot occupancy "
    "bitmap, estimate = -m·ln(1 - filled/m). Built TWO-STEP to prove the "
    "mergeable-state roll-up (the reference's t-digest UDAF property, "
    "functions.rs:1096-1267): partial bucket SETS per (event_type, "
    "user_id%4 shard) are merged by set-union per event_type — partials "
    "compose exactly, so the merged estimate equals the single-pass one. "
    "Exact COUNT(DISTINCT) rides alongside as the error reference.",
)
def q_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bucket = F.substring(F.md5(F.col("user_id").cast("string")), 1, 3)
    partial = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("_shard")
    ).agg(F.collect_set(bucket).alias("_bs"))
    merged = partial.groupBy("event_type").agg(
        F.size(F.array_distinct(F.flatten(F.collect_list("_bs")))).cast("bigint").alias("filled")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        merged.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "filled",
            # saturation guard (review r12): at filled == m the estimate is
            # undefined — DuckDB's ln(0) RAISES where Spark's log(0) is
            # NULL, so both sides pin NULL explicitly
            F.when(
                F.col("filled") >= 4096, F.lit(None).cast("double")
            ).otherwise(
                F.round(-4096.0 * F.log(1 - F.col("filled") / 4096.0), 2)
            ).alias("est_distinct"),
            "exact_distinct",
        )
        .orderBy("event_type")
    )


@query(
    "q_percentile_tiles",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.5), 4)  AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY 1, 2
    ORDER BY bucket, event_type
    """,
    doc="Percentile TILES — the reference's actual dashboard shape for its "
    "5-39 s baseline rows (per-time-bucket latency percentiles over a "
    "window, docs/2026-08-02 report): time_bucket × event_type grid, p50/"
    "p95 per tile. One shuffle on the (bucket, type) grid key; the ts "
    "range predicate prunes row groups at the scan (PushedFilters).",
)
def q_percentile_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(
        (F.col("ts") >= "2024-01-08") & (F.col("ts") < "2024-01-15")
    )
    return (
        ev.groupBy(time_bucket("1 hour", F.col("ts")).alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        )
        .orderBy("bucket", "event_type")
    )


@query(
    "q_trace_critical_path",
    oracle="""
    WITH RECURSIVE spans AS (
      SELECT event_id AS id, event_id // 8 AS trace_id,
             CASE WHEN event_id % 8 = 0 THEN NULL
                  ELSE (event_id // 8) * 8 + (event_id % 8 - 1) // 2 END AS parent_id,
             CAST(value AS DECIMAL(18,4)) AS w
      FROM events
    ), paths(id, trace_id, acc, depth) AS (
      SELECT id, trace_id, w, 1 FROM spans WHERE parent_id IS NULL
      UNION ALL
      SELECT c.id, c.trace_id, p.acc + c.w, p.depth + 1
      FROM spans c JOIN paths p ON c.parent_id = p.id
    ), leaves AS (
      SELECT p.* FROM paths p
      WHERE p.id NOT IN (SELECT parent_id FROM spans WHERE parent_id IS NOT NULL)
    ), crit AS (
      SELECT trace_id, MAX(acc) AS critical, MAX(depth) AS depth
      FROM leaves GROUP BY 1
    )
    SELECT trace_id % 10 AS bucket, COUNT(*) AS n_traces,
           ROUND(CAST(SUM(critical) AS DOUBLE), 2) AS total_critical,
           CAST(MAX(depth) AS BIGINT) AS max_depth
    FROM crit GROUP BY 1 ORDER BY bucket
    """,
    doc="Trace critical-path analytics over parent-pointer span trees "
    "(the otel parent_id hierarchy, schemas/otel_logs_and_spans.yaml): "
    "per trace, the maximum root-to-leaf duration path and tree depth, "
    "computed by POINTER DOUBLING (operators/hierarchy.py::path_to_root) "
    "— O(log depth) shuffled self-joins, not O(depth) sequential ones. "
    "Spans are synthesized deterministically from events as 8-node binary "
    "trees; decimal weights keep path sums associativity-exact so the "
    "doubling order matches the oracle's sequential recursion bit-for-bit.",
)
def q_trace_critical_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.operators.hierarchy import path_to_root

    ev = t(spark, sf_dir, "events")
    spans = ev.select(
        F.col("event_id").alias("id"),
        F.expr("event_id DIV 8").alias("trace_id"),
        F.when(F.col("event_id") % 8 == 0, F.lit(None).cast("long"))
        .otherwise(
            F.expr("(event_id DIV 8) * 8 + (event_id % 8 - 1) DIV 2")
        )
        .alias("parent_id"),
        F.col("value").cast("decimal(18,4)").alias("w"),
    )
    paths = path_to_root(spans, "id", "parent_id", "w", max_depth=8)
    parents = (
        spans.where(F.col("parent_id").isNotNull())
        .select(F.col("parent_id").alias("_pid"))
        .distinct()
    )
    leaves = (
        paths.where(F.col("_reached_root"))
        .join(parents, paths["id"] == parents["_pid"], "left_anti")
        .withColumn("trace_id", F.expr("id DIV 8"))
    )
    crit = leaves.groupBy("trace_id").agg(
        F.max("path_sum").alias("critical"), F.max("depth").alias("depth")
    )
    return (
        crit.groupBy((F.col("trace_id") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_traces"),
            F.round(F.sum("critical").cast("double"), 2).alias("total_critical"),
            F.max("depth").alias("max_depth"),
        )
        .orderBy("bucket")
    )


@query(
    "q_trace_path_recursive_sql",
    # Same oracle as q_trace_critical_path ON PURPOSE: this is the SQL-
    # surface twin — Spark's WITH RECURSIVE (4.x) through the PG shim
    # must compute exactly what the pointer-doubling operator computes
    # and what DuckDB's recursive CTE computes.
    oracle=None,  # bound below from q_trace_critical_path
    doc="Trace critical path via WITH RECURSIVE over the SQL surface — "
    "the recursive-CTE formulation a DataFusion user would write "
    "(DataFusion supports recursive CTEs), executed by Spark's native "
    "recursive CTE through pg_sql. O(depth) sequential self-join rounds "
    "(each round one shuffle) vs the pointer-doubling operator's "
    "O(log depth) — registered to certify the SQL surface accepts and "
    "correctly evaluates recursion, with the operator form remaining "
    "the scale path. Decimal path sums keep both engines' recursion "
    "associativity-exact.",
)
def q_trace_path_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.pgshim import pg_sql

    t(spark, sf_dir, "events").createOrReplaceTempView("events")
    return pg_sql(
        spark,
        """
        WITH RECURSIVE spans AS (
          SELECT event_id AS id, event_id DIV 8 AS trace_id,
                 CASE WHEN event_id % 8 = 0 THEN CAST(NULL AS BIGINT)
                      ELSE (event_id DIV 8) * 8 + (event_id % 8 - 1) DIV 2 END AS parent_id,
                 CAST(value AS DECIMAL(18,4)) AS w
          FROM events
        ), paths(id, trace_id, acc, depth) AS (
          -- the accumulator type must be IDENTICAL across iterations
          -- (Spark's recursive CTE refuses to widen DECIMAL(18,4) into
          -- the addition's DECIMAL(19,4)); pin a wide fixed type in both
          SELECT id, trace_id, CAST(w AS DECIMAL(38,4)), 1
          FROM spans WHERE parent_id IS NULL
          UNION ALL
          SELECT c.id, c.trace_id, CAST(p.acc + c.w AS DECIMAL(38,4)), p.depth + 1
          FROM spans c JOIN paths p ON c.parent_id = p.id
        ), leaves AS (
          SELECT p.* FROM paths p
          WHERE p.id NOT IN (SELECT parent_id FROM spans WHERE parent_id IS NOT NULL)
        ), crit AS (
          SELECT trace_id, MAX(acc) AS critical, MAX(depth) AS depth
          FROM leaves GROUP BY trace_id
        )
        SELECT trace_id % 10 AS bucket, COUNT(*) AS n_traces,
               ROUND(CAST(SUM(critical) AS DOUBLE), 2) AS total_critical,
               CAST(MAX(depth) AS BIGINT) AS max_depth
        FROM crit GROUP BY trace_id % 10 ORDER BY bucket
        """,
    )


from timefusion_spark.registry import REGISTRY as _TREG  # noqa: E402

_TREG["q_trace_path_recursive_sql"].oracle = _TREG["q_trace_critical_path"].oracle


@query(
    "q_funnel_analysis",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
    ), t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.t GROUP BY 1
    ), t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.t GROUP BY 1
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
           (SELECT COUNT(*) FROM t1) AS n_viewed,
           (SELECT COUNT(*) FROM t2) AS n_clicked,
           (SELECT COUNT(*) FROM t3) AS n_purchased
    """,
    doc="Ordered-funnel analysis (view -> click -> purchase strictly in "
    "time order) via greedy min-chasing: earliest view, then earliest "
    "later click, then earliest later purchase — provably the same "
    "stage assignment as the sequential automaton (greedy-earliest "
    "dominates: any feasible chain implies the greedy one is feasible), "
    "but built ONLY from partial-aggregatable per-user MIN passes and "
    "user-keyed joins. An earlier revision collected every event per "
    "user into one sorted array and folded it — O(events-per-user) in a "
    "single row, which a 100 TB bot user turns into an unspillable "
    "hot-spot; min aggregations map-side combine and AQE can skew-split "
    "the joins, so no per-user state ever materializes.",
)
def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    t1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t1"))
    )
    t2 = (
        ev.where(F.col("event_type") == "click")
        .join(t1, "user_id")
        .where(F.col("ts") > F.col("_t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .where(F.col("ts") > F.col("_t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_t3"))
    )
    counts = ev.agg(F.countDistinct("user_id").alias("n_users"))
    # ONE aggregation computes all three stage counts: t2/t3 carry at most
    # one row per user (per-user MIN aggregates), so left-joining them
    # onto t1 keeps exactly |t1| rows and count(_t2)/count(_t3) equal
    # |t2|/|t3|. The previous three broadcast crossJoins each built a
    # separate 1-row broadcast — three extra jobs re-running the shared
    # t1/t2 subtrees (optimization r13, guide §1.2/§2.4; AQE's stage
    # cache now reuses the t1 and t2 exchanges inside one action).
    stages = (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_viewed"),
            F.count("_t2").alias("n_clicked"),
            F.count("_t3").alias("n_purchased"),
        )
    )
    return counts.crossJoin(F.broadcast(stages))


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH b AS (
      SELECT timezone('UTC', to_timestamp(floor(epoch(ts) / 300) * 300)) AS bucket,
             event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT bucket, event_type, n,
             COUNT(*)  OVER trail AS k,
             SUM(n)    OVER trail AS s1,
             SUM(n*n)  OVER trail AS s2
      FROM b
      WINDOW trail AS (PARTITION BY event_type ORDER BY bucket
                       ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket, n,
           ROUND((n - CAST(s1 AS DOUBLE) / k)
                 / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1)), 4) AS z
    FROM w
    WHERE k >= 6 AND (s2 - CAST(s1 AS DOUBLE) * s1 / k) > 0
      AND abs((n - CAST(s1 AS DOUBLE) / k)
              / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1))) > 2.5
    ORDER BY event_type, bucket
    """,
    doc="Trailing-window z-score anomaly detection on per-bucket event "
    "counts (the monitoring alert primitive): mean/variance come from "
    "INTEGER window sums (COUNT/SUM(n)/SUM(n²) over the trailing 12 "
    "buckets) so the statistics are exact and engine-identical — no "
    "Welford-vs-naive stddev drift; z is one closed-form double "
    "expression evaluated identically on both sides. One window shuffle "
    "on event_type.",
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    b = ev.groupBy(
        time_bucket("5 minutes", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    trail = (
        W.partitionBy("event_type").orderBy("bucket").rowsBetween(-12, -1)
    )
    w = b.select(
        "bucket",
        "event_type",
        "n",
        F.count(F.lit(1)).over(trail).alias("k"),
        F.sum("n").over(trail).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(trail).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("k")
    var_num = F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("k")
    z = (F.col("n") - mu) / F.sqrt(var_num / (F.col("k") - 1))
    return (
        w.where((F.col("k") >= 6) & (var_num > 0) & (F.abs(z) > 2.5))
        .select("event_type", "bucket", "n", F.round(z, 4).alias("z"))
        .orderBy("event_type", "bucket")
    )


@query(
    "q_regression_stats",
    oracle="""
    SELECT event_type,
           ROUND(REGR_SLOPE(value, x), 4)     AS slope,
           ROUND(REGR_INTERCEPT(value, x), 4) AS intercept,
           ROUND(CORR(value, x), 4)           AS r,
           CAST(REGR_COUNT(value, x) AS BIGINT) AS n
    FROM (
        SELECT event_type, value,
               CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x
        FROM events
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="PG bivariate regression aggregates (regr_slope / regr_intercept "
    "/ corr / regr_count — the PG §2.9 statistical-aggregate surface): "
    "value regressed on hour-of-day per event type. Spark's built-in "
    "regr_* aggregates are partial/final merged (map-side combine); "
    "display rounding at 1e-4 absorbs the merge-order float drift "
    "between engines.",
)
def q_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.hour("ts").cast("double").alias("x"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.regr_slope("value", "x"), 4).alias("slope"),
            F.round(F.regr_intercept("value", "x"), 4).alias("intercept"),
            F.round(F.corr("value", "x"), 4).alias("r"),
            F.regr_count("value", "x").cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "q_gapfill_locf",
    oracle="""
    WITH actual AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS v
        FROM events
        GROUP BY 1, 2
    ), grid AS (
        SELECT t.event_type, g.bucket
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (
            SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                          TIMESTAMP '2024-01-30 23:00:00',
                                          INTERVAL 1 HOUR)) AS bucket
        ) g
    ), joined AS (
        SELECT g.event_type, g.bucket,
               COALESCE(a.n_events, 0) AS n_events, a.v
        FROM grid g LEFT JOIN actual a
          ON a.event_type = g.event_type AND a.bucket = g.bucket
    ), w AS (
        SELECT event_type, bucket, n_events, v,
               LAST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN epoch(bucket) END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_e,
               FIRST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
               FIRST_VALUE(CASE WHEN v IS NOT NULL THEN epoch(bucket) END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_e
        FROM joined
    )
    SELECT event_type, CAST(bucket AS TIMESTAMP) AS bucket, n_events,
           FLOOR(prev_v * 10000 + 0.5) / 10000 AS locf,
           FLOOR((CASE
               WHEN v IS NOT NULL THEN v
               WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                   prev_v + (next_v - prev_v) * (epoch(bucket) - prev_e)
                          / (next_e - prev_e)
               ELSE COALESCE(prev_v, next_v) END) * 10000 + 0.5) / 10000 AS interp,
           (v IS NULL) AS was_gap
    FROM w
    ORDER BY event_type, bucket
    """,
    doc="time_bucket_gapfill + locf + linear interpolate (the public "
    "TimescaleDB gapfill surface; beyond-reference timeseries): the full "
    "hourly grid per series is generated map-only (sequence + explode "
    "over literal bounds — no data pass to discover it), left-joined to "
    "the bucket aggregate, then LOCF and two-sided linear interpolation "
    "ride ignore-nulls window frames — one shuffle on the series key. "
    "Bucket means stay UNROUNDED until output (exact decimal sums + one "
    "correctly-rounded division): pre-rounding them to 4 decimals would "
    "put midpoint interpolations exactly on round-half boundaries, where "
    "engine ROUND implementations disagree.",
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    actual = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v"),
        )
    )
    hours = F.sequence(
        F.lit("2024-01-01 00:00:00").cast("timestamp"),
        F.lit("2024-01-30 23:00:00").cast("timestamp"),
        F.expr("INTERVAL 1 HOUR"),
    )
    grid = (
        ev.select("event_type").distinct()
        .select("event_type", F.explode(hours).alias("bucket"))
    )
    joined = grid.join(actual, ["event_type", "bucket"], "left_outer").select(
        "event_type",
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "v",
    )
    wp = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    e = F.unix_timestamp("bucket")
    marked = joined.select(
        "event_type",
        "bucket",
        "n_events",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(F.when(F.col("v").isNotNull(), e), ignorenulls=True)
        .over(wp)
        .alias("prev_e"),
        F.first("v", ignorenulls=True).over(wn).alias("next_v"),
        F.first(F.when(F.col("v").isNotNull(), e), ignorenulls=True)
        .over(wn)
        .alias("next_e"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (e.cast("double") - F.col("prev_e"))
            / (F.col("next_e") - F.col("prev_e")),
        )
        .otherwise(F.coalesce("prev_v", "next_v"))
    )
    # Explicit half-up rounding as floor(x*1e4 + 0.5)/1e4: every step is a
    # correctly-rounded double op, identical across engines — the built-in
    # ROUND()s disagree exactly at the half-step boundaries that midpoint
    # interpolation of 2-decimal inputs produces.
    def r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / 10000

    return marked.select(
        "event_type",
        "bucket",
        "n_events",
        r4(F.col("prev_v")).alias("locf"),
        r4(interp).alias("interp"),
        F.col("v").isNull().alias("was_gap"),
    ).orderBy("event_type", "bucket")
