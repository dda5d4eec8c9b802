"""JSON / Variant surface queries (SURVEY §2.9 depth items).

Covers: json_build_array, json_length, json_contains, jsonb_path_exists,
jsonb_array_elements (explode), the Spark-4 Variant family
(parse_json / variant_get / to_json — the reference's Parquet-Variant
columns, functions.rs:395-450), the structural `->` json_get, and the
CREATE FUNCTION SQL surface (functions/register.py) exercised through
spark.sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timefusion_spark.functions import json_fns as J
from timefusion_spark.queries._tables import t
from timefusion_spark.registry import query


@query(
    "q_json_build_array",
    oracle="""
    SELECT o_orderkey,
           json_array(o_orderkey, o_orderstatus, o_orderpriority)::VARCHAR AS arr,
           len(json_keys(json_object('key', o_orderkey, 'status', o_orderstatus))) AS n_keys
    FROM orders
    WHERE o_orderkey <= 100
    ORDER BY o_orderkey
    """,
    doc="json_build_array / json_length over objects (functions.rs:829-869; "
    "json_length via datafusion-functions-json parity).",
)
def q_json_build_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 100)
    obj = F.to_json(F.struct(F.col("o_orderkey").alias("key"), F.col("o_orderstatus").alias("status")))
    return o.select(
        "o_orderkey",
        J.json_build_array(
            F.col("o_orderkey"), F.col("o_orderstatus"), F.col("o_orderpriority")
        ).alias("arr"),
        J.json_length(obj).alias("n_keys"),
    ).orderBy("o_orderkey")


@query(
    "q_json_contains_path",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE json_extract(props, '$.k') IS NOT NULL) AS BIGINT) AS has_k,
           CAST(COUNT(*) FILTER (WHERE json_extract(props, '$.missing') IS NOT NULL) AS BIGINT) AS has_missing
    FROM events
    """,
    doc="json_contains + jsonb_path_exists simple-path fast path "
    "(functions.rs:1273-1502: simple paths short-circuit to variant_get).",
)
def q_json_contains_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(J.jsonb_path_exists(F.col("props"), "$.k"), 1)).alias("has_k"),
        F.count(F.when(J.jsonb_path_exists(F.col("props"), "$.missing"), 1)).alias(
            "has_missing"
        ),
    )


@query(
    "q_jsonb_array_elements",
    oracle="""
    SELECT elem, COUNT(*) AS n
    FROM (
        SELECT '"' || o_orderstatus || '"' AS elem FROM orders WHERE o_orderkey <= 500
        UNION ALL
        SELECT '"' || o_orderpriority || '"' FROM orders WHERE o_orderkey <= 500
    ) x
    GROUP BY elem
    ORDER BY elem
    """,
    doc="jsonb_array_elements -> explode(array<variant>) (the reference "
    "stubs this, functions.rs:823-827; Spark generators do it natively). "
    "Elements render as JSON text (strings quoted).",
)
def q_jsonb_array_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    arr = J.json_build_array(F.col("o_orderstatus"), F.col("o_orderpriority"))
    return (
        o.select(F.explode(J.json_array_elements(arr)).alias("v"))
        .select(F.to_json("v").alias("elem"))
        .groupBy("elem")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("elem")
    )


@query(
    "q_variant_family",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::BIGINT AS k_typed,
           '{"k":' || json_extract(props, '$.k') || '}' AS canonical,
           json_extract(props, '$.k') IS NOT NULL AS k_exists
    FROM events
    WHERE event_id <= 200
    ORDER BY event_id
    """,
    doc="Variant family (functions.rs:395-450): parse_json -> typed "
    "variant_get + canonical to_json round-trip; PG ->/->> rewrites ride "
    "the same variant_get path (functions.rs:94-254).",
)
def q_variant_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("event_id") <= 200)
    staged = ev.select("event_id", F.parse_json("props").alias("v"))
    return staged.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_typed"),
        F.to_json("v").alias("canonical"),
        F.variant_get("v", "$.k", "variant").isNotNull().alias("k_exists"),
    ).orderBy("event_id")


@query(
    "q_json_get_structural",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::VARCHAR AS k_json,
           json_extract_string(props, '$.k') AS k_text
    FROM events
    WHERE event_id <= 200
    ORDER BY event_id
    """,
    doc="Structural -> vs ->> split: json_get keeps JSON rendering "
    "(numbers bare, strings would stay quoted), json_get_text unquotes "
    "(json_to_pg_text semantics, functions.rs:256-303).",
)
def q_json_get_structural(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("event_id") <= 200)
    return ev.select(
        "event_id",
        J.json_get(F.col("props"), "k").alias("k_json"),
        J.json_get_text(F.col("props"), "k").alias("k_text"),
    ).orderBy("event_id")


@query(
    "q_pg_to_json",
    oracle="""
    SELECT event_id,
           json_extract(props, '$')::VARCHAR AS props_json,
           '"' || event_type || '"' AS type_json,
           CAST(user_id AS VARCHAR) AS uid_json
    FROM events
    WHERE event_id <= 200
    ORDER BY event_id
    """,
    doc="PG to_json/to_jsonb sniff rules (functions.rs:871-937, 987-1040): "
    "a string holding top-level JSON surfaces as real JSON; a plain string "
    "is quoted; numbers render literally.",
)
def q_pg_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").where(F.col("event_id") <= 200)
    return ev.select(
        "event_id",
        J.pg_to_json(F.col("props")).alias("props_json"),
        J.pg_to_json(F.col("event_type")).alias("type_json"),
        J._quote_json_string(F.col("user_id")).alias("uid_json"),
    ).orderBy("event_id")


@query(
    "q_sql_function_surface",
    oracle="""
    SELECT event_id,
           ROUND(epoch(ts), 6) AS epoch_secs,
           timezone('UTC', to_timestamp(floor(epoch(ts) / 300) * 300)) AS bucket,
           timezone('America/New_York', timezone('UTC', ts)) AS ny_time
    FROM events
    WHERE event_id <= 50
    ORDER BY event_id
    """,
    doc="CREATE FUNCTION SQL surface (functions/register.py): the PG-parity "
    "functions invoked through spark.sql, staying JVM-side (SQL scalar "
    "functions inline into the plan).",
)
def q_sql_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.functions.register import register_all

    register_all(spark)
    t(spark, sf_dir, "events").createOrReplaceTempView("_tf_events_sql")
    return spark.sql(
        """
        SELECT event_id,
               ROUND(extract_epoch(ts), 6) AS epoch_secs,
               time_bucket_secs(300, ts) AS bucket,
               at_time_zone(ts, 'America/New_York') AS ny_time
        FROM _tf_events_sql
        WHERE event_id <= 50
        ORDER BY event_id
        """
    )


@query(
    "q_jsonpath_filters",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(CASE WHEN k % 7 = 2 OR k % 3 = 2 THEN 1 END) AS BIGINT) AS n_tag2,
           CAST(COUNT(CASE WHEN k > 50 THEN 1 END) AS BIGINT) AS n_big_k,
           CAST(COUNT(CASE WHEN event_type ILIKE 'cl%' THEN 1 END) AS BIGINT) AS n_like,
           CAST(COUNT(CASE WHEN event_type LIKE 'p%' THEN 1 END) AS BIGINT) AS n_api
    FROM e
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="PG SQL/JSON-path lax dialect (functions.rs:1273-1502; "
    "tests/suite/test_postgres_json_functions.rs:118-160): [*] wildcards, "
    "?(@ ...) comparison filters, like_regex with flag, starts with — "
    "compiled to higher-order variant expressions (functions/json_fns.py "
    "jsonpath_exists_sql, no UDF). Each event synthesizes a nested JSON "
    "payload from its columns; the oracle evaluates the equivalent "
    "closed-form predicates on the raw columns, so every jsonpath feature "
    "is checked against first-principles SQL.",
)
def q_jsonpath_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.functions.json_fns import jsonpath_exists_sql

    ev = t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("bigint")
    )
    payload = F.to_json(
        F.struct(
            F.col("k"),
            F.array(
                F.concat(F.lit("t"), (F.col("k") % 7).cast("string")),
                F.concat(F.lit("t"), (F.col("k") % 3).cast("string")),
            ).alias("tags"),
            F.col("event_type").alias("msg"),
            F.concat(F.lit("/api/"), F.col("event_type")).alias("path"),
        )
    )
    # Parse ONCE into a staged Variant attribute; every path predicate
    # traverses the same parsed value (variant_input) instead of
    # re-parsing the JSON string per aggregate.
    staged = ev.select("event_type", payload.alias("payload")).select(
        "event_type", F.expr("try_parse_json(payload)").alias("pv")
    )

    def hit(path: str):
        return F.count(
            F.when(F.expr(jsonpath_exists_sql("pv", path, variant_input=True)), 1)
        )

    return (
        staged.groupBy("event_type")
        .agg(
            hit('$.tags[*] ? (@ == "t2")').alias("n_tag2"),
            hit("$.k ? (@ > 50)").alias("n_big_k"),
            hit('$.msg ? (@ like_regex "^CL.*" flag "i")').alias("n_like"),
            hit('$.path ? (@ starts with "/api/p")').alias("n_api"),
        )
        .orderBy("event_type")
    )
