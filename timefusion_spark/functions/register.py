"""SQL-surface registration for the function layer.

Spark 4 supports SQL scalar functions (CREATE FUNCTION ... RETURN expr),
which lets the PG-parity functions stay JVM-side even when invoked from
`spark.sql`. Functions whose arguments must be parsed driver-side
(time_bucket's interval grammar, to_char's format string) are registered
for the common literal shapes; the DataFrame API (timefusion_spark.functions)
is the primary surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_SQL_FUNCTIONS: dict[str, str] = {
    # epoch seconds as double, µs preserved (functions.rs:939-967)
    "extract_epoch": """
        CREATE OR REPLACE TEMPORARY FUNCTION extract_epoch(ts TIMESTAMP)
        RETURNS DOUBLE RETURN unix_micros(ts) / 1000000.0
    """,
    # PG AT TIME ZONE for UTC-stored timestamps (functions.rs:777-818)
    "at_time_zone": """
        CREATE OR REPLACE TEMPORARY FUNCTION at_time_zone(ts TIMESTAMP, tz STRING)
        RETURNS TIMESTAMP RETURN from_utc_timestamp(ts, tz)
    """,
    # TimescaleDB-style epoch-aligned bucketing (functions.rs:1043-1093);
    # SQL form takes the bucket width in seconds ('5 minutes' parsing lives
    # in the Python/pgshim layer where the literal is visible).
    "time_bucket_secs": """
        CREATE OR REPLACE TEMPORARY FUNCTION time_bucket_secs(secs BIGINT, ts TIMESTAMP)
        RETURNS TIMESTAMP
        RETURN timestamp_micros(unix_micros(ts) - pmod(unix_micros(ts), secs * 1000000))
    """,
    # PG ->> scalar text extraction over a JSON string column. The key is
    # bracket-quoted ($['k']) so PG's literal-key semantics hold for keys
    # containing dots/brackets/spaces — concat('$.', k) resolved 'a.b' as
    # a NESTED path and returned NULL (review r13). Keys containing a
    # single quote remain unaddressable through this SQL fallback (NULL);
    # the pgshim layer's per-key quote-form selection handles those.
    "json_get_text": """
        CREATE OR REPLACE TEMPORARY FUNCTION json_get_text(j STRING, k STRING)
        RETURNS STRING RETURN get_json_object(j, concat('$[\\'', k, '\\']'))
    """,
    # text_match correctness path in SQL (tantivy_index/udf.rs:1-60:
    # case-insensitive AND of query tokens as substrings; empty query →
    # true, NULL column → false) — same semantics as the Python Column
    # helper (functions/text.py), all JVM higher-order expressions. The
    # pgshim's trigram-sidecar interception accelerates the simple
    # one-table shapes; THIS definition is what any other placement of the
    # predicate (joins, extra conjuncts, projections) resolves to.
    # (?U): Java \\s is ASCII-only by default, but the Python helper this
    # mirrors tokenizes with str.split() (Unicode whitespace) — without
    # the flag 'foo\\u00a0bar' stayed one fused token here while the
    # DataFrame surface split it, same predicate different answer
    # (review r13)
    "text_match": """
        CREATE OR REPLACE TEMPORARY FUNCTION text_match(col STRING, q STRING)
        RETURNS BOOLEAN RETURN coalesce(
          forall(filter(split(lower(q), '(?U)\\\\s+'), t -> t <> ''),
                 t -> contains(lower(col), t)),
          false)
    """,
}


def register_all(spark: SparkSession) -> list[str]:
    """Register SQL-invocable functions; returns the registered names."""
    registered = []
    for name, ddl in _SQL_FUNCTIONS.items():
        spark.sql(ddl)
        registered.append(name)
    return registered
