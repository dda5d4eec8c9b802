"""PG to_char parity — the reference's Postgres-16-captured cases
(/root/reference/src/functions.rs:1554-1600) plus its documented
divergences (functions.rs:650-663)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timefusion_spark.functions.pg_format import to_char

# (fmt, expected) for TIMESTAMP '2026-06-10 08:10:52.422355' — expected
# outputs captured from real Postgres 16 per the reference's parity test.
CASES = [
    ("YYYY-MM-DD", "2026-06-10"),
    ("YYYY-MM-DD HH24:MI:SS", "2026-06-10 08:10:52"),
    ('YYYY-MM-DD"T"HH24:MI:SS.US"Z"', "2026-06-10T08:10:52.422355Z"),
    ('YYYY-MM-DD"T"HH24:MI:SS.MS"Z"', "2026-06-10T08:10:52.422Z"),
    ("DD/MM/YYYY", "10/06/2026"),
    ("Mon DD, YYYY", "Jun 10, 2026"),
    ("Day, Mon DD YYYY", "Wednesday, Jun 10 2026"),
    ("HH12:MI", "08:10"),
    ("YY", "26"),
    ('"YYYY=" YYYY', "YYYY= 2026"),
    ('"· "YYYY', "· 2026"),
    ("HH12:MI AM", "08:10 AM"),
    ("HH:MI:SS", "08:10:52"),  # bare HH aliases HH12
    ("HH12:MI am", "08:10 am"),
    ("Dy", "Wed"),
    ("D", "4"),  # 2026-06-10 is Wednesday: PG D=4 (Sun=1)
    ("DY", "WED"),
    ("DY-D", "WED-4"),  # parse order: DY beats bare D
]

TS = "2026-06-10 08:10:52.422355"


@pytest.fixture(scope="module")
def ts_df(spark):
    return spark.createDataFrame([(TS,)], "s string").select(
        F.to_timestamp("s").alias("ts")
    )


@pytest.mark.parametrize("fmt,expected", CASES, ids=[c[0] for c in CASES])
def test_to_char_postgres_parity(ts_df, fmt, expected):
    got = ts_df.select(to_char(F.col("ts"), fmt).alias("s")).collect()[0]["s"]
    assert got == expected, f"format {fmt!r}"


def test_to_char_pm(spark):
    df = spark.createDataFrame([("2026-06-10 20:10:52",)], "s string").select(
        F.to_timestamp("s").alias("ts")
    )
    got = df.select(to_char(F.col("ts"), "HH12:MI PM").alias("s")).collect()[0]["s"]
    assert got == "08:10 PM"


def test_to_char_null_is_null(spark):
    df = spark.createDataFrame([(None,)], "s string").select(
        F.to_timestamp("s").alias("ts")
    )
    assert df.select(to_char(F.col("ts"), "YYYY").alias("s")).collect()[0]["s"] is None


def test_to_char_unterminated_literal(ts_df):
    # Divergence: unterminated "..." accepted, remainder copied verbatim.
    got = ts_df.select(to_char(F.col("ts"), 'YYYY "tail').alias("s")).collect()[0]["s"]
    assert got == "2026 tail"


def test_to_char_escaped_quote(ts_df):
    got = ts_df.select(to_char(F.col("ts"), '"a""b"DD').alias("s")).collect()[0]["s"]
    assert got == 'a"b10'


def test_to_char_null_ts_empty_format_is_null(spark):
    """Review r11: to_char(NULL, '') must be NULL — the zero-segment
    early return bypassed the NULL guard and answered ''."""
    from timefusion_spark.functions.pg_format import to_char

    [r] = (
        spark.range(1)
        .select(to_char(F.lit(None).cast("timestamp"), "").alias("x"))
        .collect()
    )
    assert r["x"] is None
