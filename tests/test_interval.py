"""time_bucket interval grammar — the reference's unit-alias table
(/root/reference/src/functions.rs:1691-1725)."""

from __future__ import annotations

import pytest

from timefusion_spark.functions.time import parse_interval_to_micros

CASES = [
    ("1 second", 1_000_000),
    ("5 seconds", 5_000_000),
    ("1 minute", 60_000_000),
    ("5 minutes", 300_000_000),
    ("1 hour", 3_600_000_000),
    ("2 hours", 7_200_000_000),
    ("1 day", 86_400_000_000),
    ("1 week", 604_800_000_000),
    ("5 min", 300_000_000),
    ("5 mins", 300_000_000),
    ("5 m", 300_000_000),
    ("1second", 1_000_000),
    ("5seconds", 5_000_000),
    ("1minute", 60_000_000),
    ("5minutes", 300_000_000),
    ("30m", 1_800_000_000),
    ("1h", 3_600_000_000),
    ("2h", 7_200_000_000),
    ("1d", 86_400_000_000),
    ("1w", 604_800_000_000),
    ("5min", 300_000_000),
    ("5mins", 300_000_000),
    ("5s", 5_000_000),
]


@pytest.mark.parametrize("text,micros", CASES, ids=[c[0] for c in CASES])
def test_interval_grammar(text, micros):
    assert parse_interval_to_micros(text) == micros


@pytest.mark.parametrize("bad", ["invalid", "5", "abc minutes", "m5"])
def test_interval_errors(bad):
    with pytest.raises(ValueError):
        parse_interval_to_micros(bad)


def test_left_join_keeps_unmatched_points(spark):
    """Review r11: the exact range predicate lives in the join condition
    — a post-join filter NULL-dropped every null-extended row, silently
    degrading `left` to inner."""
    from timefusion_spark.operators.interval_join import interval_join

    points = spark.createDataFrame(
        [("p1", "2026-01-01 10:30:00"), ("p2", "2026-01-05 00:00:00")],
        "pid string, ts string",
    ).selectExpr("pid", "cast(ts as timestamp) ts")
    ivals = spark.createDataFrame(
        [("i1", "2026-01-01 10:00:00", "2026-01-01 11:00:00")],
        "iid string, start_ts string, end_ts string",
    ).selectExpr(
        "iid", "cast(start_ts as timestamp) start_ts",
        "cast(end_ts as timestamp) end_ts",
    )
    rows = {r.pid: r.iid for r in interval_join(points, ivals, how="left").collect()}
    assert rows == {"p1": "i1", "p2": None}  # p2 kept, null-extended


def test_right_and_full_joins_rejected(spark):
    import pytest as _pytest

    from timefusion_spark.operators.interval_join import interval_join

    points = spark.createDataFrame(
        [("p1", "2026-01-01 10:30:00")], "pid string, ts string"
    ).selectExpr("pid", "cast(ts as timestamp) ts")
    ivals = spark.createDataFrame(
        [("i1", "2026-01-01 10:00:00", "2026-01-01 11:00:00")],
        "iid string, start_ts string, end_ts string",
    ).selectExpr(
        "iid", "cast(start_ts as timestamp) start_ts",
        "cast(end_ts as timestamp) end_ts",
    )
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError, match="unsupported how"):
            interval_join(points, ivals, how=how)
