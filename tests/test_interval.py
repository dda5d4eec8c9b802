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
