"""Frozen-clock facility (clock.rs + functions.rs:505-535 analogs):
deterministic engine-owned version stamps for unstamped appends/DML."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timefusion_spark import clock
from timefusion_spark.storage import Table, dml, load_schema_text

from tests.test_commitlog import BASE, YAML, _rows


@pytest.fixture()
def table(spark, tmp_path):
    return Table.create(spark, load_schema_text(YAML), str(tmp_path / "t"))


@pytest.fixture(autouse=True)
def _thaw():
    yield
    clock.clear()


def test_set_advance_now():
    us = clock.set_rfc3339("2026-05-01T00:00:00Z")
    assert clock.now_micros() == us
    assert clock.advance_micros(2_500_000) == us + 2_500_000
    clock.clear()
    assert not clock.is_frozen()
    assert abs(clock.now_micros() / 1e6 - dt.datetime.now(dt.timezone.utc).timestamp()) < 60


def test_advance_requires_frozen():
    with pytest.raises(RuntimeError, match="not frozen"):
        clock.advance_micros(1)


def test_frozen_clock_stamps_appends_and_dml(spark, table):
    """Unstamped append and DML take their engine-owned tiebreak from the
    frozen clock — byte-reproducible across reruns; advancing the clock
    makes the DML version win the keep-greatest window deterministically."""
    t0 = clock.set_rfc3339("2026-05-01T00:00:00Z")
    table.append(_rows(spark, BASE))  # no stamp argument
    stamps = {r[0] for r in table.read_raw().select("updated_at").distinct().collect()}
    assert stamps == {dt.datetime(2026, 5, 1, 0, 0, 0)}

    clock.advance_micros(60 * 1_000_000)
    n = dml.update(table, {"value": F.col("value") + 1.0}, predicate="id = 'a'")
    assert n == 1
    vals = {r["id"]: (r["value"], r["updated_at"]) for r in table.read().collect()}
    assert vals["a"] == (2.0, dt.datetime(2026, 5, 1, 0, 1, 0))
    assert vals["b"][1] == dt.datetime(2026, 5, 1, 0, 0, 0)
    assert clock.now_micros() == t0 + 60 * 1_000_000


def test_time_bucket_integer_arithmetic_edges(spark):
    """Review r11: double-precision floor(m/size) loses integer precision
    past 2^53 µs — year-9999 sentinels bucketed UP across the boundary;
    and a zero-width interval must fail fast, not NULL the column."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from timefusion_spark.functions.time import parse_interval_to_micros, time_bucket

    [r] = (
        spark.range(1)
        .select(
            time_bucket(
                "1s", F.lit("9999-12-31 23:59:59.999999").cast("timestamp")
            ).alias("x")
        )
        .collect()
    )
    assert str(r["x"]) == "9999-12-31 23:59:59"
    with _pytest.raises(ValueError, match="zero-width"):
        parse_interval_to_micros("0 minutes")
