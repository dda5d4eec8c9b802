"""Compressed timeseries lifecycle simulation — the
bench/timeseries_lifecycle.py analog: a frozen, advancing clock drives
simulated days of write + query + retention traffic in seconds of real
time, with every query checked against an in-process ground-truth ledger.

Phases exercised: batched ingest under the engine clock (stamps come from
clock.now_micros), dashboard-count batteries vs the ledger, re-delivered
txn idempotence mid-run, retention drop at the simulated boundary (one
metadata commit), and time travel back to the pre-retention snapshot."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timefusion_spark import clock
from timefusion_spark.storage import Table, load_schema_text, maintenance

from tests.test_commitlog import YAML


@pytest.fixture(autouse=True)
def _thaw():
    yield
    clock.clear()


DAYS = 3
BATCHES_PER_DAY = 4
ROWS = {0: 30, 1: 120, 2: 500, 3: 120}  # diurnal-ish shape per batch slot


def test_lifecycle_with_retention_and_ground_truth(spark, tmp_path):
    table = Table.create(spark, load_schema_text(YAML), str(tmp_path / "t"))
    clock.set_rfc3339("2026-06-01T00:00:00Z")

    ledger: dict[str, int] = {}  # date -> live rows
    rid = 0
    for day in range(DAYS):
        date = f"2026-06-{day + 1:02d}"
        for slot in range(BATCHES_PER_DAY):
            n = ROWS[slot]
            rows = [
                (f"{date} {6 * slot:02d}:{i % 60:02d}:00", f"r{rid + i}", float(i), "p1")
                for i in range(n)
            ]
            batch = spark.createDataFrame(
                rows, "timestamp string, id string, value double, project_id string"
            )
            table.append(batch, txn=("sim", day * BATCHES_PER_DAY + slot))
            rid += n
            ledger[date] = ledger.get(date, 0) + n
            clock.advance_micros(6 * 3600 * 1_000_000)

        # Query battery vs the ledger after each simulated day.
        got = {
            str(r["date"]): r["n"]
            for r in table.read().groupBy("date").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == ledger

    # Re-delivered batch (same txn version) must be a no-op.
    total_before = table.read().count()
    dup = spark.createDataFrame(
        [("2026-06-01 00:00:00", "rdup", 1.0, "p1")],
        "timestamp string, id string, value double, project_id string",
    )
    table.append(dup, txn=("sim", 0))
    assert table.read().count() == total_before

    # Retention boundary: keep only the last 2 simulated days.
    v_pre = table.log.latest_version()
    dropped = maintenance.drop_partitions_before(table, "2026-06-02")
    assert dropped >= 1
    got = {
        str(r["date"]): r["n"]
        for r in table.read().groupBy("date").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {d: n for d, n in ledger.items() if d >= "2026-06-02"}

    # Time travel still sees the pre-retention state; vacuum then collects.
    pre = table.read(version=v_pre).groupBy("date").agg(F.count(F.lit(1)).alias("n"))
    assert {str(r["date"]): r["n"] for r in pre.collect()} == ledger
    assert maintenance.vacuum(table)
    got_after = {
        str(r["date"]): r["n"]
        for r in table.read().groupBy("date").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_after == {d: n for d, n in ledger.items() if d >= "2026-06-02"}

    # Engine-owned stamps advanced with the frozen clock: after day-1's
    # retention drop the earliest surviving stamp is day 2's first batch
    # (T0 + 24 simulated hours), and later batches are strictly later.
    stamps = sorted(
        r[0] for r in table.read_raw().select("updated_at").distinct().collect()
    )
    assert stamps[0] == dt.datetime(2026, 6, 2, 0, 0, 0)
    assert stamps[-1] > stamps[0]
