"""DML coalescer: grouping, window widening, duplicate-key round splits,
quarantine parking and redrive (/root/reference/src/dml_coalescer.rs:1-36,
main.rs:155-174)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from timefusion_spark.storage import Table, coalescer, dml, load_schema_text, maintenance

PLAIN_YAML = """
table_name: pt
partitions: [project_id, date]
time_column: timestamp
fields:
  - {name: date, data_type: Date32, nullable: false}
  - {name: timestamp, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: false}
  - {name: id, data_type: Utf8, nullable: false}
  - {name: value, data_type: Float64, nullable: true}
  - {name: project_id, data_type: Utf8, nullable: true}
"""

ROWS = [
    ("2026-01-01 10:00:00", "a", 1.0, "p1"),
    ("2026-01-01 11:00:00", "b", 2.0, "p1"),
    ("2026-01-02 09:00:00", "c", 3.0, "p2"),
    ("2026-01-03 09:30:00", "d", 4.0, "p2"),
]


@pytest.fixture()
def table(spark, tmp_path):
    tbl = Table.create(spark, load_schema_text(PLAIN_YAML), str(tmp_path / "pt"))
    tbl.append(
        spark.createDataFrame(
            ROWS, "timestamp string, id string, value double, project_id string"
        )
    )
    return tbl


def _src(spark, rows):
    return spark.createDataFrame(rows, "id string, adj double")


class TestCoalescing:
    def test_compatible_statements_share_a_group(self, spark, table):
        c = coalescer.DmlCoalescer()
        add = {"value": "_tgt.value + _src.adj"}
        c.enqueue(table, _src(spark, [("a", 10.0)]), ["id"], add)
        c.enqueue(table, _src(spark, [("b", 20.0)]), ["id"], add)
        # different assignments → separate group
        c.enqueue(table, _src(spark, [("c", 100.0)]), ["id"], {"value": "_src.adj"})
        assert c.pending() == 3
        stats = c.drain()
        assert stats["groups"] == 2 and stats["quarantined"] == 0
        assert stats["rows_updated"] == 3
        got = {r["id"]: r["value"] for r in table.read().collect()}
        assert got == {"a": 11.0, "b": 22.0, "c": 100.0, "d": 4.0}

    def test_duplicate_keys_split_into_ordered_rounds(self, spark, table):
        """Two payloads for one key cannot share a merge (duplicate source
        matches); the drained group applies them as ordered rounds, so
        the net effect equals sequential statement execution."""
        c = coalescer.DmlCoalescer()
        add = {"value": "_tgt.value + _src.adj"}
        c.enqueue(table, _src(spark, [("a", 10.0), ("b", 5.0)]), ["id"], add)
        c.enqueue(table, _src(spark, [("a", 100.0)]), ["id"], add)
        stats = c.drain()
        assert stats["groups"] == 1 and stats["rounds"] == 2
        assert stats["rows_updated"] == 3  # a twice, b once
        got = {r["id"]: r["value"] for r in table.read().collect()}
        assert got["a"] == 111.0 and got["b"] == 7.0

    def test_time_windows_widen_to_union(self, spark, table):
        """Per-statement timestamp windows widen to the covering range —
        both statements' target rows update even though each window alone
        excludes the other's row."""
        c = coalescer.DmlCoalescer()
        add = {"value": "_tgt.value + _src.adj"}
        c.enqueue(
            table, _src(spark, [("a", 10.0)]), ["id"], add,
            ts_lo="2026-01-01 00:00:00", ts_hi="2026-01-02 00:00:00",
        )
        c.enqueue(
            table, _src(spark, [("d", 40.0)]), ["id"], add,
            ts_lo="2026-01-03 00:00:00", ts_hi="2026-01-04 00:00:00",
        )
        stats = c.drain()
        assert stats["groups"] == 1
        got = {r["id"]: r["value"] for r in table.read().collect()}
        assert got["a"] == 11.0 and got["d"] == 44.0
        # rows inside the widened window but matching no source key are untouched
        assert got["b"] == 2.0 and got["c"] == 3.0

    def test_widened_window_parses_before_compare(self):
        """Mixed-format timestamp literals must widen by INSTANT, not by
        string order: '2024-01-02T08' sorts lexicographically above
        '2024-01-02 09' ('T' > ' '), so a string max would NARROW the
        window and silently skip rows. Unparseable literals make the
        bound unbounded (widening is safe; narrowing is not)."""
        from timefusion_spark.storage.coalescer import (
            _Group,
            _Statement,
            _widened_window,
        )

        g = _Group(
            table=None, join_keys=("id",), assignments={}, predicate=None,
            project_id=None,
        )
        g.statements = [
            _Statement(1, None, "2024-01-02 00:00:00", "2024-01-02T08:00:00"),
            _Statement(2, None, "2024-01-02", "2024-01-02 09:00:00"),
        ]
        lo, hi = _widened_window(g)
        assert hi == "2024-01-02 09:00:00"  # instant max, not string max
        assert lo in ("2024-01-02", "2024-01-02 00:00:00")  # same instant
        g.statements.append(_Statement(3, None, "not-a-time", "2024-01-03"))
        lo, hi = _widened_window(g)
        assert lo is None  # unparseable → unbounded, never mis-ordered
        assert hi == "2024-01-03"

    def test_widened_window_mixes_aware_and_naive(self):
        """A group mixing tz-aware ('…+00:00') and naive literals must
        widen, not raise: Python refuses to order aware vs naive
        datetimes, so the parser normalizes aware bounds to naive UTC
        before comparing."""
        from timefusion_spark.storage.coalescer import (
            _Group,
            _Statement,
            _widened_window,
        )

        g = _Group(
            table=None, join_keys=("id",), assignments={}, predicate=None,
            project_id=None,
        )
        g.statements = [
            _Statement(1, None, "2024-01-02 00:00:00", "2024-01-02 08:00:00"),
            _Statement(
                2, None, "2024-01-01 23:00:00+00:00", "2024-01-02 11:00:00+02:00"
            ),
        ]
        lo, hi = _widened_window(g)  # must not raise TypeError
        assert lo == "2024-01-01 23:00:00+00:00"  # 23:00 UTC < 00:00 naive
        # 11:00+02:00 is 09:00 UTC > 08:00 naive
        assert hi == "2024-01-02 11:00:00+02:00"

    def test_queue_empties_after_drain(self, spark, table):
        c = coalescer.DmlCoalescer()
        c.enqueue(table, _src(spark, [("a", 1.0)]), ["id"], {"value": "_src.adj"})
        c.drain()
        assert c.pending() == 0
        assert c.drain()["groups"] == 0

    def test_non_string_assignment_rejected(self, spark, table):
        c = coalescer.DmlCoalescer()
        with pytest.raises(TypeError, match="SQL string"):
            c.enqueue(table, _src(spark, [("a", 1.0)]), ["id"], {"value": F.lit(1.0)})


class TestQuarantineRedrive:
    def test_failed_group_parks_and_redrives(self, spark, table, monkeypatch):
        """A group exhausting its drain attempts parks under
        _tf_quarantine/dml (never dropped — there is no newer copy to
        converge from); redrive replays it once the fault clears."""
        calls = {"n": 0}
        real = dml.update_from

        def flaky(*a, **kw):
            calls["n"] += 1
            raise RuntimeError("injected OCC storm")

        monkeypatch.setattr(dml, "update_from", flaky)
        c = coalescer.DmlCoalescer(max_drain_attempts=2)
        c.enqueue(
            table, _src(spark, [("a", 10.0)]), ["id"],
            {"value": "_tgt.value + _src.adj"},
        )
        stats = c.drain()
        assert stats["quarantined"] == 1 and calls["n"] == 2
        qroot = os.path.join(table.path, coalescer.QUARANTINE_DIR)
        assert len(os.listdir(qroot)) == 1
        # dry run counts without replaying
        assert coalescer.redrive(table, dry_run=True) == (0, 1)
        assert {r["id"]: r["value"] for r in table.read().collect()}["a"] == 1.0
        # fault cleared → redrive recovers and removes the parked entry
        monkeypatch.setattr(dml, "update_from", real)
        assert maintenance.redrive_dml(table) == (1, 0)
        assert os.listdir(qroot) == []
        assert {r["id"]: r["value"] for r in table.read().collect()}["a"] == 11.0

    def test_redrive_failure_stays_parked_with_attempts(self, spark, table, monkeypatch):
        def boom(*a, **kw):
            raise RuntimeError("still failing")

        monkeypatch.setattr(dml, "update_from", boom)
        c = coalescer.DmlCoalescer(max_drain_attempts=1)
        c.enqueue(table, _src(spark, [("b", 1.0)]), ["id"], {"value": "_src.adj"})
        assert c.drain()["quarantined"] == 1
        assert coalescer.redrive(table) == (0, 1)
        qroot = os.path.join(table.path, coalescer.QUARANTINE_DIR)
        gid = os.listdir(qroot)[0]
        import json

        with open(os.path.join(qroot, gid, "meta.json")) as fh:
            meta = json.load(fh)
        assert meta["attempts"] == 1 and "still failing" in meta["error"]


class TestPerRoundProgress:
    """Review r10: committed rounds must never re-apply — a retry or a
    redrive of a parked group resumes at the first UNAPPLIED round (the
    assignments are non-idempotent: `value + adj` applied twice corrupts
    data)."""

    def test_mid_group_failure_never_reapplies_committed_rounds(
        self, spark, table, monkeypatch
    ):
        calls = {"n": 0}
        real = dml.update_from

        def fail_second(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected failure on round 2")
            return real(*a, **kw)

        monkeypatch.setattr(dml, "update_from", fail_second)
        c = coalescer.DmlCoalescer(max_drain_attempts=1)
        # same key twice → two ordered rounds
        c.enqueue(table, _src(spark, [("a", 10.0)]), ["id"],
                  {"value": "_tgt.value + _src.adj"})
        c.enqueue(table, _src(spark, [("a", 100.0)]), ["id"],
                  {"value": "_tgt.value + _src.adj"})
        stats = c.drain()
        assert stats["quarantined"] == 1
        # round 1 committed exactly once: value = 1 + 10
        assert {r["id"]: r["value"] for r in table.read().collect()}["a"] == 11.0
        # the parked remainder is ONLY round 2's row
        qroot = os.path.join(table.path, coalescer.QUARANTINE_DIR)
        [gid] = os.listdir(qroot)
        parked = spark.read.parquet(os.path.join(qroot, gid, "source"))
        assert [r["adj"] for r in parked.collect()] == [100.0]
        # fault cleared → redrive applies round 2 ONCE
        monkeypatch.setattr(dml, "update_from", real)
        assert coalescer.redrive(table) == (1, 0)
        assert {r["id"]: r["value"] for r in table.read().collect()}["a"] == 111.0

    def test_drained_groups_not_requeued_when_parking_fails(
        self, spark, table, monkeypatch
    ):
        """A failure while PARKING one group must not leave ALREADY-DRAINED
        groups queued (their assignments would re-apply on retry)."""
        real = dml.update_from

        def fail_for_b(table_arg, src, keys, *a, **kw):
            if [r["id"] for r in src.select("id").collect()] == ["b"]:
                raise RuntimeError("b always fails")
            return real(table_arg, src, keys, *a, **kw)

        monkeypatch.setattr(dml, "update_from", fail_for_b)
        monkeypatch.setattr(
            coalescer, "_quarantine",
            lambda g, e: (_ for _ in ()).throw(RuntimeError("disk full")),
        )
        c = coalescer.DmlCoalescer(max_drain_attempts=1)
        # distinct assignment expressions → two separate groups
        c.enqueue(table, _src(spark, [("a", 10.0)]), ["id"],
                  {"value": "_tgt.value + _src.adj"})
        c.enqueue(table, _src(spark, [("b", 20.0)]), ["id"],
                  {"value": "_tgt.value + _src.adj + 0"})
        with pytest.raises(RuntimeError, match="disk full"):
            c.drain()
        # group a drained and is GONE from the queue; only b remains
        assert c.pending() == 1
        assert {r["id"]: r["value"] for r in table.read().collect()}["a"] == 11.0
        # retrying the drain must not touch a again
        monkeypatch.setattr(coalescer, "_quarantine", lambda g, e: None)
        c.drain()
        assert {r["id"]: r["value"] for r in table.read().collect()}["a"] == 11.0

    def test_requeued_group_is_sealed_against_new_enqueues(
        self, spark, table, monkeypatch
    ):
        """ADVICE r10: a group re-queued after a parking failure carries a
        committed done_rounds watermark; a LATER enqueue matching the
        same logical key must start a FRESH group — appending to the
        sealed one would give any new join keys round numbers at or
        below the watermark and silently skip their rows on the next
        drain."""
        real = dml.update_from
        calls = {"n": 0}

        def fail_first(table_arg, src, keys, *a, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient")
            return real(table_arg, src, keys, *a, **kw)

        monkeypatch.setattr(dml, "update_from", fail_first)
        monkeypatch.setattr(
            coalescer, "_quarantine",
            lambda g, e: (_ for _ in ()).throw(RuntimeError("disk full")),
        )
        add = {"value": "_tgt.value + _src.adj"}
        c = coalescer.DmlCoalescer(max_drain_attempts=1)
        c.enqueue(table, _src(spark, [("a", 10.0)]), ["id"], add)
        with pytest.raises(RuntimeError, match="disk full"):
            c.drain()
        # the failed group re-queued; a NEW statement with the SAME
        # logical group key must land in a SEPARATE group
        c.enqueue(table, _src(spark, [("b", 20.0)]), ["id"], add)
        assert len(c._groups) == 2
        monkeypatch.setattr(coalescer, "_quarantine", lambda g, e: None)
        stats = c.drain()
        assert stats["quarantined"] == 0
        got = {r["id"]: r["value"] for r in table.read().collect()}
        # BOTH statements converged exactly once: a=1+10, b=2+20
        assert got["a"] == 11.0 and got["b"] == 22.0


class TestR13Hardening:
    """Round-13 review pins: intra-statement duplicate keys, oversize-round
    chunking, enqueue type validation, exhausted redrive skip."""

    def test_intra_statement_duplicate_keys_park_with_loud_error(
        self, spark, table
    ):
        c = coalescer.DmlCoalescer()
        add = {"value": "_tgt.value + _src.adj"}
        # two different payloads for 'a' in ONE statement: no defined
        # order — the group must park with the duplicate-keys error, not
        # apply an arbitrary payload order
        c.enqueue(table, _src(spark, [("a", 10.0), ("a", 99.0)]), ["id"], add)
        stats = c.drain()
        assert stats["quarantined"] == 1 and stats["rows_updated"] == 0
        qroot = os.path.join(table.path, coalescer.QUARANTINE_DIR)
        gid = os.listdir(qroot)[0]
        import json

        with open(os.path.join(qroot, gid, "meta.json")) as fh:
            meta = json.load(fh)
        assert "duplicate join keys" in meta["error"]
        # target untouched
        got = {r["id"]: r["value"] for r in table.read().collect()}
        assert got["a"] == 1.0

    def test_oversize_round_chunks_under_source_cap(
        self, spark, table, monkeypatch
    ):
        monkeypatch.setattr(dml, "MAX_UPDATE_SOURCE_ROWS", 2)
        c = coalescer.DmlCoalescer()
        # one statement, 4 distinct keys -> one occurrence-round of 4 rows
        # > cap 2 -> must chunk into subrounds instead of raising
        # 'source too large' forever
        src = _src(spark, [("a", 10.0), ("b", 10.0), ("c", 10.0), ("d", 10.0)])
        c.enqueue(table, src, ["id"], {"value": "_tgt.value + _src.adj"})
        stats = c.drain()
        assert stats["quarantined"] == 0
        assert stats["rows_updated"] == 4
        assert stats["rounds"] >= 2  # chunked
        got = {r["id"]: r["value"] for r in table.read().collect()}
        assert got == {"a": 11.0, "b": 12.0, "c": 13.0, "d": 14.0}

    def test_non_string_predicate_and_bounds_rejected(self, spark, table):
        import datetime as dt

        c = coalescer.DmlCoalescer()
        with pytest.raises(TypeError, match="predicate"):
            c.enqueue(
                table, _src(spark, [("a", 1.0)]), ["id"],
                {"value": "_src.adj"}, predicate=F.lit(True),
            )
        with pytest.raises(TypeError, match="ts_lo"):
            c.enqueue(
                table, _src(spark, [("a", 1.0)]), ["id"],
                {"value": "_src.adj"}, ts_lo=dt.datetime(2026, 1, 1),
            )
        assert c.pending() == 0

    def test_redrive_skips_exhausted_groups(self, spark, table):
        c = coalescer.DmlCoalescer(max_drain_attempts=1)
        # an assignment referencing a column that doesn't exist fails
        # every apply -> parks, then every redrive fails too
        c.enqueue(
            table, _src(spark, [("a", 1.0)]), ["id"],
            {"value": "_src.no_such_col"},
        )
        stats = c.drain()
        assert stats["quarantined"] == 1
        ok, left = coalescer.redrive(table, max_attempts=1)
        assert (ok, left) == (0, 1)
        qroot = os.path.join(table.path, coalescer.QUARANTINE_DIR)
        gid = os.listdir(qroot)[0]
        import json

        meta_path = os.path.join(qroot, gid, "meta.json")
        with open(meta_path) as fh:
            meta = json.load(fh)
        assert meta["exhausted"] is True and meta["attempts"] == 1
        # second redrive must SKIP (attempts unchanged), not churn forever
        ok, left = coalescer.redrive(table, max_attempts=1)
        assert (ok, left) == (0, 1)
        with open(meta_path) as fh:
            assert json.load(fh)["attempts"] == 1


class TestStreamJoinGuard:
    def test_same_ts_name_rejected(self, spark):
        from timefusion_spark.storage.streaming import stream_stream_join

        left = spark.readStream.format("rate").load().select(
            F.col("value").alias("user_id"), F.col("timestamp").alias("ts")
        )
        right = spark.readStream.format("rate").load().select(
            F.col("value").alias("user_id"), F.col("timestamp").alias("ts")
        )
        with pytest.raises(ValueError, match="must differ"):
            stream_stream_join(left, right, key="user_id", left_ts="ts", right_ts="ts")


class TestRedriveDupGuard:
    def test_redrive_refuses_intra_statement_duplicates(self, spark, table):
        """round-diff review r13: redrive used to bypass the duplicate-key
        guard and apply the parked group in arbitrary payload order."""
        c = coalescer.DmlCoalescer()
        c.enqueue(
            table, _src(spark, [("a", 10.0), ("a", 99.0)]), ["id"],
            {"value": "_src.adj"},
        )
        stats = c.drain()
        assert stats["quarantined"] == 1
        ok, left = coalescer.redrive(table)
        assert (ok, left) == (0, 1)  # refused, still parked
        got = {r["id"]: r["value"] for r in table.read().collect()}
        assert got["a"] == 1.0  # target untouched by the recovery path
        import json

        qroot = os.path.join(table.path, coalescer.QUARANTINE_DIR)
        gid = os.listdir(qroot)[0]
        with open(os.path.join(qroot, gid, "meta.json")) as fh:
            assert "duplicate join keys" in json.load(fh)["error"]
