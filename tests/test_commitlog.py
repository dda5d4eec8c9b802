"""Commit log: atomic commits, snapshot isolation, idempotent txns, vacuum.

The contract mirrored (file:line in /root/reference/src/): atomic multi-
file commits (database.rs:4776, 5181), snapshot-isolated readers
(snapshot_cache.rs:1-10), idempotent txn versioning for streaming ingest
(buffered_write_layer.rs:2211 WAL watermark in commit metadata), and
manifest-diff garbage collection (database.rs:9514 VACUUM)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from timefusion_spark.storage import Table, dml, load_schema_text, maintenance
from timefusion_spark.storage.commitlog import CommitLog

YAML = """
table_name: t
partitions: [project_id, date]
time_column: timestamp
dedup_keys: [timestamp, id]
dedup_tiebreak: updated_at
tombstone_column: deleted
version_append: true
sorting_columns:
  - {name: timestamp, descending: true, nulls_first: true}
fields:
  - {name: date, data_type: Date32, nullable: false}
  - {name: timestamp, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: false}
  - {name: id, data_type: Utf8, nullable: false}
  - {name: value, data_type: Float64, nullable: true}
  - {name: project_id, data_type: Utf8, nullable: true}
  - {name: updated_at, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: true}
  - {name: deleted, data_type: Boolean, nullable: true}
"""


@pytest.fixture()
def table(spark, tmp_path):
    return Table.create(spark, load_schema_text(YAML), str(tmp_path / "t"))


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "timestamp string, id string, value double, project_id string"
    )


BASE = [
    ("2026-01-01 10:00:00", "a", 1.0, "p1"),
    ("2026-01-01 11:00:00", "b", 2.0, "p1"),
    ("2026-01-02 09:00:00", "c", 3.0, "p2"),
]


class TestAtomicity:
    def test_reader_does_not_see_uncommitted_files(self, spark, table):
        """Reader-during-append isolation: files placed in the partition
        layout but not yet committed (a torn write frozen mid-commit) are
        invisible to the snapshot read."""
        table.append(_rows(spark, BASE))
        assert table.read_raw().count() == 3
        # Freeze an append between its file move and its log commit:
        # stage+move a second batch WITHOUT committing.
        staged = table._stage_write(
            table.coerce(_rows(spark, [("2026-01-01 12:00:00", "d", 4.0, "p1")]))
        )
        assert staged  # files are physically in the table dir...
        assert table.read_raw().count() == 3  # ...but no reader sees them
        # Completing the commit publishes all of them at once.
        table.log.commit(add=staged)
        assert table.read_raw().count() == 4

    def test_version_race_retries(self, table):
        """A writer losing the version race must land at the next version,
        never overwrite the winner's commit."""
        log = table.log
        winner = log.latest_version() + 1
        os.makedirs(log.log_dir, exist_ok=True)
        with open(os.path.join(log.log_dir, f"{winner:08d}.json"), "w") as fh:
            json.dump({"version": winner, "op": "append",
                       "add": [{"path": "x.parquet", "size": 1}], "remove": []}, fh)
        v = log.commit(add=[("y.parquet", 2)])
        assert v == winner + 1
        snap = log.snapshot()
        assert set(snap.files) == {"x.parquet", "y.parquet"}

    def test_empty_table_snapshot_reads_empty(self, spark, table):
        df = table.read_raw()
        assert df.count() == 0
        assert df.columns == [f.name for f in table.schema.fields]


class TestIdempotence:
    def test_redelivered_txn_batch_skipped(self, spark, table):
        """Delta txnAppId/txnVersion contract: a re-delivered batch with an
        already-committed (app_id, version) must not write again."""
        batch = _rows(spark, BASE)
        table.append(batch, txn=("appA", 7))
        assert table.read_raw().count() == 3
        table.append(batch, txn=("appA", 7))  # re-delivery
        table.append(batch, txn=("appA", 3))  # late re-delivery of older batch
        assert table.read_raw().count() == 3
        table.append(_rows(spark, [("2026-01-03 00:00:00", "d", 4.0, "p1")]),
                     txn=("appA", 8))
        assert table.read_raw().count() == 4
        # independent app ids have independent watermarks
        table.append(_rows(spark, [("2026-01-04 00:00:00", "e", 5.0, "p1")]),
                     txn=("appB", 0))
        assert table.read_raw().count() == 5


class TestVacuum:
    def test_manifest_diff_collects_replaced_and_orphaned(self, spark, table):
        table.append(_rows(spark, BASE))
        # An orphan: staged+moved but never committed (crashed writer).
        table._stage_write(
            table.coerce(_rows(spark, [("2026-01-01 13:00:00", "z", 9.0, "p1")]))
        )
        # A rewrite: compaction replaces p1's live file in the manifest.
        maintenance.compact(table, {"project_id": "p1", "date": "2026-01-01"})
        live_before = set(table.log.snapshot().files)
        on_disk = {
            os.path.relpath(os.path.join(r, f), table.path)
            for r, _d, fs in os.walk(table.path)
            for f in fs
            if f.endswith(".parquet")
        }
        assert on_disk > live_before  # dead files awaiting collection
        removed = maintenance.vacuum(table)
        assert removed
        on_disk_after = {
            os.path.relpath(os.path.join(r, f), table.path)
            for r, _d, fs in os.walk(table.path)
            for f in fs
            if f.endswith(".parquet")
        }
        assert on_disk_after == live_before  # exactly the manifest survives
        assert table.read().count() == 3  # data intact

    def test_overwrite_is_one_atomic_commit(self, spark, table):
        table.append(_rows(spark, BASE))
        v0 = table.log.latest_version()
        maintenance.compact(table, {"project_id": "p1", "date": "2026-01-01"}, target_files=1)
        assert table.log.latest_version() == v0 + 1  # one commit, add+remove together
        with open(os.path.join(table.log.log_dir, f"{v0 + 1:08d}.json")) as fh:
            rec = json.load(fh)
        assert rec["op"] == "overwrite"
        assert rec["add"] and rec["remove"]


class TestCheckpoint:
    def test_snapshot_from_checkpoint_matches_full_replay(self, spark, table):
        from timefusion_spark.storage import commitlog

        for i in range(commitlog.CHECKPOINT_EVERY + 3):
            table.log.commit(add=[(f"f{i}.parquet", i)], txn=("app", i))
        names = os.listdir(table.log.log_dir)
        assert any(n.endswith(".checkpoint.json") for n in names)
        snap = table.log.snapshot()
        # independently replay WITHOUT the checkpoint
        fresh = CommitLog(table.path)
        full = {}
        txns: dict[str, int] = {}
        for name in sorted(n for n in names if n.endswith(".json")
                           and not n.endswith(".checkpoint.json")):
            with open(os.path.join(table.log.log_dir, name)) as fh:
                rec = json.load(fh)
            for p in rec.get("remove", []):
                full.pop(p, None)
            for f in rec.get("add", []):
                full[f["path"]] = f["size"]
            if rec.get("txn"):
                t = rec["txn"]
                txns[t["app_id"]] = max(txns.get(t["app_id"], -1), t["version"])
        assert snap.files == full
        assert snap.txns == txns
        assert fresh.txn_version("app") == commitlog.CHECKPOINT_EVERY + 2


class TestDmlThroughLog:
    def test_update_delete_commit_versions(self, spark, table):
        table.append(_rows(spark, BASE))
        n = dml.update(table, {"value": F.col("value") * 10}, predicate="project_id = 'p1'")
        assert n == 2
        vals = {r["id"]: r["value"] for r in table.read().collect()}
        assert vals == {"a": 10.0, "b": 20.0, "c": 3.0}
        assert dml.delete(table, predicate="id='c'") == 1
        assert table.read().count() == 2


class TestConcurrentWriters:
    def test_parallel_appends_both_commit(self, spark, table):
        """Two writers appending simultaneously: the version race resolves
        by retry, BOTH batches become visible, and no commit is lost —
        the optimistic-concurrency contract (database.rs commit loop)."""
        import threading

        errs = []

        def writer(i: int):
            try:
                rows = [
                    (f"2026-02-0{i + 1} 10:00:00", f"w{i}-{j}", float(j), f"p{i}")
                    for j in range(20)
                ]
                table.append(_rows(spark, rows))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errs
        assert table.read_raw().count() == 40
        snap = table.log.snapshot()
        assert table.log.latest_version() == 2  # create + two appends
        # every committed file exists on disk
        for rel in snap.files:
            assert os.path.exists(os.path.join(table.path, rel))


class TestTimeTravel:
    def test_version_as_of_reads_old_snapshots(self, spark, table):
        """v1 = base append, v2 = UPDATE, v3 = DELETE: each snapshot gives a
        different answer, and old snapshots stay readable after later DML
        (replaced files survive until vacuum)."""
        table.append(_rows(spark, BASE))
        dml.update(table, {"value": F.col("value") * 10}, predicate="project_id = 'p1'")
        dml.delete(table, predicate="id='c'")
        assert table.log.latest_version() == 3

        v1 = {r["id"]: r["value"] for r in table.read(version=1).collect()}
        assert v1 == {"a": 1.0, "b": 2.0, "c": 3.0}
        v2 = {r["id"]: r["value"] for r in table.read(version=2).collect()}
        assert v2 == {"a": 10.0, "b": 20.0, "c": 3.0}
        assert table.read(version=3).count() == 2
        assert table.read().count() == 2  # current == v3

    def test_version_out_of_range_raises(self, spark, table):
        table.append(_rows(spark, BASE))
        with pytest.raises(ValueError, match="out of range"):
            table.read_raw(version=99).count()

    def test_empty_initial_version_reads_empty(self, spark, table):
        table.append(_rows(spark, BASE))
        assert table.read_raw(version=0).count() == 0  # create commit only


class TestVacuumRetention:
    def test_retain_hours_keeps_young_unreferenced_files(self, spark, table):
        """VACUUM t RETAIN n HOURS: files replaced moments ago survive the
        retention window (in-flight readers of older snapshots keep their
        files); retention 0 collects them."""
        table.append(_rows(spark, BASE))
        maintenance.compact(table, {"project_id": "p1", "date": "2026-01-01"})
        removed = maintenance.vacuum(table, retain_hours=1.0)
        assert not any(p.endswith(".parquet") for p in removed)  # all too young
        assert table.read().count() == 3
        removed = maintenance.vacuum(table)  # retention 0 → collect now
        assert any(p.endswith(".parquet") for p in removed)
        assert table.read().count() == 3


class TestRetentionDrop:
    def test_drop_partitions_before_is_one_metadata_commit(self, spark, table):
        """TTL drop: date partitions before the cutoff disappear in ONE
        remove-only commit (no data rewritten); files stay on disk until
        vacuum; time travel still sees the pre-drop snapshot."""
        table.append(_rows(spark, BASE))  # dates 2026-01-01 (a,b), 2026-01-02 (c)
        v_before = table.log.latest_version()
        n = maintenance.drop_partitions_before(table, "2026-01-02")
        assert n >= 1
        assert table.log.latest_version() == v_before + 1
        assert {r["id"] for r in table.read().collect()} == {"c"}
        # pre-drop snapshot still readable (snapshot isolation)
        assert table.read(version=v_before).count() == 3
        # nothing matching → no empty commit
        v = table.log.latest_version()
        assert maintenance.drop_partitions_before(table, "2026-01-02") == 0
        assert table.log.latest_version() == v
        # vacuum collects the dropped files
        assert any(p.endswith(".parquet") for p in maintenance.vacuum(table))
        assert {r["id"] for r in table.read().collect()} == {"c"}


class TestChangeFeed:
    def test_changes_tag_commits_and_types(self, spark, table):
        table.append(_rows(spark, BASE))                      # v1
        dml.update(table, {"value": F.col("value") * 10},
                   predicate="project_id = 'p1'", stamp="2026-01-02 00:00:00")  # v2
        dml.delete(table, predicate="id='c'", stamp="2026-01-03 00:00:00")      # v3
        ch = table.read_changes(0).select(
            "_commit_version", "_change_type", "id", "value"
        ).collect()
        by_v = {}
        for r in ch:
            by_v.setdefault(r["_commit_version"], []).append(r)
        assert sorted(r["id"] for r in by_v[1]) == ["a", "b", "c"]
        assert all(r["_change_type"] == "upsert" for r in by_v[1])
        assert sorted((r["id"], r["value"]) for r in by_v[2]) == [("a", 10.0), ("b", 20.0)]
        assert [(r["id"], r["_change_type"]) for r in by_v[3]] == [("c", "delete")]

    def test_incremental_cursor_contract(self, spark, table):
        table.append(_rows(spark, BASE))                      # v1
        cursor = table.log.latest_version()
        assert table.read_changes(cursor).count() == 0        # nothing new
        dml.delete(table, predicate="id='a'", stamp="2026-01-02 00:00:00")  # v2
        fresh = table.read_changes(cursor)
        assert [(r["id"], r["_change_type"]) for r in fresh.collect()] == [
            ("a", "delete")
        ]

    def test_bad_range_raises(self, spark, table):
        table.append(_rows(spark, BASE))
        import pytest as _pt

        with _pt.raises(ValueError):
            table.read_changes(0, to_version=99)


class TestChangeFeedDataChange:
    def test_rewrite_commits_do_not_reappear_in_feed(self, spark, table):
        """Compaction rewrites the same visible rows into new files — the
        Delta CDF dataChange=false rule: a feed consumer polling past a
        compaction commit must receive NOTHING new."""
        from timefusion_spark.storage import maintenance

        table.append(_rows(spark, BASE))                               # v1
        dml.delete(table, predicate="id='c'", stamp="2026-01-02 00:00:00")  # v2
        cursor = table.log.latest_version()
        # Rewrite commits: compact p1's partition + consolidate + vacuum.
        maintenance.compact(table, {"project_id": "p1", "date": "2026-01-01"})
        maintenance.consolidate(table, target_file_bytes=1 << 20, min_files=2)
        maintenance.vacuum(table)
        assert table.log.latest_version() > cursor
        assert table.read_changes(cursor).count() == 0

    def test_history_replay_survives_rewrites_until_vacuum(self, spark, table):
        """Historical feed reads stay valid across rewrite commits
        (snapshot isolation keeps replaced files on disk) and are
        invalidated by vacuum — Delta's CDF-retention rule."""
        from pyspark.errors import AnalysisException

        from timefusion_spark.storage import maintenance

        table.append(_rows(spark, BASE))                               # v1
        dml.delete(table, predicate="id='c'", stamp="2026-01-02 00:00:00")  # v2
        maintenance.compact(table, {"project_id": "p1", "date": "2026-01-01"})
        ch = table.read_changes(0)
        assert ch.count() == 4  # 3 base upserts + 1 tombstone, no replays
        assert ch.where("_change_type = 'delete'").count() == 1
        maintenance.vacuum(table)
        with pytest.raises(AnalysisException):
            table.read_changes(0).count()


class TestCommitGroups:
    """Coalesced multi-table commit (database.rs:5181): per-table commits
    stage invisibly inside a group; ONE marker publish makes every table's
    batch visible atomically. A torn write (coordinator crash before
    publish) is never observable."""

    @pytest.fixture()
    def two_tables(self, spark, tmp_path):
        a = Table.create(spark, load_schema_text(YAML.replace("table_name: t", "table_name: a")), str(tmp_path / "a"))
        b = Table.create(spark, load_schema_text(YAML.replace("table_name: t", "table_name: b")), str(tmp_path / "b"))
        return a, b

    def test_group_publish_makes_both_visible_atomically(self, spark, tmp_path, two_tables):
        from timefusion_spark.storage.commitlog import CommitGroup

        a, b = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        b.append(_rows(spark, BASE[:1]), stamp="2026-01-01 00:00:00", group=g)
        # phase 1: both committed but INVISIBLE
        assert a.read().count() == 0 and b.read().count() == 0
        g.publish()
        # phase 2: both visible at once
        assert a.read().count() == 3 and b.read().count() == 1

    def test_vacuum_protects_pending_group_stages(self, spark, tmp_path, two_tables):
        """VACUUM with retain 0 while a group is mid-stage (an open wire
        transaction, a multi-table flush between commit and publish) must
        NOT collect the staged parquet: it is in no snapshot yet, but the
        group's publish will reference it — collecting it is durable data
        loss at COMMIT. Aborted groups' files stay collectible."""
        from timefusion_spark.storage import maintenance
        from timefusion_spark.storage.commitlog import CommitGroup, abort_group

        a, b = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        assert a.read().count() == 0  # staged, invisible
        removed = maintenance.vacuum(a, retain_hours=0.0)
        assert not any(p.endswith(".parquet") for p in removed)
        g.publish()
        assert a.read().count() == 3  # the staged files survived vacuum
        # an ABORTED group's stage is not protected: once settled, its
        # files are unreferenced garbage and collect normally
        g2 = CommitGroup(str(tmp_path / "groups"))
        b.append(_rows(spark, BASE[:1]), stamp="2026-01-02 00:00:00", group=g2)
        rec = b.log.entry(b.log.latest_version())
        abort_group(rec["group"], b.log.log_dir)
        removed = maintenance.vacuum(b, retain_hours=0.0)
        assert any(p.endswith(".parquet") for p in removed)

    def test_torn_multi_table_write_invisible(self, spark, tmp_path, two_tables):
        """Coordinator crashes after table A's commit, before the marker:
        NO reader surface (scan, count, change feed, time travel) observes
        A's rows — the write is torn but never torn-VISIBLE."""
        from timefusion_spark.storage.commitlog import CommitGroup

        a, b = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        # crash here: g.publish() never runs
        assert a.read().count() == 0
        assert a.count() == 0
        assert a.read_changes(0).count() == 0
        assert len(a.log.snapshot().files) == 0
        # a later NON-group append publishes normally and alone
        a.append(_rows(spark, BASE[:1]), stamp="2026-01-02 00:00:00")
        assert a.read().count() == 1

    def test_pending_group_txn_not_counted(self, spark, tmp_path, two_tables):
        """A pending group commit's txn watermark is ignored, so the
        replayed streaming batch re-appends instead of being skipped (the
        lost-write trap of counting invisible commits as delivered)."""
        from timefusion_spark.storage.commitlog import CommitGroup

        a, _ = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), txn=("app", 7), group=g)  # never published
        assert a.log.txn_version("app") == -1
        # replay delivers the same batch under a new group; it must land
        g2 = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), txn=("app", 7), group=g2)
        g2.publish()
        assert a.read().count() == 3
        assert a.log.txn_version("app") == 7

    def test_checkpoint_defers_over_pending_group(self, spark, tmp_path, two_tables):
        """A checkpoint never bakes in a pending group's absence: the
        checkpoint write is deferred while an unpublished group commit is
        in range, and the state is correct once the marker appears."""
        from timefusion_spark.storage.commitlog import CHECKPOINT_EVERY, CommitGroup

        a, _ = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        # drive the log past a checkpoint boundary with small commits
        for i in range(CHECKPOINT_EVERY + 1):
            a.log.commit(add=[], op="append", txn=("filler", i))
        import os as _os

        cks = [f for f in _os.listdir(a.log.log_dir) if f.endswith(".checkpoint.json")]
        assert cks == []  # deferred, not written with the group pending
        g.publish()
        a.log.commit(add=[], op="append", txn=("filler", 999))
        assert a.read().count() == 3

    def test_multi_table_streaming_ingest_coalesced(self, spark, tmp_path, two_tables):
        """ingest_stream_multi: one micro-batch routes to two tables and
        commits as one group; both tables see every batch, and each
        table's commit entries carry the group id."""
        import json as _json
        import os as _os

        from timefusion_spark.storage.streaming import ingest_stream_multi

        a, b = two_tables
        src = str(tmp_path / "src")
        _rows(spark, BASE).coalesce(1).write.mode("overwrite").json(src)
        stream = spark.readStream.schema(
            "timestamp string, id string, value double, project_id string"
        ).json(src)
        q = ingest_stream_multi(
            {
                "a": (a, lambda df: df),
                "b": (b, lambda df: df.where("project_id = 'p1'")),
            },
            stream,
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)
        assert a.read().count() == 3
        assert b.read().count() == 2
        groups = set()
        for tbl in (a, b):
            for name in sorted(_os.listdir(tbl.log.log_dir)):
                if not name.endswith(".json") or name.endswith(".checkpoint.json"):
                    continue
                with open(_os.path.join(tbl.log.log_dir, name)) as fh:
                    rec = _json.load(fh)
                if rec.get("group"):
                    groups.add((tbl.schema.table_name, rec["group"]["id"]))
        ids = {gid for _, gid in groups}
        assert len(ids) == 1  # one shared group across both tables


class TestGroupDurabilityAndAbort:
    """Round-7 hardening: group visibility is self-contained per table
    (confirmation records under the table's own log dir), and
    pending-group resolution is a definitive arbiter — publish and abort
    race through ONE atomic create, so whichever settles first wins
    forever and the loser fails loudly."""

    @pytest.fixture()
    def two_tables(self, spark, tmp_path):
        a = Table.create(spark, load_schema_text(YAML.replace("table_name: t", "table_name: a")), str(tmp_path / "a"))
        b = Table.create(spark, load_schema_text(YAML.replace("table_name: t", "table_name: b")), str(tmp_path / "b"))
        return a, b

    def test_marker_dir_deleted_after_publish_stays_visible(self, spark, tmp_path, two_tables):
        """Deleting/resetting the coordinator's marker dir (a routine
        stream-checkpoint reset) must NOT retroactively hide published
        group commits — visibility lives in each table's own log."""
        import shutil

        from timefusion_spark.storage.commitlog import CommitGroup

        a, b = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        b.append(_rows(spark, BASE[:1]), stamp="2026-01-01 00:00:00", group=g)
        g.publish()
        shutil.rmtree(str(tmp_path / "groups"))
        assert a.read().count() == 3 and b.read().count() == 1
        assert a.read_changes(0).count() == 3

    def test_table_moved_after_publish_stays_visible(self, spark, tmp_path, two_tables):
        """Relocating a table directory (deployment move/copy) keeps every
        published group commit visible: no absolute-path dependence."""
        import shutil

        from timefusion_spark.storage.commitlog import CommitGroup

        a, _ = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        g.publish()
        shutil.rmtree(str(tmp_path / "groups"))  # coordinator gone too
        moved = str(tmp_path / "a_moved")
        shutil.move(a.path, moved)
        reopened = Table.open(spark, moved)
        assert reopened.read().count() == 3

    def test_abort_is_definitive_late_publish_fails(self, spark, tmp_path, two_tables):
        from timefusion_spark.storage.commitlog import CommitGroup, abort_group

        a, _ = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        rec = a.log.entry(a.log.latest_version())
        assert abort_group(rec["group"], a.log.log_dir) == "aborted"
        with pytest.raises(RuntimeError, match="aborted"):
            g.publish()
        assert a.read().count() == 0  # invisible forever

    def test_publish_wins_race_over_abort(self, spark, tmp_path, two_tables):
        from timefusion_spark.storage.commitlog import CommitGroup, abort_group

        a, _ = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        g.publish()
        rec = a.log.entry(a.log.latest_version())
        assert abort_group(rec["group"], a.log.log_dir) == "published"
        assert a.read().count() == 3  # abort lost: still visible

    def test_checkpoint_ages_out_pending_group(self, spark, tmp_path, two_tables):
        """A crashed coordinator (pending > ABORT_AFTER_SECONDS) no longer
        disables checkpointing forever: the checkpoint writer settles the
        group as aborted and proceeds, and a late publish() raises."""
        import time

        from timefusion_spark.storage.commitlog import CHECKPOINT_EVERY, CommitGroup

        a, _ = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        v = a.log.latest_version()
        entry_path = os.path.join(a.log.log_dir, f"{v:08d}.json")
        old = time.time() - 3600
        os.utime(entry_path, (old, old))  # age the pending entry
        for i in range(CHECKPOINT_EVERY + 1):
            a.log.commit(add=[], op="append", txn=("filler", i))
        cks = [f for f in os.listdir(a.log.log_dir) if f.endswith(".checkpoint.json")]
        assert cks  # checkpoint written despite the torn group
        with pytest.raises(RuntimeError, match="aborted"):
            g.publish()
        assert a.read().count() == 0

    def test_per_group_abort_threshold_and_heartbeat(self, spark, tmp_path, two_tables):
        """The pending-group ager honors each group's DECLARED abort_after
        (carried in the commit record): an interactive group aged well past
        the 60 s streaming crash-arbiter is deferred, not aborted, by the
        checkpoint boundary — and heartbeat() refreshes its pending age so
        a live coordinator can stay open indefinitely. Streaming groups
        (default threshold) keep the tight arbiter, per
        test_checkpoint_ages_out_pending_group."""
        import time

        from timefusion_spark.storage.commitlog import (
            CHECKPOINT_EVERY,
            INTERACTIVE_ABORT_AFTER_SECONDS,
            CommitGroup,
            _group_state,
        )

        a, _ = two_tables
        g = CommitGroup(
            str(tmp_path / "groups"), abort_after=INTERACTIVE_ABORT_AFTER_SECONDS
        )
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        v = a.log.latest_version()
        rec = a.log.entry(v)
        assert rec["group"]["abort_after"] == INTERACTIVE_ABORT_AFTER_SECONDS
        path = os.path.join(a.log.log_dir, f"{v:08d}.json")
        old = time.time() - 3600  # far past the streaming threshold
        os.utime(path, (old, old))
        for i in range(CHECKPOINT_EVERY + 1):
            a.log.commit(add=[], op="append", txn=("filler", i))
        # checkpoint writer deferred instead of aborting the young-for-its-
        # threshold interactive group
        assert _group_state(a.log.entry(v), a.log.log_dir) == "pending"
        g.heartbeat()
        assert os.path.getmtime(path) > old + 1
        g.publish()
        assert a.read().count() == 3

    def test_snapshot_at_read_time_resolution(self, spark, tmp_path, two_tables):
        """Pinned time-travel semantics under coalesced commits: group
        visibility resolves at READ time. snapshot_at(v) excludes a
        pending group's files; the SAME version re-read after publish
        includes them; after a definitive abort it excludes them forever."""
        from timefusion_spark.storage.commitlog import CommitGroup, abort_group

        a, b = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        v = a.log.latest_version()
        a.append(_rows(spark, [("2026-01-03 10:00:00", "z", 9.0, "p1")]), stamp="2026-01-02 00:00:00")
        later = a.log.latest_version()
        assert len(a.log.snapshot_at(v).files) == 0          # pending: absent
        assert len(a.log.snapshot_at(later).files) == 1      # only the solo append
        g.publish()
        assert len(a.log.snapshot_at(v).files) > 0           # same v, now present
        # and an aborted group stays absent at every version forever
        g2 = CommitGroup(str(tmp_path / "groups"))
        b.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g2)
        v2 = b.log.latest_version()
        abort_group(b.log.entry(v2)["group"], b.log.log_dir)
        assert len(b.log.snapshot_at(v2).files) == 0


class TestIncludeGroupReads:
    """`snapshot(include_group=gid)` — the read-your-own-writes view of an
    open explicit transaction (the pgwire BEGIN…COMMIT surface): the
    group's owner sees its PENDING commits, nobody else does, and an
    ABORTED group's commits stay invisible even to their owner."""

    @pytest.fixture()
    def two_tables(self, spark, tmp_path):
        a = Table.create(spark, load_schema_text(YAML.replace("table_name: t", "table_name: a")), str(tmp_path / "a"))
        b = Table.create(spark, load_schema_text(YAML.replace("table_name: t", "table_name: b")), str(tmp_path / "b"))
        return a, b

    def test_owner_sees_pending_others_do_not(self, spark, tmp_path, two_tables):
        from timefusion_spark.storage.commitlog import CommitGroup

        a, b = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        # plain snapshot: invisible
        assert len(a.log.snapshot().files) == 0
        # the owner's view includes the pending commit
        own = a.log.snapshot(include_group=g.id)
        assert len(own.files) > 0
        assert a.read(include_group=g.id).count() == 3
        # a DIFFERENT group id sees nothing
        assert len(a.log.snapshot(include_group="someother").files) == 0
        # after publish, include_group is a no-op (already visible)
        g.publish()
        assert a.read().count() == 3
        assert a.read(include_group=g.id).count() == 3

    def test_aborted_group_invisible_even_to_owner(self, spark, tmp_path, two_tables):
        from timefusion_spark.storage.commitlog import CommitGroup, abort_group

        a, _ = two_tables
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00", group=g)
        assert a.read(include_group=g.id).count() == 3
        assert abort_group({"id": g.id, "marker": g.marker}, a.log.log_dir) == "aborted"
        # the dead transaction's rows are gone from its own view too
        assert a.read(include_group=g.id).count() == 0
        with pytest.raises(RuntimeError):
            g.publish()

    def test_mixed_published_and_pending(self, spark, tmp_path, two_tables):
        """The owner's view = committed state + its own staged commits,
        LWW-merged exactly like a post-commit read would be."""
        from timefusion_spark.storage.commitlog import CommitGroup

        a, _ = two_tables
        a.append(_rows(spark, BASE[:1]), stamp="2026-01-01 00:00:00")
        g = CommitGroup(str(tmp_path / "groups"))
        a.append(_rows(spark, BASE[1:]), stamp="2026-01-02 00:00:00", group=g)
        assert a.read().count() == 1
        assert a.read(include_group=g.id).count() == 3
        g.publish()
        assert a.read().count() == 3


class TestManyConcurrentLogWriters:
    def test_eight_writers_no_lost_commits(self, tmp_path):
        """8 threads × 10 commits racing the create-if-absent version claim
        on one raw CommitLog: every commit lands (no lost updates), the
        version sequence is contiguous, and replay retains every add —
        the optimistic-concurrency loop under real contention."""
        import threading

        from timefusion_spark.storage.commitlog import CommitLog

        log = CommitLog(str(tmp_path / "t"))
        log.init()
        errs: list[Exception] = []

        def writer(w: int):
            try:
                for j in range(10):
                    log.commit(add=[(f"part/w{w}-{j}.parquet", 1)])
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=writer, args=(w,)) for w in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errs
        assert log.latest_version() == 80  # create + 80 commits
        snap = log.snapshot()
        assert len(snap.files) == 80
        assert snap.version == 80
        # contiguous versions: every one of 0..80 has exactly one record
        import os as _os

        versions = sorted(
            int(f.split(".")[0])
            for f in _os.listdir(log.log_dir)
            if f.endswith(".json") and not f.endswith(".checkpoint.json")
            and not f.startswith(".")
        )
        assert versions == list(range(81))
