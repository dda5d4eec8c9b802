"""Custom Python DataSource (sources/eventgen.py): batch determinism,
partitioned generation, and the micro-batch streaming reader."""

from __future__ import annotations

import time

from timefusion_spark.sources import register_sources
from timefusion_spark.sources.eventgen import row_for


def test_batch_read_is_deterministic_and_partitioned(spark):
    register_sources(spark)
    df = spark.read.format("eventgen").option("n", 200).option("numPartitions", 4).load()
    rows = sorted(df.collect(), key=lambda r: r["event_id"])
    assert len(rows) == 200
    # worker-side generation matches the closed-form row function exactly
    for i in (0, 1, 99, 199):
        expect = row_for(i)
        got = rows[i]
        assert (got["event_id"], got["ts"], got["user_id"], got["event_type"]) == expect[:4]
        assert abs(got["value"] - expect[4]) == 0.0
    # re-read: identical (a connector must be re-scannable)
    again = sorted(df.collect(), key=lambda r: r["event_id"])
    assert rows == again


def test_stream_reader_delivers_all_rows_once(spark, tmp_path):
    register_sources(spark)
    stream = (
        spark.readStream.format("eventgen")
        .option("n", 400)
        .option("rowsPerBatch", 100)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(str(tmp_path / "out")).count() >= 400:
                    break
            except Exception:
                pass
            time.sleep(2)
    finally:
        q.stop()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 400
    assert out.select("event_id").distinct().count() == 400  # no duplicates


class TestChangeFeedSource:
    """tf_changes: the commit log tailed as a stream (offsets = versions)."""

    YAML = """
table_name: t
partitions: [project_id, date]
time_column: timestamp
dedup_keys: [timestamp, id]
dedup_tiebreak: updated_at
tombstone_column: deleted
version_append: true
fields:
  - {name: date, data_type: Date32, nullable: false}
  - {name: timestamp, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: false}
  - {name: id, data_type: Utf8, nullable: false}
  - {name: value, data_type: Float64, nullable: true}
  - {name: project_id, data_type: Utf8, nullable: true}
  - {name: updated_at, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: true}
  - {name: deleted, data_type: Boolean, nullable: true}
"""

    def _mk(self, spark, tmp_path):
        from timefusion_spark.storage.schema import load_schema_text
        from timefusion_spark.storage.table import Table

        register_sources(spark)
        tbl = Table.create(spark, load_schema_text(self.YAML), str(tmp_path / "t"))
        rows = spark.createDataFrame(
            [
                ("2026-01-01 10:00:00", "a", 1.0, "p1"),
                ("2026-01-02 09:00:00", "c", 3.0, "p2"),
            ],
            "timestamp string, id string, value double, project_id string",
        )
        tbl.append(rows)
        return tbl

    def _drain(self, spark, tbl, out, ckpt):
        q = (
            spark.readStream.format("tf_changes")
            .option("path", tbl.path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    def test_stream_equals_batch_change_feed(self, spark, tmp_path):
        from timefusion_spark.storage import dml
        from pyspark.sql import functions as F

        tbl = self._mk(spark, tmp_path)
        dml.update(tbl, {"value": F.col("value") * 10}, predicate="id='a'",
                   stamp="2026-01-02 00:00:00")
        dml.delete(tbl, predicate="id='c'", stamp="2026-01-03 00:00:00")
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._drain(spark, tbl, out, ckpt)
        cols = ["id", "value", "_commit_version", "_change_type"]
        got = spark.read.parquet(out).select(*cols).orderBy("_commit_version", "id")
        want = tbl.read_changes(0).select(*cols).orderBy("_commit_version", "id")
        assert got.collect() == want.collect()

    def test_checkpoint_resume_sees_only_new_commits(self, spark, tmp_path):
        from timefusion_spark.storage import dml

        tbl = self._mk(spark, tmp_path)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._drain(spark, tbl, out, ckpt)             # drains v1
        n1 = spark.read.parquet(out).count()
        dml.delete(tbl, predicate="id='a'", stamp="2026-01-02 00:00:00")  # v2
        self._drain(spark, tbl, out, ckpt)             # resumes from ckpt
        rows = spark.read.parquet(out).collect()
        assert len(rows) == n1 + 1                     # exactly the new tombstone
        new = [r for r in rows if r["_commit_version"] == 2]
        assert [(r["id"], r["_change_type"]) for r in new] == [("a", "delete")]


class TestChangeFeedBackpressure(TestChangeFeedSource):
    def test_max_versions_bounds_steady_state_advance(self, spark, tmp_path):
        """maxVersionsPerTrigger caps how far successive polls advance: the
        first poll is the uncapped catch-up (Spark asks for the latest
        offset before revealing the committed start, so a lower answer
        would plan a backward batch), every later poll moves at most K
        commits past the furthest offset already handed out."""
        from timefusion_spark.sources.changefeed import _ChangeFeedStreamReader
        from timefusion_spark.storage import dml

        tbl = self._mk(spark, tmp_path)                 # commits v0 (create) + v1
        reader = _ChangeFeedStreamReader(
            {"path": tbl.path, "maxVersionsPerTrigger": "1"}
        )
        assert reader.latestOffset()["version"] == 1    # catch-up to tip
        for i, vid in enumerate(("a", "c")):
            dml.delete(tbl, predicate=f"id='{vid}'",
                       stamp=f"2026-01-0{2+i} 00:00:00")  # v2, v3
        assert reader.latestOffset()["version"] == 2    # +1, not tip (3)
        assert reader.latestOffset()["version"] == 3    # +1 → tip
        assert reader.latestOffset()["version"] == 3    # at tip, stays

    def test_uncapped_reader_tracks_tip(self, spark, tmp_path):
        from timefusion_spark.sources.changefeed import _ChangeFeedStreamReader

        tbl = self._mk(spark, tmp_path)
        reader = _ChangeFeedStreamReader({"path": tbl.path})
        assert reader.latestOffset()["version"] == 1

    def test_first_poll_gates_pending_group(self, spark, tmp_path):
        """The pending-group cap must hold on the FIRST poll of a
        (re)started reader too: skipping the gate there lets the
        checkpoint advance past a still-pending commit, whose rows then
        never appear in the feed after its group publishes — silent
        loss. A commit pending at restart is always above the committed
        checkpoint (steady-state polls never advance past one), so the
        cap cannot plan a backward batch."""
        from timefusion_spark.sources.changefeed import _ChangeFeedStreamReader
        from timefusion_spark.storage.commitlog import CommitGroup

        tbl = self._mk(spark, tmp_path)                 # v0 create + v1 append
        g = CommitGroup(str(tmp_path / "groups"))
        rows = spark.createDataFrame(
            [("2026-01-03 10:00:00", "x", 9.0, "p1")],
            "timestamp string, id string, value double, project_id string",
        )
        tbl.append(rows, group=g)                       # v2, PENDING
        reader = _ChangeFeedStreamReader({"path": tbl.path})  # fresh reader
        assert reader.latestOffset()["version"] == 1    # capped below v2
        g.publish()
        assert reader.latestOffset()["version"] == 2    # published → advances
        parts = reader.partitions({"version": 1}, {"version": 2})
        assert any(getattr(p, "version", None) == 2 for p in parts)


class TestChangeFeedPartitionEscaping(TestChangeFeedSource):
    def test_escaped_and_null_partition_values(self, spark, tmp_path):
        """Partition values are Hive-escaped in dir names ('a:b' →
        'a%3Ab') and NULL writes the sentinel dir: the stream must emit
        the same values as the batch read — not the escaped text, and
        not crash casting the sentinel."""
        from timefusion_spark.storage.schema import load_schema_text
        from timefusion_spark.storage.table import Table

        register_sources(spark)
        tbl = Table.create(spark, load_schema_text(self.YAML), str(tmp_path / "t"))
        tbl.append(
            spark.createDataFrame(
                [
                    ("2026-01-01 10:00:00", "e1", 1.0, "a:b"),
                    ("2026-01-01 11:00:00", "e2", 2.0, None),
                ],
                "timestamp string, id string, value double, project_id string",
            )
        )
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._drain(spark, tbl, out, ckpt)
        got = {
            (r["id"], r["project_id"])
            for r in spark.read.parquet(out).select("id", "project_id").collect()
        }
        assert got == {("e1", "a:b"), ("e2", None)}


class TestChangeFeedSchemaWidening(TestChangeFeedSource):
    def test_feed_reads_files_predating_migrate_columns(self, spark, tmp_path):
        """Files written before a migrate_columns widening lack the new
        column; the feed must fill typed NULLs (the batch read path's
        parquet missing-column semantics), not crash in the Arrow
        reader."""
        from timefusion_spark.storage import maintenance
        from timefusion_spark.storage.schema import FieldDef

        tbl = self._mk(spark, tmp_path)                 # v1, pre-widening
        maintenance.migrate_columns(tbl, [FieldDef("note", "Utf8", nullable=True)])
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._drain(spark, tbl, out, ckpt)
        got = spark.read.parquet(out)
        assert got.count() == 2
        assert got.where("note IS NULL").count() == 2


class TestChangeFeedPartitionTypes:
    """Partition constants reconstructed from k=v dir segments must cast
    through the DECLARED arrow type — an Int32-partitioned table's stream
    schema would otherwise mismatch (string arrays vs int column)."""

    YAML = """
table_name: t
partitions: [bucket]
time_column: timestamp
fields:
  - {name: bucket, data_type: Int32, nullable: false}
  - {name: timestamp, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: false}
  - {name: id, data_type: Utf8, nullable: false}
  - {name: value, data_type: Float64, nullable: true}
"""

    def test_int_partition_streams_typed(self, spark, tmp_path):
        from timefusion_spark.storage.schema import load_schema_text
        from timefusion_spark.storage.table import Table

        register_sources(spark)
        tbl = Table.create(spark, load_schema_text(self.YAML), str(tmp_path / "t"))
        rows = spark.createDataFrame(
            [(7, "2026-01-01 10:00:00", "a", 1.0), (9, "2026-01-01 11:00:00", "b", 2.0)],
            "bucket int, timestamp string, id string, value double",
        )
        tbl.append(rows)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        q = (
            spark.readStream.format("tf_changes")
            .option("path", tbl.path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        got = spark.read.parquet(out)
        assert got.schema["bucket"].dataType.typeName() == "integer"
        assert sorted(r["bucket"] for r in got.select("bucket").collect()) == [7, 9]

    def test_variant_table_streams(self, spark, tmp_path):
        """tf_changes over a Variant-typed table (the flagship otel schema
        carries 7 Variant columns — the reference's WAL tail serves them,
        wal.rs:142-160): the engine stores Variant UNSHREDDED and the
        stream worker decodes the (value, metadata) binary pair via
        DuckDB, so the drained stream's variant values must equal the
        batch change feed's — including SQL NULL variants."""
        from pyspark.sql import functions as F

        from timefusion_spark.storage import Table, load_schema
        import os as _os

        register_sources(spark)
        schema_path = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "timefusion_spark", "schemas", "otel_logs_and_spans.yaml",
        )
        tbl = Table.create(spark, load_schema(schema_path), str(tmp_path / "otel"))
        rows = spark.createDataFrame(
            [
                ("1", "2026-01-01 10:00:00", "a", "p1", '{"k": 7, "s": "x"}'),
                ("2", "2026-01-01 11:00:00", "b", "p1", '{"k": 9}'),
                ("3", "2026-01-02 09:00:00", "c", "p2", None),
            ],
            "id string, timestamp string, name string, project_id string, attributes string",
        ).withColumn("summary", F.array(F.col("name")))
        tbl.append(rows, stamp="2026-01-03 00:00:00")
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        q = (
            spark.readStream.format("tf_changes")
            .option("path", tbl.path)
            .load()
            .select(
                "id",
                F.expr("variant_get(attributes, '$.k', 'int')").alias("k"),
                F.expr("to_json(attributes)").alias("j"),
                F.col("attributes").isNull().alias("attr_null"),
                "_commit_version",
                "_change_type",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        got = {r["id"]: r for r in spark.read.parquet(out).collect()}
        assert len(got) == 3
        assert got["1"]["k"] == 7 and got["1"]["j"] == '{"k":7,"s":"x"}'
        assert got["2"]["k"] == 9
        assert got["3"]["attr_null"] and got["3"]["j"] is None
        assert all(r["_change_type"] == "upsert" for r in got.values())


class TestEventGenOffsetHardening:
    """Review r11: the generator's per-instance head restarts at 0 with
    the process — after a checkpoint restart it must never hand Spark an
    offset below the committed one, nor replay rows below the floor."""

    def test_batch_n_zero_yields_empty_frame(self, spark):
        from timefusion_spark.sources.eventgen import register_sources

        register_sources(spark)
        df = spark.read.format("eventgen").option("n", 0).load()
        assert df.count() == 0

    def test_backward_offset_is_clamped_not_replayed(self):
        from timefusion_spark.sources.eventgen import _StreamReader

        r = _StreamReader({"n": 1000, "rowsPerBatch": 250})
        # restart scenario: committed offset 500, fresh instance head 0
        parts = r.partitions({"index": 500}, {"index": 250})
        assert [(p.start, p.end) for p in parts] == [(500, 500)]  # empty
        # the floor now pins the head at or above the committed offset
        assert r.latestOffset()["index"] >= 500
        # even if the offset log regressed, planned ranges never re-emit
        # rows below the floor
        parts = r.partitions({"index": 250}, {"index": 750})
        assert min(p.start for p in parts) >= 500

    def test_commit_advances_floor(self):
        from timefusion_spark.sources.eventgen import _StreamReader

        r = _StreamReader({"n": 1000, "rowsPerBatch": 250})
        r.commit({"index": 400})
        parts = r.partitions({"index": 250}, {"index": 600})
        assert min(p.start for p in parts) >= 400

    def test_head_resumes_from_floor_after_restart_seed(self):
        """ADVICE r11 #4: after the restart re-plan seeds the floor
        (partitions(restored, restored) precedes the fresh instance's
        first latestOffset — verified live on Spark 4.1.2), the next poll
        must advance PAST the floor immediately, not stall replaying
        per_batch-sized sub-floor heads."""
        from timefusion_spark.sources.eventgen import _StreamReader

        r = _StreamReader({"n": 10_000, "rowsPerBatch": 100})
        r.partitions({"index": 400}, {"index": 400})  # restart re-plan
        assert r.latestOffset()["index"] == 500  # floor + per_batch

    def test_checkpoint_restart_no_duplicates_and_monotone_offsets(
        self, spark, tmp_path
    ):
        """End-to-end ADVICE r11 #4 pin: stop a checkpointed eventgen
        stream mid-feed and restart it with a FRESH reader instance —
        the stream must advance, emit zero duplicate event_ids, and the
        offset log must never record a regressed batch end (the replay
        window the per-instance head could otherwise open)."""
        import glob
        import json
        import os

        from timefusion_spark.sources.eventgen import register_sources

        register_sources(spark)
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run_until(target_rows: int) -> None:
            q = (
                spark.readStream.format("eventgen")
                .option("n", 100_000)
                .option("rowsPerBatch", 50)
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(processingTime="0 seconds")
                .start()
            )
            try:
                deadline = time.time() + 120
                while time.time() < deadline:
                    try:
                        if spark.read.parquet(out).count() >= target_rows:
                            break
                    except Exception:
                        pass
                    time.sleep(1)
            finally:
                q.stop()

        run_until(150)
        n1 = spark.read.parquet(out).count()
        run_until(n1 + 150)  # fresh _StreamReader, same checkpoint
        res = spark.read.parquet(out)
        assert res.count() > n1  # advanced past the restart
        assert (
            res.groupBy("event_id").count().where("count > 1").count() == 0
        )  # zero replays across the restart
        # the offset log is monotone: no batch end below a predecessor's
        ends = []
        for f in sorted(
            glob.glob(os.path.join(ckpt, "offsets", "*")),
            key=lambda p: int(os.path.basename(p)),
        ):
            if not os.path.basename(f).isdigit():
                continue
            with open(f) as fh:
                last = fh.read().strip().splitlines()[-1]
            ends.append(json.loads(last)["index"])
        assert ends == sorted(ends), ends
