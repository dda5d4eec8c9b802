"""The `python -m timefusion_spark.maintain` CLI — main.rs verb analog."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from timefusion_spark.maintain import main
from timefusion_spark.storage import Table
from timefusion_spark.storage.schema import FieldDef, TableSchema


@pytest.fixture()
def store(spark, tmp_path):
    schema = TableSchema(
        table_name="cli_t",
        fields=[
            FieldDef("id", "Utf8", False),
            FieldDef("timestamp", 'Timestamp(Microsecond, Some("UTC"))', False),
            FieldDef("value", "Float64"),
            FieldDef("project_id", "Utf8", False),
            FieldDef("date", "Date32", False),
        ],
        partitions=["project_id", "date"],
        time_column="timestamp",
    )
    tbl = Table.create(spark, schema, str(tmp_path / "cli_t"))
    rows = spark.range(8).select(
        F.col("id").cast("string"),
        F.lit("2026-04-01 10:00:00").cast("timestamp").alias("timestamp"),
        (F.col("id") * 1.5).alias("value"),
        F.lit("p1").alias("project_id"),
    )
    tbl.append(rows)
    return str(tmp_path)


def test_stats_and_vacuum_and_optimize(store, capsys):
    assert main(["stats", "--base-dir", store, "--table", "cli_t"]) == 0
    out = capsys.readouterr().out
    assert "p1" in out and "\t" in out
    assert main(["optimize", "--base-dir", store]) == 0
    assert "cli_t: consolidated" in capsys.readouterr().out
    assert main(["vacuum", "--base-dir", store, "--retain-hours", "0"]) == 0
    assert "cli_t: removed" in capsys.readouterr().out


def test_migrate_columns_verb(spark, store, capsys):
    rc = main([
        "migrate-columns", "--base-dir", store, "--table", "cli_t",
        "score:Float64", "note:Utf8",
    ])
    assert rc == 0
    assert "7 columns" in capsys.readouterr().out
    tbl = Table.open(spark, os.path.join(store, "cli_t"))
    assert [f.name for f in tbl.schema.fields][-2:] == ["score", "note"]
    assert tbl.read().select("score").distinct().collect()[0][0] is None


def test_migrate_columns_rejects_empty_name_or_type(spark, store):
    """review r12: ':Float64' would persist a NAMELESS column into the
    schema sidecar (Spark allows StructField(''))."""
    import pytest as _pytest

    for bad in (":Float64", "score:", "score"):
        with _pytest.raises(SystemExit):
            main(["migrate-columns", "--base-dir", store, "--table", "cli_t", bad])


def test_redrive_dry_run_empty_quarantine(store, capsys):
    assert main(["redrive-dml", "--base-dir", store, "--dry-run"]) == 0
    assert "recovered=0 parked=0" in capsys.readouterr().out


def test_unknown_table_fails(store):
    with pytest.raises(SystemExit):
        main(["stats", "--base-dir", store, "--table", "nope"])


class TestHealthcheck:
    def test_ready_server(self, spark, tmp_path, capsys):
        from timefusion_spark.server import PgWireServer

        srv = PgWireServer(spark, base_dir=str(tmp_path / "hc")).start()
        try:
            assert main(["healthcheck", "--port", str(srv.port)]) == 0
            assert capsys.readouterr().out.strip() == "ok"
        finally:
            srv.stop()

    def test_dead_port_fails(self, capsys):
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()  # nothing listens here now
        assert main(["healthcheck", "--port", str(port)]) == 1
        assert "not reachable" in capsys.readouterr().err


class TestHandoffVerb:
    def test_drains_and_fences(self, spark, tmp_path, capsys):
        """`maintain handoff` is the deploy workflow's pre-SIGTERM step:
        it issues HANDOFF over the wire, prints the drained-row tag, and
        leaves the write fence held (a follow-up INSERT is refused)."""
        from timefusion_spark.server import PgWireServer

        srv = PgWireServer(
            spark, base_dir=str(tmp_path / "ho"), handoff_lease_s=60.0
        ).start()
        try:
            assert main(["handoff", "--port", str(srv.port)]) == 0
            assert capsys.readouterr().out.strip() == "HANDOFF 0"
            assert srv.write_fenced
        finally:
            srv.stop()

    def test_dead_port_fails(self, capsys):
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        assert main(["handoff", "--port", str(port)]) == 1
        assert "not reachable" in capsys.readouterr().err


class TestHandoffVerbAuth:
    def test_handoff_authenticates_with_password(self, spark, tmp_path, capsys):
        """Against a password-protected server the handoff verb completes
        the cleartext exchange; without credentials it fails cleanly."""
        from timefusion_spark.server import PgWireServer

        srv = PgWireServer(
            spark,
            base_dir=str(tmp_path / "hoauth"),
            handoff_lease_s=60.0,
            username="deployer",
            password="pw9",
        ).start()
        try:
            rc = main([
                "handoff", "--port", str(srv.port),
                "--user", "deployer", "--password", "pw9",
            ])
            assert rc == 0
            assert capsys.readouterr().out.strip() == "HANDOFF 0"
            assert srv.write_fenced
            # wrong password: the server answers FATAL 28P01 and closes —
            # the verb reports failure instead of hanging
            rc = main([
                "handoff", "--port", str(srv.port),
                "--user", "deployer", "--password", "nope",
            ])
            assert rc == 1
        finally:
            srv.stop()
