"""Arrow-IPC ingest listener: the gRPC ingest-endpoint analog
(proto/timefusion.proto:12-33, grpc_handlers.rs:1-110) — seq-acked
batches, ack-after-durable, txn-watermark replay idempotence."""

from __future__ import annotations

import json
import socket
import struct

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from timefusion_spark.ingest_server import ArrowIngestServer
from timefusion_spark.storage import Table, load_schema_text

YAML = """
table_name: ing_t
partitions: [project_id]
time_column: timestamp
sorting_columns:
  - {name: timestamp, descending: true, nulls_first: true}
fields:
  - {name: timestamp, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: false}
  - {name: id, data_type: Utf8, nullable: false}
  - {name: value, data_type: Float64, nullable: true}
  - {name: project_id, data_type: Utf8, nullable: true}
"""


def _batch(lo: int, hi: int) -> pa.RecordBatch:
    return pa.RecordBatch.from_pydict(
        {
            "timestamp": [f"2026-01-01 10:{i % 60:02d}:00" for i in range(lo, hi)],
            "id": [f"r{i}" for i in range(lo, hi)],
            "value": [float(i) for i in range(lo, hi)],
            "project_id": ["p1" for _ in range(lo, hi)],
        }
    )


class _SockSink:
    """File-like over a socket for pyarrow's stream writer."""

    closed = False

    def __init__(self, sock):
        self.sock = sock

    def write(self, data) -> int:
        self.sock.sendall(data)
        return len(data)

    def writable(self) -> bool:
        return True

    def readable(self) -> bool:
        return False

    def seekable(self) -> bool:
        return False

    def tell(self) -> int:
        return 0

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass


def _recv_exact(sock, n: int) -> bytes:
    data = b""
    while len(data) < n:
        chunk = sock.recv(n - len(data))
        assert chunk, "server closed"
        data += chunk
    return data


def _read_frame(sock):
    tag = _recv_exact(sock, 1)
    if tag in (b"A", b"F", b"W"):
        return tag, struct.unpack("!Q", _recv_exact(sock, 8))[0]
    assert tag == b"E", tag
    (ln,) = struct.unpack("!I", _recv_exact(sock, 4))
    return tag, _recv_exact(sock, ln).decode()


def _send_stream(port, table, batches, app_id=None, start_seq=None):
    """Drive the protocol with a per-batch ack window of 1 (strictest
    backpressure): send a batch, wait for its durable ack. Returns
    (acks, final_frame)."""
    sock = socket.create_connection(("127.0.0.1", port), timeout=120)
    header = json.dumps(
        {
            "table": table,
            **({"app_id": app_id} if app_id else {}),
            **({"start_seq": start_seq} if start_seq is not None else {}),
        }
    ).encode()
    sock.sendall(struct.pack("!I", len(header)) + header)
    acks = []
    final = None
    try:
        tag, _watermark = _read_frame(sock)
        if tag == b"E":
            return acks, (tag, _watermark)
        assert tag == b"W"
        writer = ipc.new_stream(_SockSink(sock), batches[0].schema)
        for b in batches:
            writer.write_batch(b)
            tag, val = _read_frame(sock)
            if tag == b"E":
                return acks, (tag, val)
            assert tag == b"A"
            acks.append(val)
        writer.close()  # end-of-stream marker
        final = _read_frame(sock)
    finally:
        sock.close()
    return acks, final


@pytest.fixture()
def table(spark, tmp_path):
    return Table.create(spark, load_schema_text(YAML), str(tmp_path / "ing_t"))


@pytest.fixture()
def srv(spark, table):
    s = ArrowIngestServer(spark, {"ing_t": table}).start()
    yield s
    s.stop()


def test_admission_gate_refuses_new_streams(spark, table):
    """The deploy-handoff write fence covers bulk ingest: while the admit
    callable returns False, a new ingest stream is refused up front with
    a clear admission error; reopening admits again."""
    fenced = {"on": True}
    s = ArrowIngestServer(spark, {"ing_t": table}, admit=lambda: not fenced["on"]).start()
    try:
        acks, final = _send_stream(s.port, "ing_t", [_batch(0, 5)], app_id="gate")
        assert acks == []
        assert final[0] == b"E" and "fenced" in str(final[1])
        fenced["on"] = False
        acks, final = _send_stream(s.port, "ing_t", [_batch(0, 5)], app_id="gate")
        assert acks == [1] and final == (b"F", 5)
    finally:
        s.stop()


def test_fence_mid_stream_cuts_before_commit_and_resume_works(spark, table):
    """The fence raised while a stream is in flight stops it BEFORE the
    next batch commits: acked batches stay durable, the unacked tail is
    refused, and a post-reopen reconnect resumes past the last ack — the
    deploy-handoff story for bulk ingest."""
    import socket as _socket
    import struct as _struct

    import pyarrow.ipc as ipc

    fenced = {"on": False}
    s = ArrowIngestServer(spark, {"ing_t": table}, admit=lambda: not fenced["on"]).start()
    try:
        sock = _socket.create_connection(("127.0.0.1", s.port), timeout=120)
        header = json.dumps({"table": "ing_t", "app_id": "cutter"}).encode()
        sock.sendall(_struct.pack("!I", len(header)) + header)
        tag, _w = _read_frame(sock)
        assert tag == b"W"
        b1, b2 = _batch(0, 10), _batch(10, 25)
        writer = ipc.new_stream(_SockSink(sock), b1.schema)
        writer.write_batch(b1)
        tag, val = _read_frame(sock)
        assert (tag, val) == (b"A", 1)  # first batch durable
        fenced["on"] = True  # deploy handoff raises the fence mid-stream
        writer.write_batch(b2)
        tag, val = _read_frame(sock)
        assert tag == b"E" and "fenced" in str(val)
        sock.close()
        # acked data durable, the refused batch NOT committed
        assert table.read().count() == 10
        # reopen + reconnect: the watermark points past the last ack and
        # the resent tail lands exactly once
        fenced["on"] = False
        acks, final = _send_stream(s.port, "ing_t", [b2], app_id="cutter")
        assert acks == [2] and final == (b"F", 15)
        assert table.read().count() == 25
    finally:
        s.stop()


def test_batches_ack_after_durable(spark, table, srv):
    acks, final = _send_stream(
        srv.port, "ing_t", [_batch(0, 10), _batch(10, 25), _batch(25, 30)]
    )
    assert acks == [1, 2, 3]
    assert final == (b"F", 30)
    assert table.read().count() == 30
    # each acked batch was its own atomic commit (ack == durable)
    appends = [
        v
        for v in range(table.log.latest_version() + 1)
        if table.log.entry(v)["op"] == "append" and table.log.entry(v)["add"]
    ]
    assert len(appends) == 3
    vals = {r.id: r.value for r in table.read().collect()}
    assert vals["r7"] == 7.0 and vals["r29"] == 29.0


def test_reconnect_replay_is_idempotent(spark, table, srv):
    """A client resending from before its last ack (the reconnect story)
    must not duplicate rows: txn=(app_id, seq) watermarks skip replayed
    batches, exactly the WAL-watermark contract."""
    b1, b2, b3 = _batch(0, 10), _batch(10, 20), _batch(20, 30)
    acks, final = _send_stream(srv.port, "ing_t", [b1, b2], app_id="client-A")
    assert acks == [1, 2] and final == (b"F", 20)
    # reconnect: client conservatively resends everything plus new data —
    # a full replay declares start_seq=1 so replayed seqs fall at or
    # below the watermark and are skipped
    acks, final = _send_stream(
        srv.port, "ing_t", [b1, b2, b3], app_id="client-A", start_seq=1
    )
    assert acks == [1, 2, 3]
    assert table.read().count() == 30  # replays skipped, b3 landed once


def test_reconnect_resume_past_last_ack(spark, table, srv):
    """The documented reconnect contract: resume by sending ONLY the
    batches after the last ack. The server numbers the new connection's
    first batch watermark+1 (announced in the W frame), so resumed
    batches commit — they are not mistaken for replays."""
    b1, b2, b3 = _batch(0, 10), _batch(10, 20), _batch(20, 30)
    acks, final = _send_stream(srv.port, "ing_t", [b1, b2], app_id="client-B")
    assert acks == [1, 2] and final == (b"F", 20)
    # reconnect: the W frame reports watermark 2; send only b3
    sock = socket.create_connection(("127.0.0.1", srv.port), timeout=120)
    header = json.dumps({"table": "ing_t", "app_id": "client-B"}).encode()
    sock.sendall(struct.pack("!I", len(header)) + header)
    try:
        assert _read_frame(sock) == (b"W", 2)
        writer = ipc.new_stream(_SockSink(sock), b3.schema)
        writer.write_batch(b3)
        assert _read_frame(sock) == (b"A", 3)  # numbered watermark+1
        writer.close()
        assert _read_frame(sock) == (b"F", 10)
    finally:
        sock.close()
    assert table.read().count() == 30  # b3 landed exactly once
    assert table.log.txn_version("client-B") == 3


def test_unknown_table_and_bad_header(spark, srv):
    sock = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
    header = json.dumps({"table": "nope"}).encode()
    sock.sendall(struct.pack("!I", len(header)) + header)
    tag, msg = _read_frame(sock)
    assert tag == b"E" and "unknown table" in msg
    sock.close()
    sock = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
    sock.sendall(struct.pack("!I", 3) + b"{{{")
    tag, msg = _read_frame(sock)
    assert tag == b"E" and "bad ingest header" in msg
    sock.close()


def test_failed_batch_not_acked_prior_batches_durable(spark, table, srv):
    bad = pa.RecordBatch.from_pydict(
        {
            "timestamp": ["2026-01-01 10:00:00", None],  # NULL in non-nullable
            "id": ["x1", "x2"],
            "value": [1.0, 2.0],
            "project_id": ["p1", "p1"],
        }
    )
    acks, final = _send_stream(srv.port, "ing_t", [_batch(0, 5), bad])
    assert acks == [1]  # first batch durable and acked
    assert final[0] == b"E" and "append failed at seq 2" in final[1]
    assert table.read().count() == 5  # the failed batch left nothing


def test_variant_table_ingest(spark, tmp_path):
    """The flagship otel shape carries Variant columns: JSON text sent
    over the Arrow socket parses ONCE at insert into the physical Variant
    binary (coerce path), so variant_get works on the ingested rows."""
    from pyspark.sql import functions as F

    yaml = """
table_name: var_t
partitions: [project_id]
time_column: timestamp
fields:
  - {name: timestamp, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: false}
  - {name: id, data_type: Utf8, nullable: false}
  - {name: attributes, data_type: Variant, nullable: true}
  - {name: project_id, data_type: Utf8, nullable: true}
"""
    tbl = Table.create(spark, load_schema_text(yaml), str(tmp_path / "var_t"))
    srv = ArrowIngestServer(spark, {"var_t": tbl}).start()
    try:
        batch = pa.RecordBatch.from_pydict(
            {
                "timestamp": ["2026-01-01 10:00:00"] * 3,
                "id": ["a", "b", "c"],
                "attributes": ['{"k": 7, "s": "x"}', None, "not json"],
                "project_id": ["p1"] * 3,
            }
        )
        acks, final = _send_stream(srv.port, "var_t", [batch])
        assert acks == [1] and final == (b"F", 3)
        got = {
            r.id: r.k
            for r in tbl.read()
            .select(
                "id",
                F.expr("variant_get(attributes, '$.k', 'int')").alias("k"),
            )
            .collect()
        }
        assert got == {"a": 7, "b": None, "c": None}
        # unparseable text degraded to a variant STRING, not a lost row
        [c_row] = (
            tbl.read()
            .where("id = 'c'")
            .select(F.expr("cast(attributes as string)").alias("s"))
            .collect()
        )
        assert "not json" in c_row.s
    finally:
        srv.stop()


def test_wire_created_table_is_ingestable_and_visible(spark, tmp_path):
    """End-to-end with the pgwire server: a table created over psql wire,
    bulk-ingested over the Arrow socket, is immediately visible to the
    next wire SELECT (refresh_stale)."""
    from timefusion_spark.server import PgWireServer

    from tests.test_server import WireClient, rows_of

    pg = PgWireServer(spark, base_dir=str(tmp_path / "d")).start()
    ing = ArrowIngestServer(spark, pg._server.runner.tables).start()
    try:
        c = WireClient(pg.port)
        c.startup()
        c.query(
            "CREATE TABLE wa_t (timestamp TIMESTAMP, id TEXT, value DOUBLE, "
            "project_id TEXT)"
        )
        acks, final = _send_stream(ing.port, "wa_t", [_batch(0, 40)])
        assert acks == [1] and final == (b"F", 40)
        assert rows_of(c.query("SELECT count(*) AS n FROM wa_t")) == [["40"]]
        c.query("DROP TABLE wa_t")
        c.close()
    finally:
        ing.stop()
        pg.stop()


def test_handoff_waits_for_inflight_arrow_batch(spark, tmp_path):
    """An Arrow batch whose append passed admission before HANDOFF's
    fence went up is an admitted writer: the drain must wait for its
    commit, and its rows must be INSIDE the drained-row tag — never
    published after the count was reported (the reference's admit_write
    active-write guard, buffered_write_layer.rs wait_for_active_writes;
    ADVICE r9 medium)."""
    import threading
    import time

    from test_server import WireClient, command_tags
    from timefusion_spark.server import PgWireServer

    srv = PgWireServer(
        spark,
        base_dir=str(tmp_path / "hoa_data"),
        arrow_port=0,
        handoff_lease_s=60.0,
    ).start()
    c = WireClient(srv.port)
    c.startup()
    tbl = None
    real_append = None
    try:
        c.query(
            "CREATE TABLE aht (ts TIMESTAMP, id TEXT, val DOUBLE, project_id TEXT)"
        )
        tbl = srv._server.runner.tables["aht"]
        real_append = tbl.append
        entered = threading.Event()
        release = threading.Event()

        def slow_append(df, **kw):
            entered.set()
            if not release.wait(60):
                raise TimeoutError("test never released the stalled append")
            return real_append(df, **kw)

        tbl.append = slow_append
        res: dict = {}

        def send():
            res["stream"] = _send_stream(
                srv.arrow_port,
                "aht",
                [
                    pa.RecordBatch.from_pydict(
                        {
                            "ts": ["2026-01-01 10:00:00"],
                            "id": ["a1"],
                            "val": [1.0],
                            "project_id": ["p1"],
                        }
                    )
                ],
            )

        ts = threading.Thread(target=send, daemon=True)
        ts.start()
        assert entered.wait(60)  # the batch commit is in flight (registered)
        hres: dict = {}

        def handoff():
            hres["msgs"] = c.query("HANDOFF")

        th = threading.Thread(target=handoff, daemon=True)
        th.start()
        time.sleep(1.0)
        assert th.is_alive(), (
            "HANDOFF returned while an Arrow batch commit was in flight"
        )
        release.set()
        ts.join(timeout=120)
        th.join(timeout=120)
        assert not ts.is_alive() and not th.is_alive()
        acks, final = res["stream"]
        assert acks == [1] and final[0] == b"F"
        # the in-flight batch's row is INSIDE the drained count
        assert command_tags(hres["msgs"]) == ["HANDOFF 1"]
    finally:
        if tbl is not None and real_append is not None:
            tbl.append = real_append
        c.close()
        srv.stop()


def test_oversized_header_refused_before_buffering(spark, srv):
    """Review r11: the 4-byte header length is attacker-controlled and
    read before the token check — a declaration of 4 GiB must be refused
    immediately, not buffered into memory."""
    sock = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
    sock.sendall(struct.pack("!I", 0xFFFFFFFF))
    tag, msg = _read_frame(sock)
    assert tag == b"E" and "too large" in msg
    sock.close()


def test_zero_row_batch_acked_and_stream_continues(spark, table, srv):
    """review r12: an empty RecordBatch is legal IPC (schema-only /
    heartbeat flush) — it must be acked without aborting the stream, and
    the data batches around it still commit."""
    empty = _batch(0, 3).slice(0, 0)  # same schema, zero rows
    acks, final = _send_stream(
        srv.port, "ing_t", [_batch(0, 3), empty, _batch(3, 5)], app_id="zr"
    )
    assert acks == [1, 2, 3]
    assert final[0] == b"F" and final[1] == 5
    assert table.read().count() == 5


def test_oversized_start_seq_refused_before_commit(spark, table, srv):
    """review r12: a start_seq >= 2^63 must be refused BEFORE anything
    commits — it would land durably and poison the app_id's u64 txn
    watermark for every later connection."""
    acks, final = _send_stream(
        srv.port, "ing_t", [_batch(0, 2)], app_id="big", start_seq=2**64
    )
    assert acks == []
    assert final[0] == b"E" and "start_seq too large" in final[1]
    assert table.read().count() == 0
    # the app_id is NOT bricked: a sane stream still works
    acks, final = _send_stream(srv.port, "ing_t", [_batch(0, 2)], app_id="big")
    assert acks == [1]
    assert final[0] == b"F"


def test_non_object_header_gets_error_frame(spark, srv):
    """review r12: valid JSON that is not an object ('\"x\"', '[1]') must
    produce the bad-header error frame, not an uncaught TypeError."""
    for payload in (b'"x"', b"[1]"):
        sock = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        sock.sendall(struct.pack("!I", len(payload)) + payload)
        tag, msg = _read_frame(sock)
        assert tag == b"E" and "bad ingest header" in msg
        sock.close()


def test_stop_before_start_does_not_hang(spark, table):
    """review r12: TCPServer.shutdown() waits on an event only
    serve_forever() sets — stop() on a never-started server must return."""
    s = ArrowIngestServer(spark, {"ing_t": table})
    s.stop()  # must not block
