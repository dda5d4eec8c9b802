"""Arrow-IPC bulk-ingest network listener — the gRPC ingest endpoint analog.

The reference's fourth entry point is a network ingest socket
(proto/timefusion.proto:12-33 WriteRequest/Ack, grpc_handlers.rs:1-110):
clients stream record batches and the server acks each one AFTER it is
durable, with the ack sequence number doubling as flow control (a client
bounds its in-flight window by unacked batches) and as the redelivery
watermark (a reconnecting client resends from the last acked seq).

This module is that endpoint over the public Arrow IPC stream format on a
plain TCP socket — no gRPC dependency, same contract:

  client → server:  u32 header_len, header JSON
                      {"table": str, "app_id": str|absent,
                       "start_seq": int|absent,
                       "token": str|absent — required and compared
                        constant-time when the server was started with a
                        shared token (the reference's GRPC_TOKEN bearer
                        check, main.rs:457-459)}
                    then one standard Arrow IPC stream
                    (schema message, record batches, end-of-stream)
  server → client:  after the header   b"W" + u64 watermark
                      (highest durable seq for app_id; 0 when none /
                       no app_id — the client's resume point)
                    per durable batch  b"A" + u64 seq   (1-based)
                    at end-of-stream   b"F" + u64 total_rows
                    on error           b"E" + u32 len + utf8 message

  Sequence numbering on reconnect: with an app_id and no explicit
  `start_seq`, the FIRST batch of the connection is numbered
  watermark+1 — so a client that resumes past its last ack (sending
  only the unacked batches, the documented contract) has them numbered
  and committed correctly. A client that instead replays its WHOLE
  stream declares `"start_seq": 1`; batches numbered at or below the
  watermark are then skipped by the commit log's txn watermark, not
  duplicated. Either way ack == durable for every acked seq.

- Each record batch lands through the table's FULL write path
  (`Table.append`: coerce → stamp → LWW dedup → sorted partitioned write)
  as ONE atomic commit, and the ack is sent only after the commit —
  ack == durable, exactly the reference's contract.
- With a non-empty `app_id`, every batch commits with
  txn=(app_id, seq): a batch re-sent after a reconnect (client resumes
  past its last ack) is detected by the commit log's txn watermark and
  skipped — the WAL-watermark idempotence the gRPC path gets from
  buffered_write_layer.rs:2211.
- Backpressure: the server reads, converts and commits one batch at a
  time off the socket, so a fast client is paced by the TCP receive
  window plus its own ack window — the seq-acked flow-control shape of
  grpc_handlers.rs:24-27 without a custom credit scheme.

Scale shape: this is the INGEST FRONT DOOR, not a query operator — one
driver-side batch at a time is converted via Arrow and written through
the same partitioned writer as every other path, so file layout, dedup
and sort order are identical to batch/streaming/COPY ingest.
"""

from __future__ import annotations

import contextlib
import json
import socketserver
import struct
import threading


class WriteFenced(Exception):
    """Raised by a writer_guard when the deploy-handoff fence refuses
    admission — the handler maps it to the reconnect-and-resume error."""


class _IngestHandler(socketserver.BaseRequestHandler):
    def handle(self) -> None:  # noqa: C901 — the protocol loop
        try:
            self._serve()
        except (ConnectionError, OSError):
            pass  # client went away; everything acked is durable

    def _send_error(self, message: str) -> None:
        # UTF-8-safe truncation: a byte slice can split a multibyte
        # character and ship invalid UTF-8 in the documented utf8 frame
        # (review r12)
        data = (
            message.encode("utf-8")[:2000].decode("utf-8", "ignore").encode("utf-8")
        )
        try:
            self.request.sendall(b"E" + struct.pack("!I", len(data)) + data)
            # Half-close and drain briefly: closing with unread inbound
            # bytes (a client streaming ahead) makes the kernel RST the
            # connection, destroying the just-sent error frame before the
            # client reads it (review r12).
            import socket as _socket

            self.request.shutdown(_socket.SHUT_WR)
            self.request.settimeout(1.0)
            for _ in range(64):
                if not self.request.recv(1 << 16):
                    break
        except OSError:
            pass

    def _recv_exact(self, n: int) -> bytes:
        # bytearray accumulation: bytes += chunk re-copies the whole
        # buffer per recv (O(n²) for large frames)
        data = bytearray()
        while len(data) < n:
            chunk = self.request.recv(n - len(data))
            if not chunk:
                raise ConnectionError("client closed")
            data += chunk
        return bytes(data)

    # a JSON ingest header is tiny; the length field is attacker-
    # controlled and read BEFORE the token check, so an unauthenticated
    # client declaring 4 GiB must be refused, not buffered (review r11)
    MAX_HEADER_BYTES = 1 << 20

    def _serve(self) -> None:
        import pyarrow.ipc as ipc

        (hlen,) = struct.unpack("!I", self._recv_exact(4))
        if hlen > self.MAX_HEADER_BYTES:
            self._send_error(f"ingest header too large: {hlen} bytes")
            return
        try:
            header = json.loads(self._recv_exact(hlen).decode("utf-8"))
            if not isinstance(header, dict):
                raise ValueError(f"header must be a JSON object, got {type(header).__name__}")
            name = header["table"]
        except (ValueError, KeyError) as e:
            self._send_error(f"bad ingest header: {e}")
            return
        required = self.server.token
        if required is not None:
            # shared-token auth — the reference's gRPC bearer-token check
            # (main.rs:457-459 GRPC_TOKEN, grpc_handlers.rs Authorization
            # header compare): refused BEFORE any table/stream processing;
            # constant-time compare so the open port leaks nothing
            import hmac

            given = header.get("token")
            if not isinstance(given, str) or not hmac.compare_digest(
                given.encode(), required.encode()
            ):
                self._send_error("ingest authentication failed: bad token")
                return
        if not self.server.admit_fn():
            # deploy-handoff fence (buffered_write_layer.rs accepting_writes
            # gate): bulk ingest is refused while the pgwire HANDOFF lease
            # holds; the client reconnects against the replacement process
            self._send_error(
                "write admission is fenced for deploy handoff; reconnect later"
            )
            return
        tables = self.server.tables_fn()
        tbl = tables.get(name)
        if tbl is None:
            self._send_error(f"unknown table {name!r}")
            return
        app_id = header.get("app_id") or None

        # Resume point: highest durable seq for this app_id (0 when
        # none). Sent to the client so a reconnect can resume past its
        # last ack; also the default numbering base for this connection.
        watermark = 0
        if app_id and tbl.log.exists():
            with self.server.lock:
                watermark = max(tbl.log.txn_version(app_id), 0)
        try:
            start_seq = int(header.get("start_seq", watermark + 1))
        except (TypeError, ValueError):
            self._send_error(f"bad start_seq {header.get('start_seq')!r}")
            return
        if start_seq < 1:
            self._send_error(f"start_seq must be >= 1, got {start_seq}")
            return
        if start_seq >= 1 << 63:
            # refuse BEFORE anything commits: a huge seq fits Python ints
            # and JSON, so the append would land durably and only the
            # u64 ack pack would raise — permanently poisoning the
            # app_id's txn watermark (every later connection crashes
            # packing it, every sane-seq batch is skipped-but-acked)
            # (review r12)
            self._send_error(f"start_seq too large: {start_seq}")
            return
        self.request.sendall(b"W" + struct.pack("!Q", watermark))

        rfile = self.request.makefile("rb")
        try:
            try:
                reader = ipc.open_stream(rfile)
            except Exception as e:  # noqa: BLE001 — bad stream header
                self._send_error(f"invalid Arrow IPC stream: {e}")
                return
            seq = start_seq - 1
            total = 0
            while True:
                try:
                    batch = reader.read_next_batch()
                except StopIteration:
                    break
                except Exception as e:  # noqa: BLE001 — torn stream
                    self._send_error(f"Arrow stream error after seq {seq}: {e}")
                    return
                seq += 1
                if batch.num_rows == 0:
                    # legal in the IPC format (schema-only / heartbeat
                    # flush); createDataFrame cannot infer types from a
                    # 0-row object-dtype frame and would abort the whole
                    # stream for a batch that carries nothing — skip the
                    # append but still ack so the client's seq bookkeeping
                    # stays aligned (review r12)
                    self.request.sendall(b"A" + struct.pack("!Q", seq))
                    continue
                try:
                    # writer_guard: atomically (under the pgwire server's
                    # lock when wired through PgWireServer) checks the
                    # deploy fence AND registers this batch's commit as an
                    # admitted writer for its duration — HANDOFF's drain
                    # waits for in-flight ingest commits instead of reading
                    # rows_after while a tbl.append is still publishing
                    # (the reference's admit_write active-write guard,
                    # buffered_write_layer.rs wait_for_active_writes).
                    # A fence raised MID-STREAM stops before this batch
                    # commits: everything acked is durable, the unacked
                    # tail is exactly what the client resends to the
                    # replacement process.
                    with self.server.writer_guard():
                        pdf = batch.to_pandas()
                        df = self.server.spark.createDataFrame(pdf)
                        with self.server.lock:
                            # txn watermark: a resent batch (reconnect
                            # replay) is skipped, not duplicated
                            tbl.append(
                                df, txn=(app_id, seq) if app_id else None
                            )
                except WriteFenced:
                    self._send_error(
                        f"write admission fenced for deploy handoff before "
                        f"seq {seq}; reconnect and resume past your last ack"
                    )
                    return
                except Exception as e:  # noqa: BLE001 — commit failed: NOT acked
                    self._send_error(f"append failed at seq {seq}: {e}")
                    return
                total += batch.num_rows
                # ack AFTER the atomic commit: ack == durable
                self.request.sendall(b"A" + struct.pack("!Q", seq))
            self.request.sendall(b"F" + struct.pack("!Q", total))
        finally:
            rfile.close()


class _IngestTCPServer(socketserver.ThreadingMixIn, socketserver.TCPServer):
    allow_reuse_address = True
    daemon_threads = True


class ArrowIngestServer:
    """Listen for Arrow-IPC ingest streams and commit them batch-by-batch.

    `tables` may be a dict (name → storage Table) or a callable returning
    one — pass a PgWireServer runner's live registry so tables created
    over the wire are immediately ingestable.

    >>> srv = ArrowIngestServer(spark, runner.tables).start()
    >>> # client: see tests/test_ingest_server.py::_send_stream
    >>> srv.stop()
    """

    def __init__(
        self,
        spark,
        tables,
        host: str = "127.0.0.1",
        port: int = 0,
        admit=None,
        writer_guard=None,
        token=None,
    ):
        self._server = _IngestTCPServer((host, port), _IngestHandler)
        self._server.spark = spark
        # shared-token auth (reference GRPC_TOKEN): None = open — embedded
        # or test posture; the CLI requires a token unless --insecure-auth
        self._server.token = token
        self._server.tables_fn = tables if callable(tables) else (lambda: tables)
        # write-admission gate (deploy handoff): a callable returning False
        # while new ingest streams must be refused; default always-open
        admit_fn = admit if admit is not None else (lambda: True)
        self._server.admit_fn = admit_fn

        # per-batch admitted-writer guard: a contextmanager factory that
        # fence-checks AND registers the in-flight commit so a concurrent
        # HANDOFF drain waits for it (PgWireServer wires this to its
        # open_txns registry under its own lock). The default guard
        # fence-checks via admit_fn without registration — correct for a
        # standalone listener with no handoff coordinator.
        @contextlib.contextmanager
        def _default_guard():
            if not admit_fn():
                raise WriteFenced()
            yield

        self._server.writer_guard = (
            writer_guard if writer_guard is not None else _default_guard
        )
        self._server.lock = threading.Lock()
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> "ArrowIngestServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="tf-arrow-ingest", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        # shutdown() blocks on an event only serve_forever() sets — a
        # stop() before start() (cleanup after a partial bring-up) would
        # hang forever (review r12)
        if self._thread is not None:
            self._server.shutdown()
        self._server.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
