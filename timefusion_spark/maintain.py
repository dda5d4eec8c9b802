"""Operational maintenance CLI — the reference's `timefusion <verb>`
subcommand surface (main.rs:86-100: `optimize`, `migrate-columns`,
`redrive-dml`, plus the pgwire readiness healthcheck main.rs:124-148).

    python -m timefusion_spark.maintain optimize      --base-dir D [--table T] [--target-mb N]
    python -m timefusion_spark.maintain migrate-columns --base-dir D --table T col:type [...]
    python -m timefusion_spark.maintain redrive-dml   --base-dir D [--table T] [--dry-run]
    python -m timefusion_spark.maintain vacuum        --base-dir D [--table T] [--retain-hours H]
    python -m timefusion_spark.maintain stats         --base-dir D --table T
    python -m timefusion_spark.maintain healthcheck   [--host H] [--port P]
    python -m timefusion_spark.maintain handoff       [--host H] [--port P] [--timeout S] [--user U] [--password P]

Verbs that touch tables open them straight from the `_tf_schema.json`
sidecars under --base-dir (the same layout the pgwire server mounts);
`healthcheck` needs no Spark at all — it speaks just enough of the v3
protocol to prove a REAL handler answered (AuthenticationRequest 'R'),
exactly the reference's Docker readiness probe contract.
"""

from __future__ import annotations

import os
import sys


def _table_dirs(base_dir: str, table: str | None) -> list[str]:
    if table is not None:
        path = os.path.join(base_dir, table)
        if not os.path.exists(os.path.join(path, "_tf_schema.json")):
            raise SystemExit(f"no table {table!r} under {base_dir} (missing _tf_schema.json)")
        return [path]
    out = []
    for entry in sorted(os.listdir(base_dir)) if os.path.isdir(base_dir) else []:
        path = os.path.join(base_dir, entry)
        if os.path.exists(os.path.join(path, "_tf_schema.json")):
            out.append(path)
    if not out:
        raise SystemExit(f"no tables under {base_dir}")
    return out


def _open_tables(base_dir: str, table: str | None):
    from timefusion_spark.session import get_spark
    from timefusion_spark.storage import Table

    spark = get_spark()
    return [Table.open(spark, p) for p in _table_dirs(base_dir, table)]


def healthcheck(host: str, port: int, timeout: float = 0.75) -> int:
    """Send a startup message; a real handler answers AuthenticationOk
    ('R'). Anything else (or no listener) fails the probe."""
    import socket
    import struct

    body = b"user\x00timefusion_healthcheck\x00database\x00postgres\x00\x00"
    payload = struct.pack("!i", 196608) + body
    try:
        with socket.create_connection((host, port), timeout=timeout) as s:
            s.settimeout(timeout)
            s.sendall(struct.pack("!i", len(payload) + 4) + payload)
            tag = s.recv(1)
    except OSError as e:
        print(f"pgwire not reachable at {host}:{port}: {e}", file=sys.stderr)
        return 1
    if tag != b"R":
        print(
            f"pgwire bound but not ready (response tag {tag!r})", file=sys.stderr
        )
        return 1
    print("ok")
    return 0


def handoff(
    host: str,
    port: int,
    timeout: float = 300.0,
    user: str = "timefusion_deploy",
    password: str | None = None,
) -> int:
    """Issue the HANDOFF deploy-drain verb against a live server (the
    deploy workflow's pre-SIGTERM step, pgwire_handlers.rs:274-282): a
    minimal simple-protocol exchange — startup, `HANDOFF`, print the tag
    (`HANDOFF <rows>`) or the server's error. Exit 0 iff the drain
    succeeded (the fence is then held under its lease for the task
    replacement)."""
    import socket
    import struct

    body = b"user\x00" + user.encode() + b"\x00database\x00postgres\x00\x00"
    payload = struct.pack("!i", 196608) + body
    last_err: str | None = None
    try:
        with socket.create_connection((host, port), timeout=timeout) as s:
            s.settimeout(timeout)
            s.sendall(struct.pack("!i", len(payload) + 4) + payload)

            def recv_exact(n: int) -> bytes:
                data = b""
                while len(data) < n:
                    chunk = s.recv(n - len(data))
                    if not chunk:
                        raise ConnectionError("server closed")
                    data += chunk
                return data

            def msgs_until_ready():
                while True:
                    tag = recv_exact(1)
                    (ln,) = struct.unpack("!i", recv_exact(4))
                    pl = recv_exact(ln - 4)
                    yield tag, pl
                    if tag == b"Z":
                        return

            # startup burst; answer a cleartext-password request ('R'/3)
            # with --password when the server requires auth. A FATAL
            # ErrorResponse (e.g. 28P01 wrong password) arrives followed
            # by a close with NO ReadyForQuery — remember it so the
            # resulting ConnectionError reports the real cause instead of
            # "not reachable" (review r10).
            for tag, pl in msgs_until_ready():
                if tag == b"E":
                    last_err = pl.replace(b"\x00", b" ").decode("utf-8", "replace")
                if (
                    tag == b"R"
                    and len(pl) >= 4
                    and struct.unpack("!i", pl[:4])[0] == 3
                ):
                    pw = (password or "").encode() + b"\x00"
                    s.sendall(b"p" + struct.pack("!i", len(pw) + 4) + pw)
            q = b"HANDOFF\x00"
            s.sendall(b"Q" + struct.pack("!i", len(q) + 4) + q)
            result, err = None, None
            for tag, pl in msgs_until_ready():
                if tag == b"C":
                    result = pl.rstrip(b"\x00").decode()
                elif tag == b"E":
                    err = pl.replace(b"\x00", b" ").decode("utf-8", "replace")
                    # a server that errors THEN closes without ReadyForQuery
                    # raises ConnectionError next — report the real error,
                    # not "not reachable" (review r12; same fix as the
                    # startup loop, review r10)
                    last_err = err
    except OSError as e:
        if last_err is not None:
            print(f"HANDOFF refused by server: {last_err}", file=sys.stderr)
        else:
            print(f"pgwire not reachable at {host}:{port}: {e}", file=sys.stderr)
        return 1
    if err is not None or result is None:
        print(f"HANDOFF failed: {err or 'no completion tag'}", file=sys.stderr)
        return 1
    print(result)
    return 0


def main(argv: list[str] | None = None) -> int:
    import argparse

    parser = argparse.ArgumentParser(
        prog="python -m timefusion_spark.maintain",
        description="timefusion-spark maintenance verbs (main.rs CLI analog)",
    )
    sub = parser.add_subparsers(dest="verb", required=True)

    def common(p, need_table=False):
        p.add_argument("--base-dir", required=True, help="table-store root")
        p.add_argument("--table", required=need_table, default=None)

    p_opt = sub.add_parser("optimize", help="leveled small-file consolidation")
    common(p_opt)
    p_opt.add_argument("--target-mb", type=int, default=128)

    p_mig = sub.add_parser("migrate-columns", help="widen schema with nullable columns")
    common(p_mig, need_table=True)
    p_mig.add_argument("columns", nargs="+", metavar="col:type",
                       help="e.g. score:Float64 note:Utf8")

    p_red = sub.add_parser("redrive-dml", help="replay quarantined coalesced-DML groups")
    common(p_red)
    p_red.add_argument("--dry-run", action="store_true")

    p_vac = sub.add_parser("vacuum", help="drop unreferenced files older than the retention")
    common(p_vac)
    p_vac.add_argument("--retain-hours", type=float, default=0.0)

    p_st = sub.add_parser("stats", help="per-partition file/byte introspection")
    common(p_st, need_table=True)

    p_hc = sub.add_parser("healthcheck", help="pgwire readiness probe")
    p_hc.add_argument("--host", default="127.0.0.1")
    p_hc.add_argument("--port", type=int, default=5432)

    p_ho = sub.add_parser(
        "handoff", help="deploy drain: fence writes, settle the tail (pre-SIGTERM)"
    )
    p_ho.add_argument("--host", default="127.0.0.1")
    p_ho.add_argument("--port", type=int, default=5432)
    p_ho.add_argument("--timeout", type=float, default=300.0)
    # same default as handoff() — two sources of truth for the deploy
    # runbook's auth principal would desynchronize (review r12)
    p_ho.add_argument(
        "--user", default=os.environ.get("PGWIRE_USER", "timefusion_deploy")
    )
    p_ho.add_argument(
        "--password",
        default=os.environ.get("PGWIRE_PASSWORD") or None,
        help="pgwire password when the server requires auth "
        "(default $PGWIRE_PASSWORD)",
    )

    args = parser.parse_args(argv)

    if args.verb == "healthcheck":
        return healthcheck(args.host, args.port)
    if args.verb == "handoff":
        return handoff(
            args.host,
            args.port,
            timeout=args.timeout,
            user=args.user,
            password=args.password,
        )

    from timefusion_spark.storage import maintenance

    tables = _open_tables(args.base_dir, args.table)
    if args.verb == "optimize":
        for tbl in tables:
            written = maintenance.consolidate(
                tbl, target_file_bytes=args.target_mb * 1024 * 1024
            )
            print(f"{tbl.schema.table_name}: consolidated {len(written)} partition(s)")
        return 0
    if args.verb == "migrate-columns":
        from timefusion_spark.storage.schema import FieldDef

        fields = []
        for spec in args.columns:
            name, _, dtype = spec.partition(":")
            # ':Float64' would persist a NAMELESS column into the schema
            # sidecar (Spark allows StructField("")) — reject both halves
            # (review r12)
            if not name or not dtype:
                raise SystemExit(f"bad column spec {spec!r}; want col:type")
            fields.append(FieldDef(name, dtype, True))
        (tbl,) = tables
        maintenance.migrate_columns(tbl, fields)
        print(
            f"migrated: stored schema now has {len(tbl.schema.fields)} columns"
        )
        return 0
    if args.verb == "redrive-dml":
        total_rec = total_left = 0
        for tbl in tables:
            rec, left = maintenance.redrive_dml(tbl, dry_run=args.dry_run)
            total_rec += rec
            total_left += left
        print(f"redrive: recovered={total_rec} parked={total_left}"
              + (" (dry run)" if args.dry_run else ""))
        return 0
    if args.verb == "vacuum":
        for tbl in tables:
            removed = maintenance.vacuum(tbl, retain_hours=args.retain_hours)
            print(f"{tbl.schema.table_name}: removed {len(removed)} file(s)")
        return 0
    if args.verb == "stats":
        (tbl,) = tables
        for row in maintenance.stats(tbl).collect():
            print(f"{row['partition']}\t{row['n_files']}\t{row['bytes']}")
        return 0
    raise SystemExit(f"unknown verb {args.verb}")


if __name__ == "__main__":
    sys.exit(main())
