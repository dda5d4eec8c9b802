"""Local correctness harness mimicking the driver's verify step.

Runs every queries() entry at the given sf dir on Spark, runs the
matching oracle_sql() in DuckDB over the same parquet files, and
compares: row count, column names, and order-insensitive values
(columns sorted by name, rows canonicalized + sorted).

Usage: python tools/check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(v):
    # \x00/\x01 prefixes keep NULL and nested lists from colliding with
    # the literal strings 'NULL' / '[1,2]' — a NULL-vs-text divergence
    # previously canonicalized equal and passed (review r12); strings
    # stay raw (string-vs-number divergence is caught by the type-drift
    # sampler below).
    if v is None:
        return "\x00NULL"
    if isinstance(v, (bytes, bytearray)):
        # Spark collect() hands back bytearray for BinaryType, DuckDB
        # bytes — same contents must canonicalize equal, and str() of
        # either would render them differently anyway (review r13)
        return "\x02" + bytes(v).hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            # int(v) raised OverflowError and killed the whole run
            # before the first guard (review r12)
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "\x01[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_key(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    # strict argv handling (review r12): a nonexistent sf_dir or a typo'd
    # query name used to become a filter matching nothing — '0 passed,
    # 0 failed', exit 0 — a no-op run reading as green in CI.
    sf_dir = "/root/testdata/sf0.01"
    only: set[str] = set()
    for a in sys.argv[1:]:
        if os.path.isdir(a):
            sf_dir = a
        elif os.sep in a or a.startswith("."):
            print(f"ERROR: sf_dir {a!r} does not exist", file=sys.stderr)
            return 2
        else:
            only.add(a)

    import duckdb

    import __spark_entry__ as entrymod
    from timefusion_spark.session import get_spark

    spark = get_spark("tf-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}", file=sys.stderr)
        return 2

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

    failures, passed, skipped = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:500]}")
            continue
        if name not in oracles:
            skipped += 1
            print(f"skip  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            # con.sql (relation API): .types reports DuckDB's NATIVE type
            # names — the DBAPI description says 'NUMBER' for every
            # numeric, so the old HUGEINT check never fired and uncast
            # SUM() oracles passed here while failing the driver's typed
            # hash (review r12)
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t).upper() for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error: {str(e)[:500]}")
            continue

        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        # Typed check: the driver hashes values WITH their types, so a DuckDB
        # HUGEINT vs Spark BIGINT, or TIMESTAMPTZ vs TIMESTAMP, fails there
        # even when canonicalized values match. Catch it here.
        for j, ocol in enumerate(ocols):
            if "HUGEINT" in otypes[j] or "INT128" in otypes[j]:
                problems.append(f"oracle col {ocol} is HUGEINT (cast to BIGINT in oracle)")
            if "WITH TIME ZONE" in otypes[j] or "TIMESTAMPTZ" in otypes[j]:
                problems.append(
                    f"oracle col {ocol} is tz-aware TIMESTAMPTZ (cast to TIMESTAMP)"
                )
        if not problems and srows and orows:
            smap = {c: i for i, c in enumerate(scols)}
            for j, ocol in enumerate(ocols):
                si = smap.get(ocol)
                if si is None:
                    continue
                sval = next((r[si] for r in srows if r[si] is not None), None)
                oval = next((r[j] for r in orows if r[j] is not None), None)
                if sval is None or oval is None:
                    continue
                st, ot = type(sval).__name__, type(oval).__name__
                # bytearray (Spark BinaryType) vs bytes (DuckDB BLOB) is
                # representation, not drift — canon() hex-normalizes both
                if {st, ot} == {"bytearray", "bytes"}:
                    continue
                if st != ot:
                    problems.append(f"col {ocol} type drift spark={st} oracle={ot}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sk, ok = rows_key(scols, srows), rows_key(ocols, orows)
            if sk != ok:
                diff = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
                problems.append(f"values differ; first diffs (spark vs oracle): {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(p[:400] for p in problems)}")
        else:
            passed += 1
            print(f"ok    {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{passed} passed, {len(failures)} failed, {skipped} rows-only")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
