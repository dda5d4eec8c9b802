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
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_key(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(a for a in sys.argv[1:] if not os.path.isdir(a))

    import duckdb

    import __spark_entry__ as entrymod
    from timefusion_spark.session import get_spark

    spark = get_spark("tf-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

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
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
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
            otype = str(res.description[j][1]).upper()
            if "HUGEINT" in otype or "INT128" in otype:
                problems.append(f"oracle col {ocol} is HUGEINT (cast to BIGINT in oracle)")
        for j in range(len(ocols)):
            oval = next((r[j] for r in orows if r[j] is not None), None)
            if isinstance(oval, dt.datetime) and oval.tzinfo is not None:
                problems.append(
                    f"oracle col {ocols[j]} is tz-aware TIMESTAMPTZ (cast to TIMESTAMP)"
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
