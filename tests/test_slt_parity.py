"""Reference slt-corpus parity: run /root/reference/tests/slt/*.slt against
this engine (timefusion_spark.slt runner).

Every record must pass except those in SKIPS, each with an explicit
reason. The reference runs the same files over pgwire
(tests/suite/sqllogictest.rs:1-40); here INSERT/UPDATE/DELETE route
through the storage core (Table.append / storage.dml) and queries run on
spark.sql over the merge-on-read views — so a green file means the
reference's own test workload produces identical answers on this engine.
"""

from __future__ import annotations

import glob
import os

import pytest

SLT_DIR = "/root/reference/tests/slt"

_FILES = sorted(glob.glob(os.path.join(SLT_DIR, "*.slt")))


@pytest.mark.skipif(not _FILES, reason="reference slt corpus not present")
@pytest.mark.parametrize("path", _FILES, ids=[os.path.basename(p) for p in _FILES])
def test_slt_file(path, spark, tmp_path):
    from timefusion_spark.slt import SKIPS, run_file

    skips = SKIPS.get(os.path.basename(path), {})
    results = run_file(spark, path, str(tmp_path), skips=skips)
    failures = [r for r in results if not r.ok]
    msg = "\n".join(
        f"  line {r.record.line} [{r.record.kind}] {r.detail}\n"
        f"    SQL: {' '.join(r.record.sql.split())[:200]}"
        for r in failures
    )
    assert not failures, f"{len(failures)}/{len(results)} records failed:\n{msg}"
