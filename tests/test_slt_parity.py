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


class TestRewriteQual:
    """_rewrite_qual: the DML qualifier strip must be literal-skipping and
    subquery-scoped (review r11-judge #1 — the old `re.sub(rf"\\b{name}\\.")`
    rewrote matches INSIDE string literals, deleting the wrong rows)."""

    def test_strips_plain_qualifier(self):
        from timefusion_spark.slt import _rewrite_qual

        assert _rewrite_qual("orders.id = 5", "orders") == "id = 5"
        assert _rewrite_qual("upper(orders.note) = 'X'", "orders") == "upper(note) = 'X'"
        # case-insensitive like PG identifier folding
        assert _rewrite_qual("ORDERS.id = 5", "orders") == "id = 5"

    def test_literal_content_untouched(self):
        from timefusion_spark.slt import _rewrite_qual

        # the r11-judge repro: a literal containing 'orders.' is DATA
        assert (
            _rewrite_qual("note = 'orders.x'", "orders") == "note = 'orders.x'"
        )
        # doubled-quote escape inside the literal
        assert (
            _rewrite_qual("note = 'it''s orders.x'", "orders")
            == "note = 'it''s orders.x'"
        )
        # qualifier BEFORE and literal AFTER in one predicate
        assert (
            _rewrite_qual("orders.note = 'orders.x'", "orders")
            == "note = 'orders.x'"
        )

    def test_subquery_alias_shadowing_untouched(self):
        from timefusion_spark.slt import _rewrite_qual

        # inner FROM re-aliases another relation as the target name —
        # PG scoping: the inner alias shadows the DML target
        sql = "id IN (SELECT orders.id FROM archive orders)"
        assert _rewrite_qual(sql, "orders") == sql

    def test_schema_qualified_and_word_boundaries(self):
        from timefusion_spark.slt import _rewrite_qual

        # schema-qualified other.orders.col: 'orders.' here is not a
        # top-level relation qualifier
        assert (
            _rewrite_qual("other.orders.id = 5", "orders") == "other.orders.id = 5"
        )
        # reorders.x is a different identifier
        assert _rewrite_qual("reorders.x = 1", "orders") == "reorders.x = 1"
        # replacement form used by UPDATE…FROM
        assert (
            _rewrite_qual("orders.val + 1", "orders", "_tgt.") == "_tgt.val + 1"
        )
