"""As-of join semantics: latest-at-or-before matching, equal-ts inclusion,
NULL when no prior right row, per-key isolation."""

from __future__ import annotations

from timefusion_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            ("a", "2026-01-01 10:00:00"),  # before any right row → NULL
            ("a", "2026-01-01 12:00:00"),  # equal ts → matches v=2
            ("a", "2026-01-01 13:30:00"),  # between → still v=2
            ("a", "2026-01-01 15:00:00"),  # after later update → v=3
            ("b", "2026-01-01 12:30:00"),  # other key → its own stream
        ],
        "k string, ts string",
    ).selectExpr("k", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [
            ("a", "2026-01-01 11:00:00", 1.0),
            ("a", "2026-01-01 12:00:00", 2.0),
            ("a", "2026-01-01 14:00:00", 3.0),
            ("b", "2026-01-01 12:00:00", 9.0),
        ],
        "k string, ts string, v double",
    ).selectExpr("k", "cast(ts as timestamp) ts", "v")

    out = asof_join(left, right, on="k").collect()
    got = {(r["k"], str(r["ts"])): r["v_asof"] for r in out}
    assert got == {
        ("a", "2026-01-01 10:00:00"): None,
        ("a", "2026-01-01 12:00:00"): 2.0,
        ("a", "2026-01-01 13:30:00"): 2.0,
        ("a", "2026-01-01 15:00:00"): 3.0,
        ("b", "2026-01-01 12:30:00"): 9.0,
    }


def test_asof_plan_no_theta_join(spark):
    left = spark.range(100).selectExpr("id % 5 k", "timestamp_micros(id * 1000000) ts")
    right = spark.range(20).selectExpr(
        "id % 5 k", "timestamp_micros(id * 5000000) ts", "id * 1.0 v"
    )
    plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    # union-and-carry: one window, no join operator at all
    assert "Join" not in plan
    assert "Window" in plan
