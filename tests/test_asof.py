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


def test_matched_rows_null_payload_not_resurrected(spark):
    """Review r11: the payload carries as ONE struct — a matched right
    row's genuine NULL field must come through as NULL, not be skipped
    in favor of the stale prior value; and fields of different right
    rows must never stitch into one row."""
    left = spark.createDataFrame(
        [("k", "2026-01-01 14:00:00")], "k string, ts string"
    ).selectExpr("k", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [
            ("k", "2026-01-01 12:00:00", 10.0, "a"),
            ("k", "2026-01-01 13:00:00", None, "b"),
        ],
        "k string, ts string, price double, status string",
    ).selectExpr("k", "cast(ts as timestamp) ts", "price", "status")
    [r] = asof_join(left, right, on="k").collect()
    # the 13:00 row matches: price cleared to NULL, status 'b' — the
    # per-column carry returned (10.0, 'b'), a row that never existed
    assert r["price_asof"] is None and r["status_asof"] == "b"


def test_null_right_ts_and_keys_never_match(spark):
    """SQL `>=`/`=` never match NULL: a null-ts right row must not carry
    its payload anywhere, and null keys must not match each other."""
    left = spark.createDataFrame(
        [("k", "2026-01-01 14:00:00"), (None, "2026-01-01 14:00:00")],
        "k string, ts string",
    ).selectExpr("k", "cast(ts as timestamp) ts")
    right = spark.createDataFrame(
        [("k", None, 7.0), (None, "2026-01-01 10:00:00", 8.0)],
        "k string, ts string, v double",
    ).selectExpr("k", "cast(ts as timestamp) ts", "v")
    got = {r["k"]: r["v_asof"] for r in asof_join(left, right, on="k").collect()}
    assert got == {"k": None, None: None}
