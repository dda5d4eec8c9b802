"""Mergeable percentile sketch: digest bounds, merge associativity
(shard-merged == directly-built), and quantile accuracy within the
declared histogram error bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timefusion_spark.functions import percentile as P

LO, HI, N = 0.0, 100.0, 50  # bucket width 2.0 → max abs error 1.0


@pytest.fixture(scope="module")
def values(spark):
    # 0..999 scaled into [0, 100): exact quantiles known.
    return spark.range(1000).select(
        (F.col("id") % 10).cast("string").alias("g"),
        (F.col("id") / 10.0).alias("v"),
        (F.col("id") % 4).cast("int").alias("shard"),
    )


def test_digest_is_bounded_and_total_preserved(values):
    d = P.percentile_agg(values, ["g"], "v", LO, HI, N)
    rows = d.collect()
    assert all(len(r["digest"]) == N for r in rows)
    assert sum(sum(r["digest"]) for r in rows) == 1000


def test_merge_equals_direct_build(values):
    direct = P.percentile_agg(values, ["g"], "v", LO, HI, N)
    sharded = P.percentile_agg(values, ["g", "shard"], "v", LO, HI, N)
    merged = P.merge_digests(sharded, ["g"])
    a = {r["g"]: r["digest"] for r in direct.collect()}
    b = {r["g"]: r["digest"] for r in merged.collect()}
    assert a == b  # element-wise merge is exact, order-independent


def test_quantiles_within_error_bound(spark):
    df = spark.range(1000).select(F.lit("g").alias("g"), (F.col("id") / 10.0).alias("v"))
    d = P.percentile_agg(df, ["g"], "v", LO, HI, N)
    out = P.with_percentiles(d, {"p50": 0.5, "p99": 0.99}, LO, HI, N).collect()[0]
    assert abs(out["p50"] - 50.0) <= (HI - LO) / N  # one bucket width
    assert abs(out["p99"] - 99.0) <= (HI - LO) / N


def test_out_of_range_clamps(spark):
    df = spark.createDataFrame([("g", -5.0), ("g", 500.0)], "g string, v double")
    d = P.percentile_agg(df, ["g"], "v", LO, HI, N).collect()[0]["digest"]
    assert d[0] == 1 and d[N - 1] == 1
