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


def test_far_out_of_range_and_infinity_clamp_not_crash(spark):
    """Review r13: the clamp ran AFTER the int cast, so a value whose
    scaled bucket exceeds int32 (or ±Infinity) threw CAST_OVERFLOW under
    ANSI mode instead of clamping to the edge bucket."""
    df = spark.createDataFrame(
        [("g", 4.0e9), ("g", -4.0e9), ("g", float("inf")), ("g", float("-inf"))],
        "g string, v double",
    )
    d = P.percentile_agg(df, ["g"], "v", LO, HI, N).collect()[0]["digest"]
    assert d[0] == 2 and d[N - 1] == 2


def test_null_and_nan_values_skipped_not_crash(spark):
    """Review r13: a NULL value produced a NULL bucket key and
    map_from_entries threw NULL_MAP_KEY; NaN would silently claim a
    bucket. Both are skipped like SQL aggregate inputs."""
    df = spark.createDataFrame(
        [("g", 10.0), ("g", None), ("g", float("nan"))], "g string, v double"
    )
    d = P.percentile_agg(df, ["g"], "v", LO, HI, N).collect()[0]["digest"]
    assert sum(d) == 1


class TestTDigest:
    """Rank-based t-digest (functions/tdigest.py): the boundedness contract
    mirrors functions.rs:1508-1525 (centroid count capped regardless of
    input size, no range prior), plus merge order-insensitivity and
    tail accuracy on a heavy-tailed distribution."""

    def test_bounded_state_no_prior(self, spark):
        from timefusion_spark.functions import tdigest as TD

        # 200k values over an undeclared, heavy-tailed domain (exp growth
        # to ~1e8): digest size must stay ≤ δ/2 + 2 (k1 scale range).
        df = spark.range(200_000).select(
            F.lit("g").alias("g"), F.exp(F.col("id") / 11000.0).alias("v")
        )
        d = TD.tdigest_agg(df, ["g"], "v")
        sz = d.select(F.size("digest").alias("s")).collect()[0]["s"]
        assert sz <= TD.DELTA // 2 + 2
        assert sz > 20  # and it's a real multi-centroid summary, not one blob

    def test_quantile_accuracy_rank_error(self, spark):
        from timefusion_spark.functions import tdigest as TD

        # uniform 0..9999: every quantile's RANK error must be small
        # (t-digest guarantees rank error ~q(1-q)/δ; assert ≤ 1.5%).
        df = spark.range(10_000).select(F.lit("g").alias("g"), F.col("id").cast("double").alias("v"))
        d = TD.tdigest_agg(df, ["g"], "v")
        row = TD.with_quantiles(d, {"p50": 0.5, "p95": 0.95, "p99": 0.99}).collect()[0]
        for name, p in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            rank = row[name] / 9999.0
            assert abs(rank - p) < 0.015, (name, row[name])

    def test_tail_resolution(self, spark):
        from timefusion_spark.functions import tdigest as TD

        # Heavy tail: 99% of mass at ~1, 1% spread to 1e6. The asin scale
        # must keep p999 within 10% relative of the exact value — a
        # uniform-width histogram over [0, 1e6] would put the entire body
        # in one bucket and miss by orders of magnitude.
        df = spark.range(100_000).select(
            F.lit("g").alias("g"),
            F.when(F.col("id") % 100 < 99, 1.0 + (F.col("id") % 97) / 97.0)
            .otherwise((F.col("id") % 1000).cast("double") * 1000.0)
            .alias("v"),
        )
        exact = df.selectExpr("percentile(v, 0.999) AS e").collect()[0]["e"]
        d = TD.tdigest_agg(df, ["g"], "v")
        approx = TD.with_quantiles(d, {"p999": 0.999}).collect()[0]["p999"]
        assert abs(approx - exact) / exact < 0.10, (approx, exact)

    def test_merge_matches_direct_within_resolution(self, spark):
        from timefusion_spark.functions import tdigest as TD

        df = spark.range(20_000).select(
            F.lit("g").alias("g"),
            (F.col("id") % 16).alias("shard"),
            (F.col("id") % 5000).cast("double").alias("v"),
        )
        direct = TD.tdigest_agg(df, ["g"], "v")
        sharded = TD.tdigest_agg(df, ["g", "shard"], "v")
        merged = TD.tdigest_merge(sharded, ["g"])
        qd = TD.with_quantiles(direct, {"p50": 0.5, "p99": 0.99}).collect()[0]
        qm = TD.with_quantiles(merged, {"p50": 0.5, "p99": 0.99}).collect()[0]
        for name in ("p50", "p99"):
            assert abs(qd[name] - qm[name]) / 5000.0 < 0.02, (name, qd[name], qm[name])
        # merged digest still bounded
        sz = merged.select(F.size("digest").alias("s")).collect()[0]["s"]
        assert sz <= TD.DELTA // 2 + 2


class TestTDigestSharded:
    def test_sharded_build_matches_direct_quantiles(self, spark):
        from pyspark.sql import functions as F

        from timefusion_spark.functions import tdigest as TD

        df = spark.range(20_000).select(
            (F.col("id") % 2).cast("string").alias("g"),
            (F.col("id") / 100.0).alias("v"),
        )
        direct = TD.with_quantiles(TD.tdigest_agg(df, ["g"], "v"), {"p50": 0.5, "p99": 0.99})
        sharded = TD.with_quantiles(
            TD.tdigest_agg_sharded(df, ["g"], "v", shards=8), {"p50": 0.5, "p99": 0.99}
        )
        a = {r["g"]: (r["p50"], r["p99"]) for r in direct.collect()}
        b = {r["g"]: (r["p50"], r["p99"]) for r in sharded.collect()}
        # different point groupings → different digests, but quantiles must
        # agree within t-digest resolution (values span [0, 200)): the k1
        # scale is COARSE mid-range (middle centroids hold ~2π/δ ≈ 3% of
        # mass, so p50 can move ~2% of the range) and SHARP at the tails.
        for g in a:
            assert abs(a[g][0] - b[g][0]) < 5.0  # p50: mid-range, coarse
            assert abs(a[g][1] - b[g][1]) < 1.0  # p99: tail, sharp
        # digest stays bounded after the merge
        merged = TD.tdigest_agg_sharded(df, ["g"], "v", shards=8).collect()
        assert all(len(r["digest"]) <= TD.DELTA // 2 + 2 for r in merged)


class TestOracleCoeffParity:
    """Review r13: the oracle emitted the δ/(2π) coefficient as a bare
    decimal literal, which DuckDB types DECIMAL(17,15) — its
    decimal→double conversion is 1 ulp off the Python/Spark double for
    ~11% of delta values, silently breaking op-for-op compression parity
    for non-default deltas. The coefficient now ships as a string cast
    to DOUBLE (correctly-rounded on both engines)."""

    @pytest.mark.parametrize("delta", [60, 100, 200, 919])
    def test_compress_matches_duckdb_exactly(self, spark, delta):
        import duckdb

        from timefusion_spark.functions import tdigest as TD

        df = spark.range(3000).select(
            (F.col("id") % 2).cast("string").alias("g"),
            # heavy-ish tail so centroid boundaries are exercised
            (F.pow(F.col("id") % 700, F.lit(1.3))).alias("v"),
        )
        d = TD.tdigest_agg(df, ["g"], "v", delta=delta)
        got = {
            (r["g"], i): (c["m"], c["c"])
            for r in d.collect()
            for i, c in enumerate(r["digest"])
        }
        rows = df.collect()
        con = duckdb.connect()
        con.execute("CREATE TABLE pts (g TEXT, m DOUBLE, c BIGINT)")
        con.executemany(
            "INSERT INTO pts VALUES (?, ?, ?)", [(r["g"], r["v"], 1) for r in rows]
        )
        sql = TD.oracle_compress_sql("pts", ["g"], delta=delta)
        want_rows = con.execute(
            f"SELECT g, m, c FROM ({sql}) ORDER BY g, m, c"
        ).fetchall()
        want = {}
        idx: dict[str, int] = {}
        for g, m, c in want_rows:
            want[(g, idx.setdefault(g, 0))] = (m, int(c))
            idx[g] += 1
        assert got == want  # exact float equality — op-for-op parity
