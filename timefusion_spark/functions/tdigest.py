"""Rank-based t-digest: bounded mergeable percentile state, no range prior.

Reference: functions.rs:1096-1267 — `percentile_agg` builds a mergeable
t-digest partial state (bounded at 200 centroids, functions.rs:1107) over
an UNBOUNDED value domain, and `approx_percentile` reads quantiles from
it. The histogram sketch in functions/percentile.py needs a declared
[lo, hi) prior; this module removes that requirement.

Construction is the batch form of the merging t-digest: points (or
centroids, for a merge) are globally sorted per group, each gets its
mid-rank quantile q = (2·cum_before + w) / (2·total), and is assigned to
centroid id

    cid = floor( δ/(2π) · asin(2q − 1) )            (the k1 scale function)

The asin scale concentrates centroid resolution at the tails — the
t-digest's defining property: p99.9 of a heavy-tailed latency column
stays sharp while the middle of the distribution is coarse. |k| ≤ δ/4,
so a group never holds more than ~δ/2 + 2 centroids regardless of input
size (the functions.rs:1107 bound).

Everything — rank window, scale function, weighted-mean fold, quantile
walk — is deterministic given the sort order (ties sort by (mean, count);
equal keys are interchangeable addends), so a DuckDB oracle running the
same algorithm reproduces results bit-for-bit and the exact-hash
correctness gate applies to an *approximate* sketch. Weighted means are
folded LEFT-TO-RIGHT over the sorted centroid members (F.aggregate over
a sort_array; the oracle's running-window SUM adds in the same order) —
never a hash-aggregate float SUM, whose addition order is partition-
nondeterministic.

Merge = explode partial digests to weighted points → same compression.
Associative up to sketch resolution, exactly the UDAF merge_batch
contract (and Spark's own approx_percentile internal state).

Scale: one sort-shuffle per compression, O(δ) state per group, map-side
partial counts everywhere else. digest = array<struct<m: double, c: long>>
sorted by (m, c).
"""

from __future__ import annotations

import math

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DELTA = 200  # functions.rs:1107 — centroid budget (|cid| values ≤ δ/2 + 2)

# δ/(2π), one double value shared by the Spark side (F.lit) and the
# oracle side (emitted as a STRING cast to DOUBLE — see oracle_compress_sql)
# so the scale arithmetic is op-for-op identical.
def scale_coeff(delta: int = DELTA) -> float:
    return delta / (2.0 * math.pi)


def _compress(
    pts: DataFrame, group_cols: list[str], delta: int
) -> DataFrame:
    """Weighted points (group..., m double, c long) → one digest row per
    group. The mid-rank window is the only shuffle; the weighted mean of
    each centroid is a deterministic sorted left fold."""
    coeff = scale_coeff(delta)
    w_ord = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("m").asc(), F.col("c").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*group_cols)
    assigned = pts.select(
        *group_cols,
        "m",
        "c",
        F.floor(
            F.lit(coeff)
            * F.asin(
                (F.coalesce(F.sum("c").over(w_ord), F.lit(0)) * 2 + F.col("c")).cast("double")
                / (F.sum("c").over(w_all) * 2).cast("double")
                * F.lit(2.0)
                - F.lit(1.0)
            )
        ).alias("cid"),
    )
    cents = (
        assigned.groupBy(*group_cols, "cid")
        .agg(F.sort_array(F.collect_list(F.struct("m", "c"))).alias("_pts"))
        .select(
            *group_cols,
            (
                F.aggregate(
                    "_pts", F.lit(0.0), lambda a, e: a + e["m"] * e["c"].cast("double")
                )
                / F.aggregate("_pts", F.lit(0).cast("long"), lambda a, e: a + e["c"]).cast(
                    "double"
                )
            ).alias("m"),
            F.aggregate("_pts", F.lit(0).cast("long"), lambda a, e: a + e["c"]).alias("c"),
        )
    )
    return cents.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("m", "c"))).alias("digest")
    )


def tdigest_agg(
    df: DataFrame, group_cols: list[str], value_col: str, delta: int = DELTA
) -> DataFrame:
    """Step 1 (percentile_agg analog): one bounded digest per group from
    raw values. NULL values are skipped (aggregate-function semantics).

    Documented divergence from a SQL aggregate (review r13): a group
    whose values are ALL NULL has no output row here, where `SELECT g,
    percentile_agg(v) … GROUP BY g` would keep g with a NULL digest.
    Preserving those groups costs a second full input scan (distinct
    keys + outer join) — the wrong default at 100 TB; callers needing
    SQL semantics outer-join their key frame onto this result. The
    pgwire surface is unaffected (pgshim maps percentile_agg to Spark's
    native percentile aggregate, which keeps NULL groups)."""
    pts = df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.col(value_col).cast("double").alias("m"),
        F.lit(1).cast("long").alias("c"),
    )
    return _compress(pts, group_cols, delta)


def tdigest_agg_sharded(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    shards: int = 32,
    delta: int = DELTA,
    shard_expr: Column | None = None,
) -> DataFrame:
    """Scale-safe digest build: shard each group, build per-shard digests
    in parallel, merge per group — the two-step pattern
    q_percentile_sketch demonstrates, packaged as one call.

    Use this instead of `tdigest_agg` when |groups| < cores: the plain
    form's per-group sort window would funnel every value of a group
    through ONE task (the classic few-groups window skew), while the
    sharded form's first pass spreads each group over `shards` tasks and
    the merge pass sorts only ~shards·δ/2 centroids per group.

    The default shard key is the VALUE hash — deterministic (re-runs
    produce the identical digest, which the exact-hash oracle gate
    needs), but it sends every duplicate of a value to one shard, so a
    group dominated by a single repeated value (a quantized/zero-heavy
    column) keeps the one-task funnel (review r13). For such columns
    pass a deterministic row-identity `shard_expr` (e.g.
    `F.col("user_id") % shards`, the q_percentile_sketch idiom) to
    spread duplicates."""
    sharded = df.withColumn(
        "_tf_shard",
        shard_expr
        if shard_expr is not None
        else F.pmod(F.xxhash64(F.col(value_col)), F.lit(shards)),
    )
    partials = tdigest_agg(sharded, [*group_cols, "_tf_shard"], value_col, delta)
    return tdigest_merge(partials.drop("_tf_shard"), group_cols, delta=delta)


def tdigest_merge(
    df: DataFrame, group_cols: list[str], digest_col: str = "digest", delta: int = DELTA
) -> DataFrame:
    """Step 2 (UDAF merge_batch analog): merge partial digests (one per
    row) into one digest per group — explode to weighted centroids,
    re-compress with the same scale. Order-insensitive: the global sort
    inside compression erases shard arrival order."""
    pts = df.select(*group_cols, F.explode(digest_col).alias("_e")).select(
        *group_cols, F.col("_e.m").alias("m"), F.col("_e.c").alias("c")
    )
    return _compress(pts, group_cols, delta)


def quantile_walk(
    df: DataFrame,
    counts: Column,
    ps: dict[str, float],
    read_out: Callable[[Column], Column],
) -> DataFrame:
    """Shared cumulative-walk reader (review r13: this ~25-line walk was
    duplicated between with_quantiles and percentile.with_percentiles):
    for each requested p, `idx` = number of cumulative counts below
    ceil(p·total), handed to `read_out(idx)` for the sketch-specific
    value. Evaluation-count note: CollapseProject inlines the staged
    `_tot`/`_cum` expressions into the filter lambda (the project-wide
    hazard), re-evaluating them per element — tolerated here because the
    arrays are digest-bounded (≤ δ/2 + 2 ≈ 102 elements), unlike the
    unbounded-document sites that need a hard barrier."""
    staged = df.withColumn("_cnts", counts).withColumn(
        "_tot", F.aggregate("_cnts", F.lit(0).cast("long"), lambda a, x: a + x)
    ).withColumn(
        "_cum",
        F.transform(
            F.sequence(F.lit(1), F.size("_cnts")),
            lambda i: F.aggregate(
                F.slice("_cnts", F.lit(1), i), F.lit(0).cast("long"), lambda a, x: a + x
            ),
        ),
    )
    out = staged
    for name, p in ps.items():
        target = F.ceil(F.lit(p) * F.col("_tot"))
        idx = F.size(F.filter(F.col("_cum"), lambda c: c < target))
        out = out.withColumn(name, read_out(idx))
    return out.drop("_cnts", "_tot", "_cum")


def with_quantiles(
    df: DataFrame, ps: dict[str, float], digest_col: str = "digest"
) -> DataFrame:
    """approx_percentile reader: for each requested p, the mean of the
    first centroid whose cumulative weight reaches ceil(p·total) — the
    same deterministic walk as the oracle (centroid means are sorted, so
    cumulative weight is monotone in m)."""
    return quantile_walk(
        df,
        F.transform(digest_col, lambda e: e["c"]),
        ps,
        lambda idx: F.element_at(F.col(digest_col), idx + 1)["m"],
    )


def oracle_compress_sql(
    src: str, group_cols: list[str], delta: int = DELTA, m: str = "m", c: str = "c"
) -> str:
    """DuckDB CTE body running the SAME compression over `src(group..., m, c)`
    — emitted by the query modules so Spark and oracle share one algorithm
    definition. Returns a SELECT yielding (group..., m, c) centroids."""
    g = ", ".join(group_cols)
    # emitted as a STRING cast to DOUBLE: a bare decimal literal parses as
    # DECIMAL(17,15) in DuckDB, whose decimal→double conversion is 1 ulp
    # off the Python/Spark double for ~11% of delta values (review r13,
    # reproduced — delta=200 round-trips only by luck); string→double is
    # correctly rounded on both engines
    coeff = f"CAST('{scale_coeff(delta)!r}' AS DOUBLE)"
    # The weighted sum must be a SEQUENTIAL left fold over the sorted
    # members to match Spark's F.aggregate bit-for-bit — a windowed SUM
    # won't do (DuckDB's segment-tree association differs from a fold), so
    # it's list(... ORDER BY ...) + list_reduce. Integer SUMs (weights) are
    # association-insensitive and stay plain aggregates.
    return f"""
    SELECT {g},
           list_reduce(list(m * CAST(c AS DOUBLE) ORDER BY m, c), (a, x) -> a + x)
               / CAST(SUM(c) AS DOUBLE) AS m,
           SUM(c) AS c
    FROM (
        SELECT {g}, m, c,
               CAST(FLOOR({coeff} * ASIN(
                   CAST(2 * COALESCE(cb, 0) + c AS DOUBLE) / CAST(2 * tot AS DOUBLE)
                   * 2.0 - 1.0)) AS BIGINT) AS cid
        FROM (
            SELECT {g}, {m} AS m, {c} AS c,
                   SUM({c}) OVER (PARTITION BY {g} ORDER BY {m}, {c}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cb,
                   SUM({c}) OVER (PARTITION BY {g}) AS tot
            FROM {src}
        )
    )
    GROUP BY {g}, cid
    """
