"""Bucketed interval (range) join: points matched to the time intervals
that contain them, without a theta-join.

The reference delegates joins to its engine and has no interval/range
join (SURVEY §2.3); this is a beyond-the-reference operator for the
time-series surface (events-in-incident-window, measurements-in-
maintenance-window). The naive formulation
``points JOIN intervals ON ts BETWEEN start AND end`` has no equi-key,
so Spark plans a BroadcastNestedLoopJoin — O(|P|·|I|), a scale-killer.

The scalable shape is bucket-and-refine:

  1. pick a bucket width >= the longest interval (caller-supplied),
  2. explode each interval into every bucket it overlaps (<= 2 buckets
     when width >= max interval length),
  3. map each point to the ONE bucket containing it,
  4. equi-join on bucket (+ optional keys) — a real shuffled hash join
     with partition parallelism — then refine with the exact
     ``start <= ts <= end`` predicate.

Each (point, interval) pair can match at most once because the point
owns exactly one bucket, so no post-join dedup is needed. Cost is
O(|P| + |I|·ceil(len/width)) shuffled rows instead of the product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_width_s: int = 3600,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_ts <= end_col`` (and equal ``keys``, if given),
    via a bucketed equi-join.

    ``bucket_width_s`` should be >= the longest interval; shorter widths
    stay correct (intervals explode into more buckets) but replicate
    interval rows further. Column names must be disjoint between the two
    inputs (select/alias first if not).
    """
    keys = keys or []
    # the exact range predicate must live IN the join condition, not as a
    # post-join filter: a filter after an outer join evaluates NULL on
    # null-extended rows and silently drops them, degrading `left` to
    # inner (review r11). Right/full joins are refused outright — the
    # interval side is bucket-EXPLODED, so their unmatched rows would
    # surface once per bucket replica.
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti",
        "cross",
    ):
        raise ValueError(
            f"interval_join: unsupported how={how!r} (the interval side "
            "is bucket-exploded; right/full would duplicate unmatched "
            "intervals per bucket replica)"
        )
    w_us = int(bucket_width_s) * 1_000_000
    p = points.withColumn(
        "_bkt", F.floor(F.unix_micros(F.col(point_ts)) / F.lit(w_us))
    )
    # inverted intervals (end < start) match nothing, but F.sequence
    # would silently step -1 and explode each such row into a DESCENDING
    # bucket range — one corrupt sentinel interval became ~500k pure-
    # waste join rows (review r13); dropping them up front is exact
    i = (
        intervals.where(F.col(end_col) >= F.col(start_col))
        .withColumn(
            "_sb", F.floor(F.unix_micros(F.col(start_col)) / F.lit(w_us))
        )
        .withColumn("_eb", F.floor(F.unix_micros(F.col(end_col)) / F.lit(w_us)))
        .withColumn("_bkt", F.explode(F.sequence(F.col("_sb"), F.col("_eb"))))
        .drop("_sb", "_eb")
    )
    cond = [
        p["_bkt"] == i["_bkt"],
        p[point_ts] >= i[start_col],
        p[point_ts] <= i[end_col],
    ]
    cond += [p[k] == i[k] for k in keys]
    joined = p.join(i, cond, how)
    drop = [p["_bkt"], i["_bkt"]] + [i[k] for k in keys]
    for c in drop:
        joined = joined.drop(c)
    return joined
