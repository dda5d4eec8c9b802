"""Mergeable percentile sketch: the two-step percentile_agg /
approx_percentile API (reference: functions.rs:1096-1267 — a bounded
t-digest UDAF with mergeable partial state + a scalar quantile reader).

Spark-first re-expression: the sketch is a fixed-width histogram digest
(array<long> of bucket counts over a declared [lo, hi) range). It has the
two properties the reference's t-digest exists for:

  1. BOUNDED state per group (n_buckets longs, like the 200-centroid cap
     at functions.rs:1107), independent of input size;
  2. MERGEABLE: two digests combine by element-wise addition — so partial
     digests built per shard/day/partition roll up associatively, the
     exact "partial state" contract of the reference UDAF (and of Spark's
     own percentile_approx internal sketch).

Everything is JVM expression arithmetic (map-side-combinable aggregates,
zip_with merges); the walk is deterministic, so a DuckDB oracle reproduces
results bit-for-bit — which a real t-digest (rank-interpolating, centroid
drift) cannot offer. Spark's built-in `percentile_approx` remains the
one-shot path (SURVEY §2.4); this module is the two-step API parity.

Error bound: ±(hi-lo)/(2·n_buckets) absolute (midpoint read-out), values
outside [lo, hi) clamp to the edge buckets.

This histogram variant needs the [lo, hi) prior; the PRIMARY two-step
sketch is functions/tdigest.py — a bounded rank-based t-digest over an
unbounded domain (the reference's actual state shape), equally
deterministic and oracle-checkable. Keep this one for fixed-domain tiles
where equi-width read-out is the desired semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def bucket_index(value: Column, lo: float, hi: float, n: int = DEFAULT_BUCKETS) -> Column:
    """Clamped equi-width bucket index in [0, n-1]. The expression shape
    ((value - lo) / (hi - lo)) * n is mirrored verbatim by the oracle so
    float rounding agrees.

    The clamp runs on the DOUBLE before the int cast: clamping after
    would feed the unclamped value through the cast, and under ANSI mode
    (Spark 4 default) a far-out-of-range value — or ±Infinity — throws
    CAST_OVERFLOW instead of clamping (review r13, reproduced). For all
    finite in-scale values clamp-then-floor ≡ floor-then-clamp, so oracle
    parity is unchanged. NaN yields NULL (skipped like a NULL value —
    Spark's NaN ordering would otherwise silently claim the top bucket)."""
    scaled = ((value.cast("double") - F.lit(lo)) / F.lit(hi - lo)) * F.lit(n)
    clamped = F.floor(F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(n - 1))))
    return F.when(F.isnan(scaled), F.lit(None)).otherwise(clamped).cast("int")


def percentile_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Step 1 — build one digest per group: (group_cols..., digest).

    Plan shape: ONE hash aggregate on (group, bucket) — map-side partial
    counts, then a bounded collect (≤ n entries per group) assembled into
    the dense array. No wide 64-column aggregate, no UDAF.

    NULL (and NaN) values are skipped — without the filter a NULL bucket
    key reaches map_from_entries, which throws NULL_MAP_KEY at runtime
    (review r13, reproduced). A group whose values are ALL NULL therefore
    has no output row — the same divergence tdigest_agg documents."""
    idx = bucket_index(F.col(value_col), lo, hi, n)
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, idx.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_b").isNotNull())  # NaN values bucket to NULL
    )
    dense = counts.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("_b", "_c"))).alias("_m")
    )
    return dense.select(
        *group_cols,
        F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0).cast("long")),
        ).alias("digest"),
    )


def merge_digests(df: DataFrame, group_cols: list[str], digest_col: str = "digest") -> DataFrame:
    """Step 2 — merge partial digests (rows) into one per group:
    element-wise sum via posexplode → (group, pos) hash aggregate →
    re-assembly. Associative and commutative, so shard/partition-level
    digests roll up in any order — the UDAF merge_batch contract."""
    exploded = df.select(*group_cols, F.posexplode(digest_col).alias("_pos", "_c"))
    summed = exploded.groupBy(*group_cols, "_pos").agg(F.sum("_c").alias("_c"))
    return (
        summed.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("_pos", "_c"))).alias("_entries"))
        .select(
            *group_cols,
            F.transform(F.col("_entries"), lambda e: e["_c"]).alias("digest"),
        )
    )


def with_percentiles(
    df: DataFrame,
    ps: dict[str, float],
    lo: float,
    hi: float,
    n: int = DEFAULT_BUCKETS,
    digest_col: str = "digest",
) -> DataFrame:
    """approx_percentile reader: add one column per requested quantile
    (midpoint of the first bucket whose cumulative count reaches
    ceil(p·total)) via the shared cumulative walk in functions/tdigest
    (one definition of the walk for both sketches — review r13; see
    quantile_walk's evaluation-count note)."""
    from timefusion_spark.functions.tdigest import quantile_walk

    width = (hi - lo) / n
    return quantile_walk(
        df,
        F.col(digest_col),
        ps,
        lambda idx: F.lit(lo) + (idx.cast("double") + F.lit(0.5)) * F.lit(width),
    )
