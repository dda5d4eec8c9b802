"""Skew-resilient aggregation: salted two-stage groupBy.

At 100 TB a hash aggregate on a skewed key (one tenant with 100× the
rows) funnels the hot key's entire input through one reducer. Spark's
map-side partial aggregation already absorbs most of this for algebraic
aggregates; SALTING is the explicit control for the residual cases
(high-cardinality partial states, exact distinct counts, collect-style
aggregates): append a random-ish salt to the key, pre-aggregate on
(key, salt) — spreading the hot key over `salt_buckets` reducers — then
merge the partials in a second, much smaller aggregate.

The salt here is DETERMINISTIC (a hash of secondary columns, not rand())
so results are reproducible and oracle-checkable; the spreading property
only needs uniformity, not randomness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_col: Column,
    salt_buckets: int = 16,
) -> DataFrame:
    """SUM/COUNT per key via salted two-stage aggregation.

    Stage 1 shuffles on (key…, salt) — the hot key spreads over
    `salt_buckets` reducers; stage 2 shuffles only |keys|·salt_buckets
    partial rows. Result is identical to the direct groupBy (SUM/COUNT are
    algebraic), which the oracle asserts."""
    # pmod, not abs(hash) % n: abs(Integer.MIN_VALUE) overflows (throws
    # under ANSI; negative salt otherwise, spreading rows over up to
    # 2*salt_buckets-1 buckets) (review r13)
    salt = F.pmod(F.hash(salt_col), F.lit(salt_buckets)).alias("_salt")
    partial = (
        df.select(*key_cols, F.col(value_col).alias("_v"), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum("_v").alias("_ps"), F.count(F.lit(1)).alias("_pc"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_ps").alias("total"), F.sum("_pc").alias("n")
    )
