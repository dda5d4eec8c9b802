"""As-of join: for each left row, the most recent right row at or before
its timestamp (per key) — the standard enrichment join for time-series
(latest config/status/price as of an event).

The reference delegates all joins to its engine and ships no as-of
operator (SURVEY §2.3); this is one of the brief's beyond-the-reference
operators. Spark has no ASOF JOIN either, and the naive formulations are
scale-traps: a theta-join `l.ts >= r.ts` explodes to O(|L|·|R|) per key,
and a windowed subquery per left row re-scans. The scalable shape is the
UNION-AND-CARRY merge:

  1. tag right rows (payload packed into ONE struct) and left rows
     (struct NULL),
  2. union, ONE window per key ordered by (ts, tag) with
     `last(struct, ignoreNulls)` carrying the latest right ROW forward,
  3. keep left rows.

One shuffle on the key, one sort — the same cost as a groupBy window,
independent of how many right rows precede each left row. Ties (equal
ts) resolve right-before-left (tag order), matching ASOF `>=` semantics.

The payload carries as a single STRUCT, never per column (review r11):
per-column `last(ignorenulls)` would skip a matched row's GENUINE NULL
field and resurrect the stale prior value — and could stitch fields of
DIFFERENT right rows into one row that never existed. Right rows with a
NULL key or NULL timestamp are excluded up front: SQL `=`/`>=` never
match NULL (a null-key left row therefore gets no match, and DuckDB's
ASOF JOIN oracle agrees).

DETERMINISM CONTRACT (review r13): right rows must be unique per
(key, timestamp) — ties share the window sort position (_ts, _is_left),
so which tied payload carries forward is partition-order dependent.
Pre-aggregate the right side (as q_asof_join does) or add a tiebreak
column to its timestamp when duplicates are possible; the operator
cannot impose one generically (payload structs may hold unorderable
types like maps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every `left` row gains `<payload><suffix>` columns
    from the latest `right` row with `right_ts <= left_ts` on key `on`
    (NULL when no prior right row exists)."""
    from pyspark.sql import Window as W

    # `is None`, not falsy: an explicit empty list is a legitimate
    # existence-style probe, not a request for the default (review r13)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, right_ts)]
    r_clean = right.where(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    prow_t = (
        r_clean.select(
            F.struct(*[F.col(c) for c in payload_cols]).alias("_prow")
        ).schema["_prow"].dataType
    )
    lrow_t = (
        left.select(
            F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
        ).schema["_lrow"].dataType
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(prow_t).alias("_prow"),
    )
    r_tagged = r_clean.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lrow_t).alias("_lrow"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_prow"),
    )
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_is_left",
        "_lrow",
        F.last("_prow", ignorenulls=True).over(w).alias("_prow"),
    )
    out = carried.where(F.col("_is_left") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_prow.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out
