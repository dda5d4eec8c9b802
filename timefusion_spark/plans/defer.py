"""Deferred expensive projection under top-K.

The reference's DeferExpensiveProjection rule
(/root/reference/src/optimizers/defer_expensive_projection.rs) rewrites
`Sort(fetch) ← Projection(expensive)` so JSON-building/casts run only on
the `fetch` surviving rows. SURVEY §4.1 assumed Catalyst largely does
this; the pinned plan test (tests/test_plan_shapes.py) shows it does NOT:
Spark plans `project → TakeOrderedAndProject`, evaluating the expensive
expressions on EVERY input row and only then taking the top K.

Because this engine builds plans through the DataFrame API, the fix is a
construction helper rather than a Catalyst rule: order-and-limit on the
narrow columns first, then project — the expensive expressions evaluate
on exactly `limit` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def take_ordered_then_project(
    df: DataFrame,
    order: list[Column],
    limit: int,
    projections: dict[str, Column],
) -> DataFrame:
    """TopK first, expensive projection after.

    `projections` maps output column name → expression; expressions are
    evaluated only on the `limit` winners. Existing columns pass through.
    The returned frame preserves the requested order (the projection is a
    narrow map over the already-limited rows)."""
    winners = df.orderBy(*order).limit(limit)
    out = winners
    for name, expr in projections.items():
        out = out.withColumn(name, expr)
    return out
