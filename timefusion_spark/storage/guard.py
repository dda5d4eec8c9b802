"""Multi-tenant project_id guard (optimizers/mod.rs:181-216).

The reference requires every query against a routed table to pin a tenant:
a `project_id = 'x'` equality, possibly inside an AND-conjunct chain.
OR is deliberately NOT accepted — `project_id = 'a' OR project_id = 'b'`
reports "no guard" so the query errors instead of silently scanning all
tenants (the reference's documented strictness).

Spark-first: the check walks the CATALYST expression tree of the parsed
predicate (not a string regex), so parenthesization, argument order and
literal quoting are handled by the real SQL parser.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _parse_expression(predicate: str):
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession for predicate parsing")
    return spark._jsparkSession.sessionState().sqlParser().parseExpression(predicate)


def _walk_contains_project_id(jexpr) -> bool:
    name = jexpr.getClass().getSimpleName()
    if name == "And":
        return _walk_contains_project_id(jexpr.left()) or _walk_contains_project_id(
            jexpr.right()
        )
    if name == "EqualTo":
        left, right = jexpr.left(), jexpr.right()

        def is_pid_col(e) -> bool:
            # match the LAST name part case-insensitively: Spark resolves
            # columns case-insensitively and `t.project_id = 'x'` is a
            # legitimately tenant-pinned predicate — the bare exact-case
            # compare rejected both (review r11; fail-safe direction, but
            # valid queries errored)
            if e.getClass().getSimpleName() != "UnresolvedAttribute":
                return False
            return e.name().rsplit(".", 1)[-1].lower() == "project_id"

        def is_lit(e) -> bool:
            return e.getClass().getSimpleName() == "Literal"

        return (is_pid_col(left) and is_lit(right)) or (is_lit(left) and is_pid_col(right))
    return False


def contains_project_id(predicate: str) -> bool:
    """True iff the predicate pins project_id via equality in an
    AND-conjunct chain (OR never qualifies)."""
    return _walk_contains_project_id(_parse_expression(predicate))


def require_project_guard(predicate: str) -> None:
    if not contains_project_id(predicate):
        raise ValueError(
            "query must filter on project_id = '<tenant>' (AND-conjuncts "
            "only; OR across projects is rejected by design — "
            "optimizers/mod.rs:192-216)"
        )
