"""Full-text match fallback (reference: src/tantivy_index/udf.rs:1-60).

The reference accelerates `text_match(col, query)` with a tantivy sidecar
index but defines correctness as the UDF fallback: case-insensitive AND of
query tokens, each matched as a substring. We implement exactly that
fallback as JVM expressions (`contains(lower(col), token)`), which is the
correctness superset; index acceleration is out of scope (SURVEY §2.13).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def text_match(col: Column, query: str) -> Column:
    """AND-of-tokens case-insensitive substring match; empty query → true."""
    tokens = query.lower().split()
    if not tokens:
        return F.lit(True)
    lowered = F.lower(col)
    cond = lowered.contains(tokens[0])
    for tok in tokens[1:]:
        cond = cond & lowered.contains(tok)
    return F.coalesce(cond, F.lit(False))
