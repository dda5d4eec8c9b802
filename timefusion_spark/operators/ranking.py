"""BM25 ranked retrieval over a tokenized text column.

The reference's full-text surface is boolean (`text_match`,
tantivy-prefiltered — tantivy_index/udf.rs:1-60); a training-data
pipeline also needs RANKED retrieval — score documents against a term
query and keep the top-k (dedup against eval sets, nearest-neighbor
text mining, retrieval-augmented filtering). BM25 (Robertson/Spärck
Jones, the public Okapi formulation; Lucene's non-negative idf variant)
is the standard lexical ranking function.

Spark-first shape — NO per-document explode, NO tf shuffle:

- per-term tf is a map-side higher-order expression over the token
  array: ``size(filter(toks, x -> x = term))`` — one pass over each
  row, whole-stage codegen, zero Python;
- ALL corpus statistics (N, avgdl, per-term document frequencies) fold
  into ONE global aggregate row — a single partial/final agg of the
  same map-side pass;
- that 1-row frame broadcasts back (BroadcastNestedLoopJoin on a
  one-row build side — the scalar-subquery shape, same as the q11/q22
  threshold joins);
- scoring is a map-side arithmetic expression; top-k is
  ``orderBy().limit()`` → TakeOrderedAndProject.

At 100 TB: two scans of the corpus (one for stats, one for scoring),
each fully parallel with the filter/projection pushed down; the only
data movement is the 1-row stats broadcast. Query terms are bounded
(a user query, not a vocabulary), so the per-row expression stays O(|q|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tf(toks: Column, term: str) -> Column:
    # exact-match term frequency over the token array, map-side
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    delimiter: str = " ",
) -> DataFrame:
    """Score every document against ``terms``; returns (id, dl, score).

    idf is Lucene's non-negative variant ln(1 + (N - df + 0.5)/(df + 0.5));
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).
    Documents matching no term score 0.0 (callers filter or rank as
    needed), including NULL-text rows (coalesced to the empty document —
    a NULL score would silently drop them from `score > 0`-style
    filters' complements). Deterministic: every step is IEEE double
    arithmetic on exact integer tf/dl/df inputs.

    Tokenization: `delimiter` is a LITERAL separator (quoted with
    \\Q…\\E for the underlying regex split), and empty tokens from
    repeated separators are dropped — 'a  b' is 2 tokens, not 3, so
    run-of-spaces padding does not inflate dl and skew the length
    normalization.
    """
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\\Q" + delimiter + "\\E"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(
        F.col(id_col).alias("_bm_id"),
        F.size(toks).alias("dl"),
        *[_tf(toks, t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    # avgdl = 0 (an all-empty corpus) would make dl/avgdl a
    # divide-by-zero NULL that propagates into EVERY score — violating
    # the documented "no-match rows score 0.0" contract and letting a
    # `score > 0` filter silently drop the corpus (review r11); with
    # every dl = 0 the normalized term is 0 regardless, so a floor on
    # the divisor is exact, not an approximation
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("dl") / F.greatest(F.col("avgdl"), F.lit(1e-12))
    )
    score = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        # same floor on THIS divisor: at b=1.0 an empty document (dl=0,
        # tf=0) makes tf + k1*(1-b+b*dl/avgdl) exactly 0 — DIVIDE_BY_ZERO
        # under ANSI, a silent NULL score otherwise (review r13); tf=0
        # makes the numerator 0, so the floored result is exactly 0.0
        part = (
            idf
            * F.col(f"tf_{i}")
            * F.lit(k1 + 1.0)
            / F.greatest(F.col(f"tf_{i}") + norm, F.lit(1e-12))
        )
        score = part if score is None else score + part
    return scored.select(
        F.col("_bm_id").alias(id_col),
        F.col("dl"),
        score.alias("score"),
    )
