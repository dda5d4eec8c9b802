"""Inverted trigram index for text_match — the tantivy-sidecar analog.

The reference accelerates `text_match` with a tantivy index sidecar
(`tantivy_index/`, TantivyPredicateRewriter) and keeps the AND-of-tokens
substring scan as the correctness fallback (`tantivy_index/udf.rs:1-60`).
A token-inverted index cannot serve that contract exactly — substring
matches cross token boundaries — so this engine uses the pg_trgm design
instead (PostgreSQL's public trigram-index approach for `ILIKE '%…%'`):

- index: every distinct 3-gram of `lower(text)` → one (id, gram) row;
- search: a document can contain token `t` only if it contains ALL
  trigrams of `t`, so candidates are an equi-join against the query's
  trigram literals with a HAVING count(distinct gram) = |grams(t)| gate,
  intersected across tokens;
- verify: the exact `text_match` predicate re-checks every candidate —
  the index can only over-select, never under-select, so the indexed
  path returns byte-identical results to the scan path at any scale.

Scale shape: the index build is map (per-row gram expansion) + one
distinct shuffle on (id, gram); at corpus scale the index persists as a
storage table bucketed by gram so a search touches only the query's gram
partitions. Search-side work is bounded by the candidates of the rarest
trigram — the pg_trgm property that makes `%substring%` queries cheap on
tables where a scan is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timefusion_spark.functions.text import text_match


def _gram_expr(text_col: str) -> Column:
    """All distinct 3-grams of lower(text) as an array — one pass, JVM
    expression only (sequence + transform + substring). The lowered text
    stages through a 1-element array + transform so it evaluates ONCE
    per row: CSE does not reach inside HOF lambdas, and inlining
    `lower(text)` in the gram lambda re-lowercases the whole string per
    gram — O(len²) per document on every build/refresh (review r11; same
    discipline as dedup.py's module note)."""
    return F.expr(
        f"transform(array(lower({text_col})), t -> "
        f"array_distinct(transform("
        f"sequence(1, greatest(length(t) - 2, 1)),"
        f" i -> substring(t, i, 3))))[0]"
    )


N_GRAM_BUCKETS = 64


def gram_bucket(gram: Column) -> Column:
    """Stable partition bucket for a gram (xxhash64 → 0..N_GRAM_BUCKETS-1).
    The index table partitions on this, so a search whose query grams are
    known literals prunes to O(query grams) partitions instead of
    scanning the whole index — the property that keeps a 100-TB corpus's
    index probe-able."""
    return F.pmod(F.xxhash64(gram), F.lit(N_GRAM_BUCKETS)).cast("int")


def trigram_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, gram, gbucket) inverted index over `text_col`. Build = map +
    explode + one distinct shuffle; `gbucket` is the partition column for
    the persisted sidecar table (see gram_bucket). Texts shorter than 3
    chars produce no entries — harmless, because only tokens of ≥ 3 chars
    ever probe the index and no such token can match a shorter text."""
    grams = (
        docs.select(
            F.col(id_col), F.explode(_gram_expr(text_col)).alias("gram")
        )
        .where(F.length("gram") == 3)
        .distinct()
    )
    return grams.withColumn("gbucket", gram_bucket(F.col("gram")))


def raw_term_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """tokenizer='raw' sidecar rows: the WHOLE value as ONE term — the
    reference's `raw` tantivy tokenizer (schemas/*.yaml `tantivy:
    {tokenizer: raw}`; routing table tantivy_rewriter.rs:29-48), which
    serves only equality / exact-term probes and declines substring
    shapes. Same sidecar schema as the trigram index (id, gram, gbucket)
    so the storage/refresh machinery is shared; one row per document
    instead of one per trigram."""
    return docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.col(text_col).alias("gram"),
        gram_bucket(F.col(text_col)).alias("gbucket"),
    )


def raw_term_search(
    docs: DataFrame,
    index: DataFrame,
    term: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents with text_col = term, served from a raw-term sidecar:
    bucket-pruned exact-term probe for candidate ids, then the equality
    predicate re-applies (additive contract — the index only prunes, so
    the answer is byte-identical to the scan path even with stale
    over-selecting rows)."""
    ids = (
        index.where(
            (F.col("gbucket") == gram_bucket(F.lit(term)))
            & (F.col("gram") == F.lit(term))
        )
        .select(id_col)
        .distinct()
    )
    return docs.join(ids, id_col, "left_semi").where(F.col(text_col) == F.lit(term))


def raw_terms_search(
    docs: DataFrame,
    index: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents with text_col IN (terms), served from a raw-term sidecar
    — the reference's IN-list routing (tantivy_rewriter.rs:8-10,159: an
    IN on a raw column routes as an OR of per-item term probes, capped at
    MAX_ROUTED_IN_LIST upstream). Bucket pruning ORs each term's bucket;
    the membership predicate re-applies (additive contract)."""
    bucket_pred = None
    for t in terms:
        eq = F.col("gbucket") == gram_bucket(F.lit(t))
        bucket_pred = eq if bucket_pred is None else (bucket_pred | eq)
    ids = (
        index.where(bucket_pred & F.col("gram").isin(list(terms)))
        .select(id_col)
        .distinct()
    )
    return docs.join(ids, id_col, "left_semi").where(
        F.col(text_col).isin(list(terms))
    )


def raw_prefix_search(
    docs: DataFrame,
    index: DataFrame,
    prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents with text_col LIKE 'prefix%', served from a raw-term
    sidecar: the whole-value terms are scanned with a startswith probe
    (the tantivy term-range analog — tantivy_rewriter.rs:33 routes
    prefix-LIKE on every tokenizer; a raw term dictionary serves it as a
    range scan). No bucket pruning is possible — gbucket hashes the WHOLE
    value — but the index is (id, term) only, far narrower than the
    corpus scan it replaces. The LIKE predicate re-applies (additive
    contract: byte-identical to the scan path)."""
    ids = (
        index.where(F.col("gram").startswith(prefix))
        .select(id_col)
        .distinct()
    )
    return docs.join(ids, id_col, "left_semi").where(
        F.col(text_col).startswith(prefix)
    )


def trigram_literals_candidates(
    index: DataFrame, literals: list[str], id_col: str = "doc_id"
) -> DataFrame | None:
    """Candidate ids whose text contains ALL trigrams of EVERY qualifying
    literal, computed in ONE bucket-pruned index pass + ONE aggregate —
    per-literal membership rides the same groupBy as a conditional
    count_distinct, so an n-literal conjunction costs one shuffle instead
    of n probe aggregates intersected through n−1 joins (optimization
    r14, guide §1.2/§2.4; the candidate set is identical — each literal's
    HAVING-count gate is evaluated per id from the same distinct grams).

    Literals too short to produce a full trigram are SKIPPED (a trigram
    index cannot prune them; callers re-verify exactly). Returns None
    when no literal qualifies — the caller declines to the scan path."""
    gram_sets: list[list[str]] = []
    for literal in literals:
        lowered = literal.lower()
        grams = sorted({lowered[i : i + 3] for i in range(len(lowered) - 2)})
        if grams:
            gram_sets.append(grams)
    if not gram_sets:
        return None
    all_grams = sorted({g for gs in gram_sets for g in gs})
    probe = index.where(F.col("gram").isin(all_grams))
    if "gbucket" in index.columns:
        # partition pruning: gram_bucket(lit) is a foldable expression
        # (xxhash64 of a constant), so Catalyst folds each equality to a
        # literal and the partition filter prunes the bucketed index to
        # O(|query grams|) partitions before any I/O
        bucket_pred = None
        for g in all_grams:
            eq = F.col("gbucket") == gram_bucket(F.lit(g))
            bucket_pred = eq if bucket_pred is None else (bucket_pred | eq)
        probe = probe.where(bucket_pred)
    aggs = []
    cond = None
    for i, gs in enumerate(gram_sets):
        aggs.append(
            F.count_distinct(
                F.when(F.col("gram").isin(gs), F.col("gram"))
            ).alias(f"_ng{i}")
        )
        c = F.col(f"_ng{i}") == len(gs)
        cond = c if cond is None else (cond & c)
    return probe.groupBy(id_col).agg(*aggs).where(cond).select(id_col)


def trigram_literal_candidates(
    index: DataFrame, literal: str, id_col: str = "doc_id"
) -> DataFrame | None:
    """Candidate ids whose text contains ALL trigrams of lower(literal)
    — the pg_trgm pruning primitive behind LIKE/ILIKE serving
    (tantivy_rewriter.rs:33-40: prefix/substring/suffix shapes route via
    ngram). Unlike trigram_search's per-token probes, the literal is
    taken VERBATIM (a LIKE chunk may contain spaces, and the index holds
    space-crossing grams because _gram_expr slides over the whole
    string). Returns None when the literal is too short to produce a
    full trigram (NGRAM_MIN_QUERY_LEN analog) — the caller declines.
    The single-literal case of trigram_literals_candidates (one
    definition; review r11)."""
    return trigram_literals_candidates(index, [literal], id_col=id_col)


def trigram_like_search(
    docs: DataFrame,
    index: DataFrame,
    literal: str,
    predicate: Column,
    id_col: str = "doc_id",
) -> DataFrame | None:
    """Documents satisfying a LIKE/ILIKE/regex-contains `predicate` whose
    pattern contains the plain chunk `literal`, candidate-pruned by the
    trigram sidecar. The index is lowercase, so candidates over-select
    across case for case-sensitive predicates — harmless, the exact
    predicate re-applies (additive contract). Returns None when the
    literal is too short for a full trigram — the caller declines to the
    scan path."""
    cand = trigram_literal_candidates(index, literal, id_col=id_col)
    if cand is None:
        return None
    return docs.join(cand, id_col, "left_semi").where(predicate)


def query_trigrams(token: str) -> list[str]:
    return [token[i : i + 3] for i in range(len(token) - 2)]


def trigram_search(
    docs: DataFrame,
    index: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents matching text_match(text, query), served index-first.

    Per qualifying token (≥ 3 chars): candidates = ids holding ALL of the
    token's trigrams (equi-join on gram literals, HAVING-count gate);
    token candidate sets intersect INSIDE one aggregate — the whole
    multi-token conjunction is a single bucket-pruned index pass (see
    trigram_literals_candidates; the old per-token probes paid one
    aggregate + one intersect join per token). Tokens under 3 chars
    cannot be pruned by a trigram index and fall through to the verify
    stage. The final text_match verify makes the result EXACTLY the scan
    path's — the index only prunes."""
    tokens = [tok for tok in query.lower().split() if tok]
    cand = trigram_literals_candidates(index, tokens, id_col=id_col)
    pruned = docs if cand is None else docs.join(cand, id_col, "left_semi")
    return pruned.where(text_match(F.col(text_col), query))
