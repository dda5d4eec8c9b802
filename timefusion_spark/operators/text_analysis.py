"""Text analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. (LLM-pipeline surface.)

Everything is per-row JVM expression arithmetic over split/filter/regexp —
no UDF, no shuffle; aggregations on top are ordinary hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from timefusion_spark.operators.dedup import gram_join, normalize_text, tokens

# English function words used by the stopword-ratio features. Deliberately
# tiny + hardcoded so the DuckDB oracle can mirror it exactly.
EN_STOPWORDS = ["the", "a", "of", "and", "in", "to", "is"]


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-ish proxy: count regex word pieces (letters runs, digit runs,
    single punctuation) — a deterministic stand-in for a real tokenizer."""
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def stopword_ratio(c: Column) -> Column:
    t = tokens(normalize_text(c))
    n_stop = F.size(F.filter(t, lambda x: x.isin(EN_STOPWORDS)))
    return n_stop.cast("double") / F.size(t)


def avg_token_len(c: Column) -> Column:
    t = tokens(c)
    total = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return total.cast("double") / F.size(t)


def quality_score_parts(n_tok: Column, stop_ratio: Column, atl: Column) -> Column:
    """The quality formula over PRE-STAGED features — the ONE definition
    both quality_score() and staged pipelines (q_training_pipeline)
    compose, so the band constants cannot drift between copies (review
    r12). Mirrored verbatim by the oracles of q_quality_scores and
    q_training_pipeline (whose corpus has no NULL text, so the NULL guard
    below is Spark-side semantics only).

    NULL features propagate to a NULL score: F.least SKIPS NULLs, so
    without the guard a missing document scored ~0.833 — outranking most
    real documents in any quality filter (review r13)."""
    len_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    shape_score = F.when((atl >= 3.0) & (atl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.when(
        n_tok.isNull() | stop_ratio.isNull() | atl.isNull(),
        F.lit(None).cast("double"),
    ).otherwise((len_score + stop_score + shape_score) / 3.0)


def quality_score(c: Column) -> Column:
    """Composite quality score in [0,1]: length band + stopword presence +
    token-length sanity. Deterministic, oracle-mirrorable."""
    return quality_score_parts(token_count(c), stopword_ratio(c), avg_token_len(c))


def english_likelihood(c: Column) -> Column:
    """Language-ID heuristic feature: ratio of English function words.
    (A real n-gram model slots in the same shape — per-row score, then a
    threshold/argmax.)"""
    return stopword_ratio(c)


def doc_fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.
    (Content-addressed identity for exact dedup / lineage joins.)"""
    return F.md5(normalize_text(c))


def ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined token n-grams over an already-staged token
    array (the shared dedup.gram_join kernel). Pass an ATTRIBUTE column
    (withColumn the token split first): transform(sequence) re-reads its
    input per element, so an unstaged split() expression would
    re-tokenize O(len) times.

    A NULL token array yields NULL, not an empty array — masking missing
    documents as 'no ngrams' conflates them with genuinely short docs
    (review r13)."""
    count = F.size(toks) - F.lit(n - 1)
    return (
        F.when(toks.isNull(), F.lit(None).cast("array<string>"))
        .when(count >= 1, gram_join(toks, n))
        .otherwise(F.array().cast("array<string>"))
    )


def dup_token_fraction(toks: Column) -> Column:
    """Gopher-style repetition signal: fraction of tokens that are repeats
    of an earlier token (1 - distinct/total). Pure per-row arithmetic."""
    total = F.size(toks)
    return F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / total


# PII patterns shared by the redaction operator and its DuckDB oracle —
# deliberately lookaround-free so Java regex (Spark) and RE2 (DuckDB)
# agree character-for-character.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# emails whose domain is a dotted quad: PII_EMAIL requires an alphabetic
# TLD, so without this pattern 'john.doe@10.0.0.1' kept its identifying
# local part while only the IP half was redacted (review r13)
PII_EMAIL_IPDOM = r"[A-Za-z0-9._%+-]+@(\d{1,3}\.){3}\d{1,3}"
PII_IPV4 = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"


def redact_pii(c: Column) -> Column:
    """Training-data PII scrub: emails → <EMAIL>, IPv4 → <IP>, phone-ish
    digit runs → <PHONE>. Chained regexp_replace — pure JVM expression,
    map-only at any scale. Order matters: emails first (their local part
    contains digits; IP-domain emails before bare IPs so the dotted quad
    doesn't strand the username), IPs before phones (so dotted quads
    never feed the looser digit-run pattern)."""
    out = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_EMAIL_IPDOM, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")


def hashed_linear_logit(toks: Column) -> Column:
    """fastText-style hashed linear quality model (the CCNet/fastText
    quality-filter shape, public technique): each token maps to a feature
    bucket by hash, each bucket carries a weight, the document logit is
    the mean token weight. Weights here are derived deterministically
    from the hash (stand-ins for trained parameters — the plumbing is the
    operator); classification thresholds the logit at 0, which equals
    sigmoid(logit) >= 0.5 without evaluating exp() (libm vs JVM exp are
    not bit-identical; the linear part is).

    Portable hash: first 4 hex digits of md5 parsed as an int (0..65535)
    — Spark conv(hex,16,10) ≡ DuckDB CAST('0x'||hex AS BIGINT). Weight =
    (h % 1001)/1000 − 0.5 ∈ [−0.5, 0.5].

    `toks` MUST be a materialized token-array column (module note). Pure
    per-row expression work — map-only at any scale."""
    w = lambda tok: (
        (F.conv(F.substring(F.md5(F.lower(tok)), 1, 4), 16, 10).cast("long") % 1001)
        .cast("double")
        / 1000.0
        - 0.5
    )
    return F.aggregate(
        F.transform(toks, w), F.lit(0.0), lambda a, x: a + x
    ) / F.size(toks)
