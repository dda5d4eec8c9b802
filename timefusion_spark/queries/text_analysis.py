"""Text-analysis queries over `documents` (LLM-pipeline surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timefusion_spark.operators import dedup as dd
from timefusion_spark.operators import text_analysis as ta
from timefusion_spark.queries._tables import t
from timefusion_spark.registry import query

# DuckDB-side mirrors of the expression building blocks (kept adjacent to
# the Spark ones so drift is visible in review).
_ORACLE_TOKENS = "string_split_regex(trim(text), '\\s+')"
_ORACLE_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_ORACLE_STOP_RATIO = (
    "len(list_filter(string_split_regex(" + _ORACLE_NORM + ", '\\s+'), "
    "x -> x IN ('the','a','of','and','in','to','is')))::DOUBLE / len(" + _ORACLE_TOKENS + ")"
)
_ORACLE_ATL = (
    "list_sum(list_transform(" + _ORACLE_TOKENS + ", x -> length(x)))::DOUBLE / len(" + _ORACLE_TOKENS + ")"
)


@query(
    "q_token_stats",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_ORACLE_TOKENS})) AS BIGINT) AS total_tokens,
           ROUND(AVG(len({_ORACLE_TOKENS})), 4) AS avg_tokens,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="Whitespace token counting + per-source corpus stats.",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    n_tok = ta.token_count(F.col("text"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            F.round(F.avg(n_tok), 4).alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


@query(
    "q_quality_scores",
    oracle=f"""
    SELECT doc_id,
           len({_ORACLE_TOKENS}) AS n_tokens,
           ROUND({_ORACLE_STOP_RATIO}, 4) AS stop_ratio,
           ROUND({_ORACLE_ATL}, 4) AS avg_token_len,
           ROUND((
               least(len({_ORACLE_TOKENS}) / 50.0, 1.0)
             + least(({_ORACLE_STOP_RATIO}) * 5.0, 1.0)
             + (CASE WHEN ({_ORACLE_ATL}) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
           ) / 3.0, 4) AS quality
    FROM documents
    ORDER BY doc_id
    """,
    doc="Per-document quality scoring (length/stopword/token-shape bands).",
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ta.token_count(F.col("text")).alias("n_tokens"),
        F.round(ta.stopword_ratio(F.col("text")), 4).alias("stop_ratio"),
        F.round(ta.avg_token_len(F.col("text")), 4).alias("avg_token_len"),
        F.round(ta.quality_score(F.col("text")), 4).alias("quality"),
    ).orderBy("doc_id")


@query(
    "q_langid_heuristic",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG({_ORACLE_STOP_RATIO}), 4) AS avg_en_score,
           COUNT(*) FILTER (WHERE ({_ORACLE_STOP_RATIO}) >= 0.05) AS n_english_guess
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Language-ID heuristic: English function-word ratio per labeled lang.",
)
def q_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    score = ta.english_likelihood(F.col("text"))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(score), 4).alias("avg_en_score"),
            F.count(F.when(score >= 0.05, 1)).alias("n_english_guess"),
        )
        .orderBy("lang")
    )


@query(
    "q_doc_fingerprints",
    oracle=f"""
    SELECT md5({_ORACLE_NORM}) AS fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    ORDER BY keep_id
    """,
    doc="Document fingerprinting (md5 of normalized text) + exact-dedup "
    "grouping — hash-groupBy dedup at any scale.",
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return (
        d.select(ta.doc_fingerprint(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_id")
    )


@query(
    "q_training_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source,
               (least(len({_ORACLE_TOKENS}) / 50.0, 1.0)
              + least(({_ORACLE_STOP_RATIO}) * 5.0, 1.0)
              + (CASE WHEN ({_ORACLE_ATL}) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
               ) / 3.0 AS q,
               {_ORACLE_STOP_RATIO} AS en,
               md5({_ORACLE_NORM}) AS fp,
               len({_ORACLE_TOKENS}) AS n_tok
        FROM documents
    ),
    filtered AS (SELECT * FROM scored WHERE q >= 0.5 AND en >= 0.05),
    uniq AS (
        SELECT source, n_tok,
               ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM filtered
    ),
    funnel AS (
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(*) FILTER (WHERE q >= 0.5) AS n_quality,
               COUNT(*) FILTER (WHERE q >= 0.5 AND en >= 0.05) AS n_english
        FROM scored GROUP BY source
    ),
    kept AS (
        SELECT source,
               CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_unique,
               CAST(COALESCE(SUM(n_tok) FILTER (WHERE rn = 1), 0) AS BIGINT) AS total_tokens_kept
        FROM uniq GROUP BY source
    )
    SELECT f.source, f.n_docs, f.n_quality, f.n_english,
           COALESCE(k.n_unique, 0) AS n_unique,
           COALESCE(k.total_tokens_kept, 0) AS total_tokens_kept
    FROM funnel f LEFT JOIN kept k ON f.source = k.source
    ORDER BY f.source
    """,
    doc="End-to-end training-data prep funnel (LLM-pipeline composition): "
    "quality scoring → language gate → exact dedup (keep min doc_id per "
    "fingerprint) → token-budget accounting, all per source. Every stage "
    "is the registered operator (quality_score, english_likelihood, "
    "doc_fingerprint, token_count) composed in one distributed plan: two "
    "shuffles total (fingerprint window + final agg) at any corpus size.",
)
def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    # SINGLE-PASS plan: one scan, staged token/normalized columns (each
    # regex split evaluated once per row — quality_score alone would
    # otherwise re-tokenize 4×), then ONE fp-window + ONE aggregation.
    # The funnel counts and the post-dedup "kept" totals come out of the
    # same aggregate: the fp window orders passing docs first, so
    # `pass AND rn = 1` is exactly "the min-doc_id passing doc of its
    # fingerprint group" — no second scan, no funnel⋈kept join.
    staged = d.select(
        "doc_id",
        "source",
        dd.tokens(F.col("text")).alias("_tk"),
        dd.normalize_text(F.col("text")).alias("_norm"),
    ).select(
        "doc_id",
        "source",
        "_tk",
        "_norm",
        F.split("_norm", r"\s+").alias("_ntk"),
    )
    n_tok = F.size("_tk")
    atl = F.expr(
        "aggregate(_tk, 0L, (a, x) -> a + length(x))"
    ).cast("double") / n_tok
    stop_ratio = (
        F.size(F.filter("_ntk", lambda x: x.isin(ta.EN_STOPWORDS))).cast("double")
        / n_tok
    )
    scored = staged.select(
        "doc_id",
        "source",
        n_tok.alias("n_tok"),
        # ONE formula definition, composed over the staged features
        # (review r12: the band constants were inlined here too)
        ta.quality_score_parts(n_tok, stop_ratio, atl).alias("q"),
        stop_ratio.alias("en"),
        F.md5("_norm").alias("fp"),
    )
    passed = (F.col("q") >= 0.5) & (F.col("en") >= 0.05)
    ranked = scored.withColumn("_pass", passed).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("fp").orderBy(F.col("_pass").desc(), "doc_id")
        ),
    )
    kept = F.col("_pass") & (F.col("rn") == 1)
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("q") >= 0.5, 1)).alias("n_quality"),
            F.count(F.when(F.col("_pass"), 1)).alias("n_english"),
            F.count(F.when(kept, 1)).alias("n_unique"),
            F.coalesce(F.sum(F.when(kept, F.col("n_tok"))), F.lit(0)).alias(
                "total_tokens_kept"
            ),
        )
        .orderBy("source")
    )


@query(
    "q_bpe_ish_tokens",
    oracle="""
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]'))) AS BIGINT) AS total_pieces
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="BPE-ish regex token counting (letter runs / digit runs / punct).",
)
def q_bpe_ish_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(F.sum(ta.bpe_ish_token_count(F.col("text"))).alias("total_pieces"))
        .orderBy("source")
    )


@query(
    "q_repetition_signals",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_ORACLE_TOKENS} AS tk FROM documents WHERE doc_id < 200
    ),
    base AS (
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               ROUND(1 - len(list_distinct(tk))::DOUBLE / len(tk), 4) AS dup_word_frac
        FROM toks
    ),
    bg AS (
        SELECT doc_id, tk[u.i] || ' ' || tk[u.i + 1] AS g
        FROM toks CROSS JOIN unnest(generate_series(1, len(tk) - 1)) AS u(i)
    ),
    counts AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g),
    top AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n FROM counts GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens, b.dup_word_frac, t.top_bigram_n,
           ROUND(t.top_bigram_n::DOUBLE / (b.n_tokens - 1), 4) AS top_bigram_frac
    FROM base b JOIN top t USING (doc_id)
    ORDER BY doc_id
    """,
    doc="Gopher-style repetition quality signals (beyond-reference, "
    "LLM-pipeline brief; cf. Rae et al. 2021 'massive text' repetition "
    "filters): per-document duplicate-token fraction (pure per-row "
    "arithmetic) and most-frequent-bigram count/fraction (explode + "
    "map-side-combinable count — one shuffle keyed on (doc_id, gram), no "
    "all-pairs anything). Repetitious machine-generated text scores high "
    "on both and gets filtered before training.",
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.operators.dedup import tokens

    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .withColumn("_toks", tokens(F.col("text")))
    )
    base = d.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.round(ta.dup_token_fraction(F.col("_toks")), 4).alias("dup_word_frac"),
    )
    top = (
        d.select("doc_id", F.explode(ta.ngrams(F.col("_toks"), 2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    return (
        base.join(top, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "dup_word_frac",
            "top_bigram_n",
            F.round(
                F.col("top_bigram_n").cast("double") / (F.col("n_tokens") - 1), 4
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_chunk_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_ORACLE_TOKENS} AS tk FROM documents WHERE doc_id < 100
    ),
    par AS (
        SELECT doc_id, tk,
               CASE WHEN len(tk) <= 20 THEN 1
                    ELSE CAST(CEIL((len(tk) - 20) / 15.0) AS BIGINT) + 1 END AS nc
        FROM toks
    )
    SELECT doc_id,
           u.k AS chunk_index,
           CAST(len(tk[(u.k * 15 + 1):(u.k * 15 + 20)]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(tk[(u.k * 15 + 1):(u.k * 15 + 20)], ' ') AS chunk_text
    FROM par CROSS JOIN unnest(generate_series(0, nc - 1)) AS u(k)
    ORDER BY doc_id, chunk_index
    """,
    doc="Sliding-window chunking with overlap (beyond-reference, "
    "LLM-pipeline brief): 20-token windows at stride 15 (5-token overlap "
    "preserves cross-boundary context), short final window, one chunk for "
    "short docs — packing.chunk_with_overlap, a map-only "
    "sequence→transform→posexplode stage with zero shuffle.",
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.operators.dedup import tokens
    from timefusion_spark.operators.packing import chunk_with_overlap

    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 100)
        .withColumn("_toks", tokens(F.col("text")))
    )
    return (
        chunk_with_overlap(d, F.col("_toks"), size=20, stride=15)
        .select(
            "doc_id",
            "chunk_index",
            F.size("chunk_tokens").cast("long").alias("n_chunk_tokens"),
            F.array_join("chunk_tokens", " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_index")
    )


@query(
    "q_pii_redaction",
    oracle="""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact u' || CAST(doc_id AS VARCHAR)
                    || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.1 or +1 555-01' || CAST(100 + doc_id % 100 AS VARCHAR) AS t
        FROM documents WHERE doc_id < 150
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '[A-Za-z0-9._%+-]+@(\\d{1,3}\\.){3}\\d{1,3}', '<EMAIL>', 'g'),
               '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
             '\\+?\\d[\\d\\- ]{7,}\\d', '<PHONE>', 'g') AS redacted
    FROM aug
    ORDER BY doc_id
    """,
    doc="PII redaction (beyond-reference, LLM-pipeline brief): emails, "
    "IPv4 addresses, and phone-like digit runs replaced with typed "
    "placeholders via chained regexp_replace — a map-only JVM expression "
    "stage, no UDF, no shuffle. PII is injected deterministically into "
    "the documents so both engines scrub identical text; patterns are "
    "lookaround-free so Java regex and RE2 agree. Counts run "
    "regexp_count on the AUGMENTED text (raw + injected PII — matching "
    "the oracle's aug CTE); the redacted text is hash-compared.",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"), F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 or +1 555-01"), (100 + F.col("doc_id") % 100).cast("string"),
        ).alias("t"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count("t", F.lit(ta.PII_EMAIL)).alias("n_emails"),
        F.regexp_count("t", F.lit(ta.PII_IPV4)).alias("n_ips"),
        ta.redact_pii(F.col("t")).alias("redacted"),
    ).orderBy("doc_id")


@query(
    "q_vocab_mining",
    oracle=f"""
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(string_split_regex({_ORACLE_NORM}, '\\s+')) AS tok
        FROM documents
    )
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 50
    """,
    doc="Tokenizer vocabulary mining (LLM-pipeline): corpus-wide token "
    "frequency over normalized text, top-50 by count. Scale shape: "
    "explode → map-side-combinable hash aggregate on the token key → "
    "TakeOrderedAndProject; token skew (stopwords) is exactly what the "
    "partial aggregation absorbs — the hot key is pre-summed per "
    "partition before the shuffle.",
)
def q_vocab_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(dd.normalize_text(F.col("text")), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(50)
    )


@query(
    "q_bpe_merge_candidates",
    oracle=f"""
    WITH toks AS (SELECT string_split_regex({_ORACLE_NORM}, '\\s+') AS tk FROM documents),
    pairs AS (
        SELECT tk[u.i] AS l, tk[u.i + 1] AS r
        FROM toks CROSS JOIN unnest(generate_series(1, len(tk) - 1)) AS u(i)
    )
    SELECT l, r, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs
    GROUP BY l, r
    ORDER BY n DESC, l, r
    LIMIT 20
    """,
    doc="BPE merge-candidate mining (tokenizer training, step 1 of each "
    "merge round): count adjacent-symbol pairs corpus-wide, rank by "
    "frequency — the argmax pair is the next merge. posexplode over the "
    "staged token array keeps it one generate + one aggregate; at corpus "
    "scale the pair key-space is bounded by vocab², and partial "
    "aggregation collapses the heavy head before the shuffle.",
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    staged = d.select(F.split(dd.normalize_text(F.col("text")), r"\s+").alias("tk"))
    pairs = staged.select(
        F.explode(
            F.expr(
                "CASE WHEN size(tk) >= 2 THEN "
                "transform(sequence(1, size(tk) - 1), "
                "i -> named_struct('l', element_at(tk, i), 'r', element_at(tk, i + 1))) "
                "ELSE array() END"
            )
        ).alias("p")
    ).select("p.l", "p.r")
    return (
        pairs.groupBy("l", "r")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "l", "r")
        .limit(20)
    )


@query(
    "q_decontamination",
    oracle=f"""
    WITH norm AS (SELECT doc_id, string_split_regex({_ORACLE_NORM}, '\\s+') AS tk FROM documents),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(tk) - 4),
                   i -> list_aggregate(tk[i:i+4], 'string_agg', ' ')))) AS g
        FROM norm WHERE len(tk) >= 5
    ),
    bench AS (SELECT doc_id, g FROM sh WHERE doc_id < 10),
    corpus AS (SELECT doc_id, g FROM sh WHERE doc_id >= 10)
    SELECT b.doc_id,
           CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_contaminated
    FROM bench b JOIN corpus c ON b.g = c.g
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
    doc="Train/test decontamination (LLM-pipeline): for each benchmark "
    "document (doc_id < 10), count corpus documents sharing at least one "
    "5-word shingle. Scale shape: the benchmark shingle set is tiny and "
    "BROADCAST — the corpus side streams through a broadcast hash join "
    "(no corpus shuffle), then a distinct-count per benchmark doc. At "
    "100 TB the corpus explode stays map-local and only matching "
    "(bench_doc, corpus_doc) pairs reach the aggregate; production would "
    "join on shingle hashes rather than strings (same plan shape).",
)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", F.split(dd.normalize_text(F.col("text")), r"\s+").alias("tk")
    ).where(F.size("tk") >= 5)
    sh = staged.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, size(tk) - 4), "
                "i -> concat_ws(' ', slice(tk, i, 5))))"
            )
        ).alias("g"),
    )
    bench = sh.where(F.col("doc_id") < 10).withColumnRenamed("doc_id", "bench_id")
    corpus = sh.where(F.col("doc_id") >= 10)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("bench_id")
        .agg(F.countDistinct("doc_id").alias("n_contaminated"))
        .select(F.col("bench_id").alias("doc_id"), "n_contaminated")
        .orderBy("doc_id")
    )


@query(
    "q_decontamination_bloom",
    # Same oracle as q_decontamination ON PURPOSE: the Bloom filter is a
    # no-false-negative PREFILTER and every survivor is exact-verified,
    # so the result set must be identical to the exact path — the driver
    # gate certifies both the bloom construction and the probe.
    oracle=None,  # bound after q_decontamination registers (see below)
    doc="Bloom-filter decontamination — the fixed-size-filter variant of "
    "q_decontamination for when the benchmark gram set outgrows a "
    "broadcast hash set: benchmark 5-word shingles build an "
    "expression-level Bloom filter (2^17 bits, 4 salted xxhash64 "
    "probes — one partial-aggregatable groupBy(word)+bit_or, filter "
    "size independent of benchmark size), the corpus probes it "
    "MAP-SIDE via a 1-row scalar broadcast (no corpus shuffle, no "
    "broadcast of the gram set itself), and only the ~0.2%-FPR "
    "survivors reach the exact broadcast join that restores 100% "
    "precision. Result is bit-identical to the exact path by "
    "construction (a Bloom filter admits no false negatives).",
)
def q_decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    m_bits = 1 << 17
    d = t(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id", F.split(dd.normalize_text(F.col("text")), r"\s+").alias("tk")
    ).where(F.size("tk") >= 5)
    sh = staged.select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, size(tk) - 4), "
                "i -> concat_ws(' ', slice(tk, i, 5))))"
            )
        ).alias("g"),
    )
    bench = sh.where(F.col("doc_id") < 10).withColumnRenamed("doc_id", "bench_id")
    corpus = sh.where(F.col("doc_id") >= 10)
    bloom = dd.bloom_build(bench.select("g"), "g", m_bits)
    survivors = corpus.crossJoin(F.broadcast(bloom)).where(
        F.expr(dd.bloom_might_contain_sql("g", m_bits))
    )
    return (
        survivors.join(F.broadcast(bench), "g")
        .groupBy("bench_id")
        .agg(F.countDistinct("doc_id").alias("n_contaminated"))
        .select(F.col("bench_id").alias("doc_id"), "n_contaminated")
        .orderBy("doc_id")
    )


from timefusion_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["q_decontamination_bloom"].oracle = _REG["q_decontamination"].oracle


@query(
    "q_heavy_hitters_sketch",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split_regex({_ORACLE_NORM}, '\\s+')) AS tok
        FROM documents
    ),
    cm AS (
        SELECT i, substring(md5(tok || '#' || CAST(i AS VARCHAR)), 1, 2) AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM toks CROSS JOIN unnest([0, 1, 2, 3]) AS u(i)
        GROUP BY i, b
    ),
    top AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM toks GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 10
    ),
    probe AS (
        SELECT t.tok, t.exact_n, u.i,
               substring(md5(t.tok || '#' || CAST(u.i AS VARCHAR)), 1, 2) AS b
        FROM top t CROSS JOIN unnest([0, 1, 2, 3]) AS u(i)
    )
    SELECT p.tok, p.exact_n,
           MIN(cm.c) AS est_n,
           MIN(cm.c) - p.exact_n AS overcount
    FROM probe p JOIN cm ON p.i = cm.i AND p.b = cm.b
    GROUP BY p.tok, p.exact_n
    ORDER BY p.exact_n DESC, p.tok
    """,
    doc="Count-min heavy-hitters sketch (mergeable-UDAF family #3, next "
    "to the histogram percentile digest and the linear-counting distinct "
    "sketch): 4 hash rows × 256 buckets with an engine-portable salted-md5 "
    "bucket function; a token's estimate is the MIN over its 4 counters "
    "(always ≥ exact). Counter tables compose by addition, so partial "
    "sketches from corpus shards merge exactly — the property that lets a "
    "1000-executor pass estimate token frequencies in one shuffle of "
    "4×256 counters instead of a vocab-sized aggregation. Exact counts "
    "for the top-10 ride alongside as the error reference.",
)
def q_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(dd.normalize_text(F.col("text")), r"\s+")).alias("tok")
    )
    def salt_buckets(df: DataFrame, *carry: str) -> DataFrame:
        # the sketch's bucket function is its correctness contract with
        # the oracle — ONE definition for both the build and the probe
        # (review r12: the expression was pasted verbatim in each)
        return df.select(
            *carry, F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i")
        ).select(
            *carry,
            "i",
            F.substring(
                F.md5(F.concat(F.col("tok"), F.lit("#"), F.col("i").cast("string"))),
                1,
                2,
            ).alias("b"),
        )

    salted = salt_buckets(toks, "tok")
    cm = salted.groupBy("i", "b").agg(F.count(F.lit(1)).alias("c"))
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "tok")
        .limit(10)
    )
    probe = salt_buckets(top, "tok", "exact_n")
    return (
        F.broadcast(probe)
        .join(cm, ["i", "b"])
        .groupBy("tok", "exact_n")
        .agg(F.min("c").alias("est_n"), (F.min("c") - F.col("exact_n")).alias("overcount"))
        .orderBy(F.col("exact_n").desc(), "tok")
    )


# Per-language function-word profiles for multi-language ID. Tiny and
# hardcoded so the DuckDB oracle mirrors them exactly.
_LANG_PROFILES = {
    "de": ["der", "die", "und", "das", "ist", "von", "ein"],
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "es": ["el", "la", "de", "y", "los", "en", "que"],
    "fr": ["le", "la", "de", "et", "un", "les", "des"],
}


def _langid_case(score):
    """Shared argmax-with-lexicographic-tiebreak CASE over the 4 language
    scores; `score` formats a per-language score expression."""
    s = {lang: score(lang) for lang in _LANG_PROFILES}
    return (
        f"CASE WHEN {s['de']} >= {s['en']} AND {s['de']} >= {s['es']} AND {s['de']} >= {s['fr']} THEN 'de' "
        f"WHEN {s['en']} >= {s['es']} AND {s['en']} >= {s['fr']} THEN 'en' "
        f"WHEN {s['es']} >= {s['fr']} THEN 'es' ELSE 'fr' END"
    )


_LANGID_ORACLE_PRED = _langid_case(
    lambda l: "len(list_filter(ntk, x -> x IN ("
    + ", ".join("'" + w + "'" for w in _LANG_PROFILES[l])
    + ")))"
)

_LANGID_ORACLE = (
    "WITH scored AS (SELECT lang, "
    + _LANGID_ORACLE_PRED
    + " AS predicted FROM (SELECT lang, string_split_regex("
    + _ORACLE_NORM
    + ", '\\s+') AS ntk FROM documents)) "
    + "SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n FROM scored "
    + "GROUP BY lang, predicted ORDER BY lang, predicted"
)


@query(
    "q_langid_multi",
    oracle=_LANGID_ORACLE,
    doc="Multi-language ID (argmax over per-language function-word "
    "profiles, lexicographic tiebreak) with the labeled-vs-predicted "
    "confusion matrix — the n-gram language classifier shape of a "
    "training-data pipeline. Map-only per-row scoring over ONE staged "
    "token array (4 profile scans per row), then a single hash aggregate "
    "on the (label, prediction) grid.",
)
def q_langid_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    staged = d.select(
        "lang", F.split(dd.normalize_text(F.col("text")), r"\s+").alias("ntk")
    )
    pred = F.expr(
        _langid_case(
            lambda l: "size(filter(ntk, x -> x IN ("
            + ", ".join("'" + w + "'" for w in _LANG_PROFILES[l])
            + ")))"
        )
    )
    return (
        staged.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


@query(
    "q_group_rank_pandas",
    oracle="""
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT) AS size_rank
    FROM documents
    WHERE doc_id < 200
    ORDER BY source, size_rank, doc_id
    """,
    doc="Grouped-map applyInPandas (§2.11 — the remaining Pandas-UDF "
    "extension point next to mapInPandas and applyInPandasWithState): "
    "per-source ranking computed in pandas on Arrow-shipped group frames. "
    "Integer output keeps it bit-exact against the window-function "
    "oracle (ROW_NUMBER over the same unique ordering). Scale shape: one shuffle on the group key, each group "
    "processed columnar in a single worker pass — the escape hatch for "
    "per-group logic Spark expressions can't state (here deliberately "
    "one they CAN, so the oracle pins correctness).",
)
def q_group_rank_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200).select(
        "doc_id", "source", "n_chars"
    )

    def rank_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        # positional rank (the (n_chars, doc_id) order is unique, so SQL
        # ROW_NUMBER over the same ordering is deterministic)
        pdf["size_rank"] = range(1, len(pdf) + 1)
        return pdf[["doc_id", "source", "size_rank"]]

    return (
        d.groupBy("source")
        .applyInPandas(rank_group, schema="doc_id long, source string, size_rank long")
        .orderBy("source", "size_rank", "doc_id")
    )


@query(
    "q_log_templates",
    oracle="""
    WITH tpl AS (
      SELECT doc_id,
             regexp_replace(lower(trim(text)), '[0-9]+', '#', 'g') AS template
      FROM documents
    )
    SELECT md5(template) AS template_id,
           COUNT(*) AS n,
           MIN(doc_id) AS first_doc,
           MIN(length(template)) AS template_len
    FROM tpl
    GROUP BY template
    ORDER BY n DESC, template_id
    LIMIT 25
    """,
    doc="Log-template mining (observability log clustering): lines "
    "normalize to templates by masking numeric literals, then group — "
    "the Drain-style template-extraction idea as ONE map-side-combinable "
    "hash aggregate + top-K, pure expression work (no UDF, no iterative "
    "tree). Output keys on md5(template) so wide templates hash-compare "
    "compactly.",
)
def q_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    template = F.regexp_replace(F.lower(F.trim(F.col("text"))), "[0-9]+", "#")
    return (
        d.select(template.alias("template"), "doc_id")
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("first_doc"),
        )
        .select(
            F.md5("template").alias("template_id"),
            "n",
            "first_doc",
            F.length("template").cast("long").alias("template_len"),
        )
        .orderBy(F.col("n").desc(), "template_id")
        .limit(25)
    )


@query(
    "q_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
    ), tot AS (
      SELECT COUNT(*) AS t FROM toks
    ), scored AS (
      SELECT s.source,
             CAST(-ln(CAST(f.c AS DOUBLE) / tot.t) AS DECIMAL(28,12)) AS nll
      FROM toks s JOIN freq f ON s.tok = f.tok, tot
    )
    SELECT source,
           COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 4) AS avg_nll
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    doc="Unigram cross-entropy quality scoring (the KenLM-style "
    "perplexity-proxy filter at unigram order): corpus token frequencies "
    "-> per-token -ln p -> per-source average negative log-likelihood. "
    "Two aggregates and one broadcast join; per-token NLL terms are cast "
    "to DECIMAL before summing so the aggregation is order-independent "
    "and engine-identical. At 100 TB the vocab side is bounded (top-V + "
    "OOV bucket) and broadcasts; the corpus side never shuffles twice.",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # corpus total as a 1-row broadcast, not an unpartitioned window —
    # F.sum().over(partitionBy()) funnels the whole vocab through ONE
    # window task (review r12; q_bigram_perplexity_filter already uses
    # this shape)
    total = freq.agg(F.sum("c").alias("t"))
    freq = freq.crossJoin(F.broadcast(total))
    nll = (-F.log(F.col("c").cast("double") / F.col("t"))).cast("decimal(28,12)")
    scored = toks.join(F.broadcast(freq), "tok").select("source", nll.alias("nll"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("nll").cast("double") / F.count(F.lit(1)), 4).alias("avg_nll"),
        )
        .orderBy("source")
    )


@query(
    "q_bigram_perplexity_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
      FROM documents
    ),
    bg AS (
      SELECT doc_id, tk[u.i] AS w1, tk[u.i + 1] AS w2
      FROM toks CROSS JOIN unnest(generate_series(1, len(tk) - 1)) AS u(i)
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    vocab AS (
      SELECT COUNT(DISTINCT t.tok) AS v
      FROM (SELECT unnest(tk) AS tok FROM toks) t
    ),
    scored AS (
      SELECT b.doc_id,
             CAST(-ln((CAST(c12.c12 AS DOUBLE) + 1.0)
                      / (CAST(c1.c1 AS DOUBLE) + vocab.v))
                  AS DECIMAL(28,12)) AS nll
      FROM bg b
      JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      JOIN c1 ON b.w1 = c1.w1, vocab
      WHERE b.doc_id < 300
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 4) AS avg_nll,
           SUM(nll) < CAST(3.39 AS DECIMAL(28,12)) * COUNT(*) AS kept
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Bigram-LM perplexity filtering (the CCNet/KenLM-style quality "
    "gate one order up from q_unigram_logprob): an add-one-smoothed "
    "bigram model P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) trains on the FULL "
    "corpus (two grouped counts + a distinct-vocab scalar), then each "
    "document is scored by its average bigram negative log-likelihood "
    "and kept iff it clears the threshold — high-perplexity documents "
    "(unnatural token sequences: boilerplate, garbled OCR, spam) are "
    "what the filter drops from a training corpus. Determinism "
    "discipline: per-bigram NLL terms cast to DECIMAL before the "
    "order-independent exact SUM; the keep decision compares decimal "
    "sum against threshold x count — pure decimal arithmetic, no "
    "float-order jitter in the VERDICT bit. Scale shape: the model side "
    "is two map-side-combined counts (vocab-bounded, broadcastable "
    "top-V + OOV at 100 TB); the scoring side joins the corpus bigrams "
    "against them once — no per-doc state, no collect.",
)
def q_bigram_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("tk")
    )
    # sequence(0, size-2) would run DESCENDING for 1-token docs (Spark
    # sequence supports negative steps) — guard to docs with >= 2 tokens,
    # matching generate_series's empty result in the oracle
    bg = (
        toks.where(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(tk) - 2), i -> "
                    "struct(element_at(tk, i + 1) AS w1, element_at(tk, i + 2) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
        # vacuously-true filter (split() elements are never NULL), stated
        # EXPLICITLY so the c12 subtree canonicalizes identically under
        # both consumers below: the scored join pushes isnotnull(w1) AND
        # isnotnull(w2) into the c12-broadcast branch while the c1 rollup
        # pushes only isnotnull(w1) — without this, the two c12 subtrees
        # differ by one pushed filter and AQE cannot reuse the corpus-
        # bigram shuffle between them (it ran twice; optimization r14)
        .where(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # c(w1) = Σ_w2 c(w1, w2) EXACTLY (both count the same bg rows), so
    # the unigram model derives from the bigram model with a second-level
    # aggregate over the vocab²-bounded c12 relation instead of a second
    # full corpus explode+shuffle — the model side now reads and shuffles
    # the corpus bigrams ONCE, and AQE's exchange reuse shares the c12
    # shuffle between this rollup and the c12 broadcast (optimization
    # r14, guide §1.2/§2.4; VERDICT r13 next-#2).
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = toks.select(F.explode("tk").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    nll = (
        -F.log(
            (F.col("c12").cast("double") + F.lit(1.0))
            / (F.col("c1").cast("double") + F.col("v"))
        )
    ).cast("decimal(28,12)")
    scored = (
        bg.where(F.col("doc_id") < 300)
        .join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", nll.alias("nll"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("nll").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_nll"),
            (
                F.sum("nll")
                < F.expr("CAST(3.39 AS DECIMAL(28,12))") * F.count(F.lit(1))
            ).alias("kept"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_boilerplate_fraction",
    oracle="""
    WITH sents AS (
      SELECT doc_id, source,
             list_distinct(list_filter(
                 string_split_regex(lower(trim(text)), '\\.\\s+'),
                 s -> length(s) >= 10)) AS ss
      FROM documents
    ), flat AS (
      SELECT doc_id, source, unnest(ss) AS s FROM sents
    ), df AS (
      SELECT s, COUNT(DISTINCT doc_id) AS n_docs FROM flat GROUP BY s
    ), per_doc AS (
      SELECT f.doc_id, f.source,
             COUNT(*) AS n_sents,
             CAST(COUNT(CASE WHEN df.n_docs >= 2 THEN 1 END) AS BIGINT) AS n_boiler
      FROM flat f JOIN df ON f.s = df.s
      GROUP BY f.doc_id, f.source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_sents) AS BIGINT) AS total_sents,
           CAST(SUM(n_boiler) AS BIGINT) AS total_boiler,
           ROUND(SUM(n_boiler)::DOUBLE / SUM(n_sents), 4) AS boiler_frac
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
    doc="Sub-document (sentence-level) boilerplate detection — the "
    "boilerplate-stripping pipeline op: sentences shared by ≥2 documents "
    "are boilerplate; per-source fraction reported. Shape: explode "
    "distinct sentences, ONE document-frequency aggregate, join back on "
    "the sentence key, per-doc + per-source rollups — all "
    "map-side-combinable aggregates; the df join keys on the sentence "
    "so it shuffles once and never goes all-pairs.",
)
def q_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    sents = d.select(
        "doc_id",
        "source",
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\.\s+"),
                lambda s: F.length(s) >= 10,
            )
        ).alias("ss"),
    )
    flat = sents.select("doc_id", "source", F.explode("ss").alias("s"))
    df_counts = flat.groupBy("s").agg(F.countDistinct("doc_id").alias("n_docs"))
    per_doc = (
        flat.join(df_counts, "s")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_sents"),
            F.count(F.when(F.col("n_docs") >= 2, 1)).alias("n_boiler"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sents").alias("total_sents"),
            F.sum("n_boiler").alias("total_boiler"),
            F.round(
                F.sum("n_boiler").cast("double") / F.sum("n_sents"), 4
            ).alias("boiler_frac"),
        )
        .orderBy("source")
    )


@query(
    "q_quality_classifier",
    oracle=f"""
    SELECT doc_id,
           len({_ORACLE_TOKENS}) AS n_tokens,
           ROUND(logit, 6) AS logit,
           CASE WHEN logit > 0 THEN 'keep' ELSE 'drop' END AS label
    FROM (
        SELECT doc_id, text,
               list_sum(list_transform({_ORACLE_TOKENS}, tok ->
                   (CAST('0x' || substring(md5(lower(tok)), 1, 4) AS BIGINT) % 1001)::DOUBLE
                   / 1000.0 - 0.5))
               / len({_ORACLE_TOKENS}) AS logit
        FROM documents
    )
    ORDER BY doc_id
    """,
    doc="fastText-style hashed linear quality classifier "
    "(operators/text_analysis.hashed_linear_logit): md5-bucketed token "
    "features, mean bucket weight as the document logit, keep/drop at "
    "logit>0 (≡ sigmoid ≥ 0.5 without a libm exp call). Pure per-row "
    "expression work — map-only at any scale; the weight table is a "
    "closed-form function of the hash, standing in for trained "
    "parameters shipped as a broadcast map.",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.operators.dedup import tokens

    d = t(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("_toks")
    )
    scored = d.select(
        "doc_id",
        F.size("_toks").alias("n_tokens"),
        ta.hashed_linear_logit(F.col("_toks")).alias("_logit"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round("_logit", 6).alias("logit"),
        F.when(F.col("_logit") > 0, "keep").otherwise("drop").alias("label"),
    ).orderBy("doc_id")


@query(
    "q_ordered_set_aggs",
    oracle="""
    SELECT source,
           string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs,
           ROUND(median(n_chars), 4) AS median_chars,
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY n_chars), 4)
               AS p90_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="PG ordered-set / within-group aggregate parity (§2.9): "
    "string_agg(DISTINCT .. ORDER BY), median, percentile_cont. Spark "
    "spellings: array_join(array_sort(collect_set)) — sorted so the "
    "concatenation is deterministic regardless of partition arrival "
    "order — and the interpolating percentile() (≡ percentile_cont).",
)
def q_ordered_set_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs"),
            F.round(F.median("n_chars"), 4).alias("median_chars"),
            F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90_chars"),
        )
        .orderBy("source")
    )


@query(
    "q_zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(
                 lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tk
      FROM documents
    ), freq AS (
      SELECT tk, COUNT(*) AS f FROM tok WHERE tk <> '' GROUP BY tk
    ), ranked AS (
      SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, tk ASC) AS r FROM freq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
           ROUND(REGR_SLOPE(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
               AS zipf_slope,
           ROUND(CORR(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
               AS log_log_corr
    FROM ranked WHERE r <= 200
    """,
    doc="Corpus Zipf-law fit: token frequencies ranked (deterministic "
    "tiebreak on the token), then the log-log slope and correlation via "
    "the regression aggregates — a Zipfian corpus shows slope ≈ -1. "
    "Composes the vocab-mining shuffle (one hash aggregate on token) "
    "with a top-200 rank window over the tiny distinct-token relation; "
    "the heavy relation never sorts globally.",
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from timefusion_spark.operators.dedup import normalize_text

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tk")
    ).where(F.col("tk") != "")
    freq = toks.groupBy("tk").agg(F.count(F.lit(1)).alias("f"))
    # top-200 via orderBy+limit (TakeOrderedAndProject — per-partition
    # top-k then merge, never a global sort of the vocab); the rank
    # window then runs over just those 200 rows.
    top = freq.orderBy(F.col("f").desc(), F.col("tk").asc()).limit(200)
    ranked = top.withColumn(
        "r", F.row_number().over(W.orderBy(F.col("f").desc(), F.col("tk").asc()))
    )
    lf, lr = F.log(F.col("f").cast("double")), F.log(F.col("r").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_ranks"),
        F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        F.round(F.corr(lf, lr), 4).alias("log_log_corr"),
    )


@query(
    "q_bm25_rank",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             len(list_filter(string_split(coalesce(text, ''), ' '),
                             x -> x <> '')) AS dl,
             len(list_filter(string_split(coalesce(text, ''), ' '),
                             x -> x = 'filter')) AS tf_0,
             len(list_filter(string_split(coalesce(text, ''), ' '),
                             x -> x = 'window')) AS tf_1,
             len(list_filter(string_split(coalesce(text, ''), ' '),
                             x -> x = 'merge'))  AS tf_2
      FROM documents
    ), s AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl,
             SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
             SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
             SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
      FROM base
    ), scored AS (
      SELECT b.doc_id, b.dl,
        ln(1.0 + (s.n_docs - s.df_0 + 0.5) / (s.df_0 + 0.5))
          * b.tf_0 * 2.2 / (b.tf_0 + 1.2 * (0.25 + 0.75 * b.dl / s.avgdl)) +
        ln(1.0 + (s.n_docs - s.df_1 + 0.5) / (s.df_1 + 0.5))
          * b.tf_1 * 2.2 / (b.tf_1 + 1.2 * (0.25 + 0.75 * b.dl / s.avgdl)) +
        ln(1.0 + (s.n_docs - s.df_2 + 0.5) / (s.df_2 + 0.5))
          * b.tf_2 * 2.2 / (b.tf_2 + 1.2 * (0.25 + 0.75 * b.dl / s.avgdl))
          AS score
      FROM base b, s
    )
    SELECT doc_id, CAST(dl AS BIGINT) AS dl,
           FLOOR(score * 1000000 + 0.5) / 1000000 AS score
    FROM scored
    WHERE score > 0
    ORDER BY score DESC, doc_id
    LIMIT 25
    """,
    doc="BM25 ranked retrieval (Okapi formulation, Lucene's non-negative "
    "idf) for the query {filter, window, merge} over the documents "
    "corpus — the RANKED counterpart of the boolean text_match surface "
    "(tantivy_index/udf.rs:1-60 is match-only). Spark-first: per-term "
    "tf is a map-side higher-order filter over the token array (no "
    "explode, no tf shuffle); N/avgdl/per-term df fold into ONE global "
    "aggregate row broadcast back (the scalar-subquery BNLJ shape); "
    "top-25 is TakeOrderedAndProject. Two corpus scans total — the "
    "shape that holds at 100 TB. Scores are half-up rounded at 1e-6 "
    "(engine ROUND()s diverge at half-step ties).",
)
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.operators.ranking import bm25_scores

    d = t(spark, sf_dir, "documents")
    scored = bm25_scores(d, "doc_id", "text", ["filter", "window", "merge"])
    return (
        scored.where(F.col("score") > 0)
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            (F.floor(F.col("score") * 1000000 + F.lit(0.5)) / 1000000).alias("score"),
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(25)
    )
