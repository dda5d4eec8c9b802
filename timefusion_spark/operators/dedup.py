"""Deduplication operator family: exact, MinHash+LSH, SimHash, n-gram
Jaccard. (North-star LLM-pipeline surface; the reference's own dedup is
last-write-wins on keys — storage/view.py — these are the content-dedup
analogs for training-data pipelines.)

Design for 100 TB:
- all hashing is per-row JVM expression arithmetic (portable polynomial
  hash, no Python, no UDF) — embarrassingly parallel, no shuffle;
- MinHash-LSH shuffles only on (band, band_key) buckets — candidate
  generation is O(candidates), never O(n²);
- the exact-jaccard verify joins only the candidate pairs back to their
  shingle sets (semi-join-sized shuffle);
- SimHash produces a per-row 32-bit signature; near-dup banding can
  bucket on signature prefixes the same way.

The polynomial hash is deliberately engine-portable (acc*31 + ascii, mod
1e9+7) so the DuckDB oracle can reproduce signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_PRIME = 1_000_000_007

# Deterministic MinHash family h_i(x) = (a_i * x + b_i) mod P.
# 16 hashes = 4 bands × 4 rows → catches jaccard ≳ 0.5 with high recall.
MINHASH_SEEDS: list[tuple[int, int]] = [
    (1_107_677_413, 613_651_349),
    (924_961_777, 443_573_543),
    (687_995_087, 284_499_829),
    (421_856_029, 991_038_943),
    (313_514_441, 177_562_517),
    (198_491_317, 865_043_093),
    (754_298_963, 530_384_761),
    (587_322_721, 92_274_403),
    (860_837_971, 721_935_139),
    (239_867_209, 356_999_989),
    (479_001_599, 148_587_617),
    (663_608_941, 938_475_071),
    (104_395_301, 472_882_027),
    (566_492_537, 259_336_153),
    (378_551_453, 808_182_263),
    (941_083_981, 64_936_379),
]
LSH_BANDS = 4
LSH_ROWS = 4


def normalize_text(c: Column) -> Column:
    """Lowercase, trim, collapse whitespace — canonical form for exact dedup."""
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    return F.split(F.trim(c), r"\s+")


def poly_hash(s: Column) -> Column:
    """Portable 64-bit-safe polynomial string hash: fold chars with
    acc*31 + ascii(ch) mod 1e9+7. Stays in whole-stage codegen."""
    codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(HASH_PRIME),
    )


def word_shingles(c: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a text column (array<string>)."""
    t = tokens(c)
    n = F.size(t)
    shingled = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )
    return F.array_distinct(F.when(n >= k, shingled).otherwise(F.array(F.concat_ws(" ", t))))


def char_ngrams(c: Column, n: int = 5) -> Column:
    """Distinct character n-grams of normalized text (array<string>)."""
    s = normalize_text(c)
    ln = F.length(s)
    grams = F.transform(
        F.sequence(F.lit(1), ln - F.lit(n - 1)),
        lambda i: s.substr(i, F.lit(n)),
    )
    return F.array_distinct(F.when(ln >= n, grams).otherwise(F.array(s)))


def minhash_signature(shingles: Column) -> Column:
    """MinHash signature (array<long>, len 16) over a shingle array."""
    hashes = F.transform(shingles, poly_hash)

    def permute(a: int, b: int):
        # closure factory: PySpark inspects lambda arity, so default-arg
        # tricks (lambda h, a=a: ...) would read as multi-arg lambdas.
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(HASH_PRIME)

    mins = [F.array_min(F.transform(hashes, permute(a, b))) for a, b in MINHASH_SEEDS]
    return F.array(*mins)


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def simhash32(token_arr: Column) -> Column:
    """32-bit SimHash over a token array: bit j set iff the sum over tokens
    of (±1 by token-hash bit j) is positive. Pure array arithmetic."""
    hashes = F.array_distinct(F.transform(token_arr, poly_hash))

    def bit_vote(j: int):
        return lambda acc, h: acc + (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1)

    out = F.lit(0).cast("long")
    for j in range(32):
        bit_sum = F.aggregate(hashes, F.lit(0).cast("long"), bit_vote(j))
        out = out + F.when(bit_sum > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy on normalized text: one row per
    duplicate group with the canonical (min) id and the group size.
    Scale: single hash aggregate on md5 — map-side partial agg applies."""
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact-jaccard verify.

    Pipeline: shingle → 16-way minhash → 4 bands of 4 → shuffle on
    (band, key) → candidate pairs → exact jaccard filter. Returns
    (id_a, id_b, jaccard) with id_a < id_b.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_k).alias("_shingles"),
    ).withColumn("_sig", minhash_signature(F.col("_shingles")))

    bands = base.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.concat_ws(
                            "-",
                            F.transform(
                                F.slice("_sig", j * LSH_ROWS + 1, LSH_ROWS),
                                lambda x: x.cast("string"),
                            ),
                        ).alias("key"),
                    )
                    for j in range(LSH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("_id", "b.band", "b.key")

    left = bands.alias("l")
    right = bands.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )

    sh = base.select("_id", "_shingles")
    verified = (
        candidates.join(sh.alias("sa"), F.col("id_a") == F.col("sa._id"))
        .join(sh.alias("sb"), F.col("id_b") == F.col("sb._id"))
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("sa._shingles"), F.col("sb._shingles")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    threshold: float = 0.5,
    ngram_n: int = 5,
) -> DataFrame:
    """Exact char-n-gram Jaccard near-dup pairs, optionally blocked on a
    column (e.g. source) so the pair space is per-block, not global —
    the blocked join is the scale control."""
    sets = df.select(
        F.col(id_col).alias("_id"),
        *( [F.col(block_col).alias("_blk")] if block_col else [] ),
        char_ngrams(F.col(text_col), ngram_n).alias("_grams"),
    )
    a = sets.alias("a")
    b = sets.alias("b")
    cond = F.col("a._id") < F.col("b._id")
    if block_col:
        cond = cond & (F.col("a._blk") == F.col("b._blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            jaccard(F.col("a._grams"), F.col("b._grams")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
