"""Training-pipeline operators: sequence packing and deterministic
sampling (beyond-the-reference, north-star brief).

Both are pure window/expression compositions — no UDFs, one shuffle on
the group key — so they scale exactly like a groupBy at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timefusion_spark.operators.dedup import poly_hash


def pack_concat_chunks(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents in each group are
    concatenated in ``order_col`` order and cut into fixed ``budget``-token
    chunks — the standard LLM-pretraining packing (no padding waste, docs
    may straddle a chunk boundary).

    Adds three columns:
      - ``chunk_id``   — chunk containing the document's FIRST token,
      - ``chunk_last`` — chunk containing its last token,
      - ``chunks_spanned`` — ``chunk_last - chunk_id + 1`` (>1 = straddler).

    One window per group (single shuffle + sort); assignment is a pure
    prefix-sum expression, so the operator is as scalable as the sort.
    At cluster scale the group key is the unit of parallelism — use a
    sharded group (e.g. ``(source, shard)``) if single groups exceed an
    executor's sort budget.

    The running sum uses an explicit ROWS frame: the default RANGE frame
    includes every ``order_col`` PEER in each row's sum, so two docs
    tied on the order key would both see the post-both total and get
    wrong chunk spans (review r11). Ties order arbitrarily within the
    frame — any tie order is a valid packing.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    size = F.col(size_col)
    first_chunk = F.floor((cum - size) / F.lit(budget))
    last_chunk = F.floor((cum - F.lit(1)) / F.lit(budget))
    # A zero-size document ending exactly on a chunk boundary would get
    # chunk_id = chunk_last + 1 — a phantom chunk no token ever reaches
    # (review r13). Zero-size docs anchor both ids at the chunk of the
    # preceding token (0 when first in group) with chunks_spanned = 0.
    anchor = F.greatest(last_chunk, F.lit(0))
    return (
        df.withColumn("chunk_id", F.when(size == 0, anchor).otherwise(first_chunk))
        .withColumn("chunk_last", F.when(size == 0, anchor).otherwise(last_chunk))
        .withColumn(
            "chunks_spanned",
            F.when(size == 0, F.lit(0)).otherwise(
                F.col("chunk_last") - F.col("chunk_id") + F.lit(1)
            ),
        )
    )


def sample_hash(
    key: Column, modulus: int = 10, keep_below: int = 1, salt: str | None = None
) -> Column:
    """Deterministic hash-sampling predicate: keep rows where
    ``poly_hash(key) % modulus < keep_below`` (a ``keep_below/modulus``
    rate). A pure per-row filter — no shuffle, no RNG state, reproducible
    across engines (poly_hash has a bit-exact DuckDB mirror) and across
    reruns, which is what makes ablation/holdout splits auditable.

    ``salt`` decorrelates independent samples: without it two same-rate
    samples over the same key are the IDENTICAL row set and different-
    modulus samples are correlated (h%20==0 implies h%10==0) — pass a
    distinct salt per draw (the DuckDB mirror prepends the same literal)
    (review r13)."""
    k = F.concat(F.lit(salt), key) if salt else key
    return F.pmod(poly_hash(k), F.lit(modulus)) < F.lit(keep_below)


def stratified_rank(
    df: DataFrame, group_col: str, key: Column, tiebreak: Column | None = None
) -> DataFrame:
    """Add ``_rk``: the row's deterministic sampling rank within its
    ``group_col`` stratum (1 = first sampled). ``_rk <= k`` is an exact-k
    per-stratum sample with hash-order determinism — the distributed
    analog of seeded reservoir sampling, as one window. ``tiebreak``
    (default: the key itself) makes equal-hash rows totally ordered —
    but ONLY if the key (or tiebreak) is unique per stratum: rows
    SHARING a key tie on (hash, key) and row_number breaks the tie
    partition-order-dependently, so duplicate keys need an explicit
    unique ``tiebreak`` for the determinism claim to hold (review
    r13)."""
    h = poly_hash(key)
    w = Window.partitionBy(group_col).orderBy(
        h, key if tiebreak is None else tiebreak
    )
    return df.withColumn("_rk", F.row_number().over(w))


def temperature_mix_rates(
    df: DataFrame, source_col: str, alpha: float, target_rows: int
) -> DataFrame:
    """Temperature-scaled corpus-mixing rates: one row per source with
    `n_src` and `rate_ppb`, the per-source keep probability (parts per
    billion) such that sampled sources mix in proportion to n^alpha
    (alpha < 1 upweights small sources — the standard multilingual /
    multi-corpus mixing rule) with ~`target_rows` total rows kept.

    rate_s = min(1, target_rows · n_s^α / Σ n^α / n_s), published as an
    integer parts-per-BILLION so the hash filter `poly_hash(key) % 1e9 <
    rate_ppb` is an exact integer comparison, bit-reproducible across
    engines and reruns. ppb, not ppm, and floored at 1: at ppm a dominant
    source whose rate fell below 0.5e-6 rounded to 0 and was dropped from
    the mix ENTIRELY, and 1-ppm rates carried up to ~50% relative error
    (review r13).

    Scale: one map-side-combinable count per source plus a single-row
    normalization window over |sources| rows — the rates frame is tiny by
    construction and broadcasts into the sampling join."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_src"))
    w_raw = F.pow(F.col("n_src").cast("double"), F.lit(float(alpha)))
    w = counts.withColumn("_w", w_raw).withColumn(
        "_w_tot", F.sum("_w").over(Window.partitionBy())
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_rows)) * F.col("_w") / F.col("_w_tot") / F.col("n_src"),
    )
    return w.withColumn(
        "rate_ppb",
        F.greatest(F.lit(1), F.round(rate * F.lit(1_000_000_000))).cast("long"),
    ).drop("_w", "_w_tot")


def mix_sample(
    df: DataFrame, rates: DataFrame, source_col: str, key: Column
) -> DataFrame:
    """Apply temperature-mix rates: broadcast-join the tiny rates frame and
    keep rows whose portable hash lands under the source's rate_ppb. A
    map-only filter after a broadcast join — zero corpus shuffle.

    Null-safe on both legs (review r13): the join matches a NULL source
    to its NULL-source rates row (a plain equi-join never matches NULL =
    NULL, silently dropping every such row while the rates frame claims
    they are sampled), and a NULL key hashes as the empty string instead
    of making the filter predicate NULL — silently dropping training
    rows is the one failure a pipeline can't see."""
    joined = df.join(
        F.broadcast(rates), df[source_col].eqNullSafe(rates[source_col])
    ).drop(rates[source_col])
    return joined.where(
        F.pmod(poly_hash(F.coalesce(key, F.lit(""))), F.lit(1_000_000_000))
        < F.col("rate_ppb")
    )


def chunk_with_overlap(
    df: DataFrame, toks_col: Column, size: int, stride: int
) -> DataFrame:
    """Sliding-window document chunking: cut a token array into
    ``size``-token windows advancing by ``stride`` (< size ⇒ overlapping
    context windows, the standard long-document → training-sample split).
    The last window is short rather than padded; a document with ≤ size
    tokens yields exactly one chunk.

    Pure per-row expression work (sequence → transform → posexplode): no
    shuffle, no UDF — output rows stay in the input partitioning, so at
    100 TB this is a map-only stage. Pass ``toks_col`` as a staged
    ATTRIBUTE column (see ngrams note in text_analysis).

    Adds ``chunk_index`` (long, 0-based) and ``chunk_tokens`` (the
    window's token array). A NULL token array keeps its row (NULL
    chunk_index/chunk_tokens via posexplode_outer) — silently dropping
    rows from a training set is the one failure a pipeline can't see
    (review r11); the chunk count is clamped so a stride larger than
    the remaining tokens never emits a trailing EMPTY chunk."""
    n = F.size(toks_col)
    n_chunks = F.when(n <= size, F.lit(1).cast("long")).otherwise(
        F.least(
            F.ceil((n - F.lit(size)) / F.lit(float(stride))) + 1,
            F.ceil(n / F.lit(float(stride))),
        )
    )
    ks = F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    chunks = F.transform(
        ks, lambda k: F.slice(toks_col, (k * stride + 1).cast("int"), size)
    )
    return df.select(
        "*", F.posexplode_outer(chunks).alias("chunk_index", "chunk_tokens")
    ).withColumn("chunk_index", F.col("chunk_index").cast("long"))
