"""Training-pipeline scale operators (beyond-the-reference, north-star
brief): interval join, sequence packing, deterministic stratified
sampling, and dedup clustering.

Oracle strategy: interval join and packing are plain SQL (theta join /
window cumsum are fine in DuckDB at sf0.01); sampling reuses the
bit-exact DuckDB mirror of poly_hash; clustering closes the exact
all-pairs near-dup graph with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timefusion_spark.operators import dedup as dd
from timefusion_spark.operators import packing as pk
from timefusion_spark.queries._tables import t
from timefusion_spark.queries.dedup_llm import _H, _SHINGLES3
from timefusion_spark.registry import query


@query(
    "q_interval_join",
    oracle="""
    WITH incidents AS (
      SELECT event_id AS incident_id,
             ts AS start_ts,
             ts + INTERVAL 30 MINUTE AS end_ts
      FROM events WHERE event_id % 499 = 0
    )
    SELECT i.incident_id,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           ROUND(SUM(e.value), 2) AS total_value
    FROM incidents i
    JOIN events e ON e.ts >= i.start_ts AND e.ts <= i.end_ts
    GROUP BY i.incident_id
    ORDER BY i.incident_id
    """,
    doc="Bucketed interval join (operators/interval_join.py): events "
    "matched to 30-min incident windows via an equi-join on time buckets "
    "+ exact refine — never the O(|P|*|I|) nested-loop theta-join the "
    "naive BETWEEN formulation plans. Oracle uses the theta-join (exact "
    "at sf0.01).",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.operators.interval_join import interval_join

    ev = t(spark, sf_dir, "events")
    incidents = ev.where(F.col("event_id") % 499 == 0).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    points = ev.select("ts", "user_id", "value")
    j = interval_join(
        points, incidents, point_ts="ts", bucket_width_s=1800, how="inner"
    )
    return (
        j.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("incident_id")
    )


@query(
    "q_sequence_packing",
    oracle="""
    WITH sized AS (
      SELECT source, doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT source, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM sized
    ), asg AS (
      SELECT source, n_tokens,
             CAST(FLOOR((cum_tokens - n_tokens) / 512.0) AS BIGINT) AS chunk_id,
             CAST(FLOOR((cum_tokens - 1) / 512.0) AS BIGINT) AS chunk_last
      FROM cum
    )
    SELECT source, chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
           CAST(SUM(CASE WHEN chunk_last > chunk_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_straddlers
    FROM asg
    GROUP BY source, chunk_id
    ORDER BY source, chunk_id
    """,
    doc="Concat-and-chunk sequence packing (operators/packing.py): "
    "documents per source concatenated in doc_id order and cut into "
    "512-token training chunks; per chunk: docs starting there, token "
    "total, boundary straddlers. Pure prefix-sum window — one shuffle.",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    sized = d.select(
        "source", "doc_id", F.size(dd.tokens(F.col("text"))).alias("n_tokens")
    )
    packed = pk.pack_concat_chunks(
        sized, group_col="source", order_col="doc_id", size_col="n_tokens", budget=512
    )
    return (
        packed.groupBy("source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("chunk_tokens"),
            F.sum(
                F.when(F.col("chunk_last") > F.col("chunk_id"), 1).otherwise(0)
            ).alias("n_straddlers"),
        )
        .orderBy("source", "chunk_id")
    )


@query(
    "q_stratified_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars, CAST(doc_id AS VARCHAR) AS k FROM documents
    ), hashed AS (
      SELECT source, doc_id, n_chars, {_H.format(s="k")} AS h FROM keyed
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
      FROM hashed
    )
    SELECT source,
           CAST(SUM(CASE WHEN h % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hash_sampled,
           CAST(SUM(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_topk,
           CAST(SUM(CASE WHEN rk <= 20 THEN n_chars END) AS BIGINT) AS chars_topk
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
    doc="Deterministic sampling (operators/packing.py): ~10% hash-rate "
    "sample (pure filter, no shuffle, no RNG state — reproducible across "
    "engines and reruns) and an exact-20-per-source stratified sample "
    "(hash-order row_number — the distributed seeded-reservoir analog). "
    "Oracle reproduces poly_hash bit-for-bit in DuckDB.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    key = F.col("doc_id").cast("string")
    keyed = d.select("source", "doc_id", "n_chars")
    ranked = pk.stratified_rank(keyed, "source", key, tiebreak=F.col("doc_id"))
    sampled = pk.sample_hash(key, modulus=10, keep_below=1)
    return (
        ranked.groupBy("source")
        .agg(
            F.sum(F.when(sampled, 1).otherwise(0)).alias("n_hash_sampled"),
            F.sum(F.when(F.col("_rk") <= 20, 1).otherwise(0)).alias("n_topk"),
            F.sum(F.when(F.col("_rk") <= 20, F.col("n_chars"))).alias("chars_topk"),
        )
        .orderBy("source")
    )


@query(
    "q_corpus_mixing",
    oracle=f"""
    WITH c AS (
      SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1
    ), w AS (
      SELECT source, n_src,
             pow(n_src, 0.5) AS w_raw,
             SUM(pow(n_src, 0.5)) OVER () AS w_tot
      FROM c
    ), r AS (
      SELECT source, n_src,
             CAST(GREATEST(1, ROUND(LEAST(1.0, 2000 * w_raw / w_tot / n_src)
                  * 1000000000)) AS BIGINT) AS rate_ppb
      FROM w
    ), keyed AS (
      SELECT source, COALESCE(CAST(doc_id AS VARCHAR), '') AS k FROM documents
    ), s AS (
      -- null-safe join + NULL-key coalesce, mirroring mix_sample's
      -- eqNullSafe + empty-string hash (review r13): a NULL source's
      -- rows are sampled, not silently dropped
      SELECT keyed.source, COUNT(*) AS n_sampled
      FROM keyed JOIN r ON keyed.source IS NOT DISTINCT FROM r.source
      WHERE {_H.format(s="k")} % 1000000000 < r.rate_ppb
      GROUP BY 1
    )
    SELECT r.source, r.n_src, r.rate_ppb,
           COALESCE(s.n_sampled, 0) AS n_sampled
    FROM r LEFT JOIN s ON r.source IS NOT DISTINCT FROM s.source
    ORDER BY r.source
    """,
    doc="Temperature-scaled corpus mixing (operators/packing.py::"
    "temperature_mix_rates): per-source keep rates ∝ n^0.5 targeting "
    "~2000 rows (the standard multilingual upweight-small-sources rule), "
    "applied as a broadcast join + portable-hash ppb filter — zero corpus "
    "shuffle, deterministic across engines/reruns. Oracle reproduces the "
    "rate arithmetic and poly_hash bit-for-bit.",
)
def q_corpus_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    rates = pk.temperature_mix_rates(d, "source", alpha=0.5, target_rows=2000)
    sampled = pk.mix_sample(
        d, rates, "source", F.col("doc_id").cast("string")
    )
    picked = sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n_sampled"))
    return (
        # eqNullSafe like the oracle's IS NOT DISTINCT FROM: a plain
        # equi-join would report n_sampled=0 for a NULL-source group even
        # though mix_sample kept its rows (review r13 round-diff);
        # explicit aliases because rates and picked share lineage
        rates.alias("r")
        .join(
            picked.alias("p"),
            F.col("r.source").eqNullSafe(F.col("p.source")),
            "left",
        )
        .select(
            F.col("r.source").alias("source"),
            "n_src",
            "rate_ppb",
            F.coalesce(F.col("p.n_sampled"), F.lit(0)).alias("n_sampled"),
        )
        .orderBy("source")
    )


# Shared oracle scaffold: exact J≥0.5 near-dup edge set via the
# sub-quadratic inverted-index equi-join, closed into components with a
# recursive CTE (used by q_dedup_clusters, q_dedup_canonical and
# q_leakage_safe_split).
_COMPONENTS_CTE = """
    WITH RECURSIVE tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ), sh AS (
      SELECT doc_id, {shingles} AS shingles FROM tok
    ), inv AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), siz AS (
      SELECT doc_id, len(shingles) AS n FROM sh
    ), inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT ia, ib
      FROM inter
      JOIN siz sa ON sa.doc_id = ia
      JOIN siz sb ON sb.doc_id = ib
      WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.5
    ), edges AS (
      SELECT ia AS a, ib AS b FROM pairs
      UNION ALL
      SELECT ib, ia FROM pairs
    ), nodes AS (
      SELECT DISTINCT a AS n FROM edges
    ), reach(n, lab) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT e.a, r.lab FROM edges e JOIN reach r ON r.n = e.b
    ), comp AS (
      SELECT n, MIN(lab) AS component FROM reach GROUP BY n
    )
"""


@query(
    "q_dedup_canonical",
    oracle=_COMPONENTS_CTE.format(shingles=_SHINGLES3)
    + """
    , m AS (
      SELECT comp.component, comp.n, d.n_chars
      FROM comp JOIN documents d ON d.doc_id = comp.n
    ), rk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY component
                                   ORDER BY n_chars DESC, n ASC) AS rnk
      FROM m
    )
    SELECT component, COUNT(*) AS n_members,
           MAX(CASE WHEN rnk = 1 THEN n END) AS survivor_id,
           MAX(CASE WHEN rnk = 1 THEN n_chars END) AS survivor_chars
    FROM rk
    GROUP BY component
    ORDER BY component
    """,
    doc="Canonical-survivor selection per near-dup cluster — the step a "
    "real dedup pipeline runs after clustering: within each connected "
    "component keep the best document (longest text, doc_id tiebreak). "
    "Spark side is components + one broadcast-joined metadata lookup + "
    "one per-component window; oracle closes the same exact graph and "
    "ranks with the same deterministic order.",
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from timefusion_spark.operators.graph import connected_components

    d = t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(d, threshold=0.5).select("id_a", "id_b")
    comps = connected_components(pairs, src="id_a", dst="id_b")
    members = comps.join(
        d.select(F.col("doc_id").alias("n"), "n_chars"), "n"
    )
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("n").asc()
    )
    ranked = members.withColumn("_rnk", F.row_number().over(w))
    return (
        ranked.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.when(F.col("_rnk") == 1, F.col("n"))).alias("survivor_id"),
            F.max(F.when(F.col("_rnk") == 1, F.col("n_chars"))).alias(
                "survivor_chars"
            ),
        )
        .orderBy("component")
    )


@query(
    "q_token_budget_sample",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ), ranked AS (
      SELECT *,
             SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY n_tokens DESC, doc_id ASC
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM toks
    ), picked AS (
      SELECT * FROM ranked WHERE cum_tokens <= 800
    ), tot AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM toks GROUP BY source
    )
    SELECT tot.source,
           CAST(COALESCE(COUNT(picked.doc_id), 0) AS BIGINT) AS n_selected,
           CAST(COALESCE(SUM(picked.n_tokens), 0) AS BIGINT) AS tokens_selected,
           tot.tot_tokens,
           ROUND(CAST(COALESCE(SUM(picked.n_tokens), 0) AS DOUBLE) / tot.tot_tokens, 4)
               AS budget_fill
    FROM tot LEFT JOIN picked ON picked.source = tot.source
    GROUP BY tot.source, tot.tot_tokens
    ORDER BY tot.source
    """,
    doc="Token-budget corpus sampling — the budgeted-fill step a training "
    "mixture runs per source/domain: rank each source's documents by a "
    "deterministic priority (tokens-per-doc descending here — the policy "
    "column is pluggable: quality score, recency, dedup-survivor rank) "
    "and greedily keep documents while the source's cumulative token "
    "count stays inside the budget. One window cumsum per source (pure "
    "integer arithmetic — engine-exact), one filter; no collect, no "
    "iteration. At 100 TB the window partitions by source and the "
    "cumsum is a single shuffle on the already-needed mixture key.",
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(dd.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    picked = ranked.where(F.col("cum_tokens") <= 800)
    tot = toks.groupBy("source").agg(F.sum("n_tokens").cast("long").alias("tot_tokens"))
    sel = picked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_tokens").cast("long").alias("tokens_selected"),
    )
    return (
        tot.join(sel, "source", "left")
        .select(
            "source",
            F.coalesce("n_selected", F.lit(0)).cast("long").alias("n_selected"),
            F.coalesce("tokens_selected", F.lit(0)).cast("long").alias("tokens_selected"),
            "tot_tokens",
            F.round(
                F.coalesce("tokens_selected", F.lit(0)).cast("double")
                / F.col("tot_tokens"),
                4,
            ).alias("budget_fill"),
        )
        .orderBy("source")
    )


@query(
    "q_leakage_safe_split",
    oracle=_COMPONENTS_CTE.format(shingles=_SHINGLES3)
    + """
    , allkeys AS (
      SELECT d.doc_id, COALESCE(comp.component, d.doc_id) AS key
      FROM documents d LEFT JOIN comp ON comp.n = d.doc_id
    ), sp AS (
      SELECT doc_id, key,
             CASE WHEN (key * 2654435761) % 10 < 8 THEN 'train'
                  WHEN (key * 2654435761) % 10 = 8 THEN 'val'
                  ELSE 'test' END AS split,
             CASE WHEN (doc_id * 2654435761) % 10 < 8 THEN 'train'
                  WHEN (doc_id * 2654435761) % 10 = 8 THEN 'val'
                  ELSE 'test' END AS naive_split
      FROM allkeys
    ), leaky AS (
      SELECT
        CAST(COALESCE(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS naive_leaky,
        CAST(COALESCE(SUM(CASE WHEN ss > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS safe_leaky
      FROM (
        SELECT comp.component,
               COUNT(DISTINCT sp.naive_split) AS ns,
               COUNT(DISTINCT sp.split) AS ss
        FROM comp JOIN sp ON sp.doc_id = comp.n
        GROUP BY comp.component
      )
    )
    SELECT sp.split, COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT sp.key) AS BIGINT) AS n_groups,
           leaky.naive_leaky, leaky.safe_leaky
    FROM sp, leaky
    GROUP BY sp.split, leaky.naive_leaky, leaky.safe_leaky
    ORDER BY sp.split
    """,
    doc="Leakage-safe train/val/test splitting — the step every serious "
    "training-data pipeline must run AFTER near-dup detection: splitting "
    "by document hashes members of the same near-dup cluster into "
    "different splits (train/test contamination through paraphrases), "
    "so the split key must be the CLUSTER, not the document. Every doc "
    "keys on its connected-component root (its own id when unclustered) "
    "and a deterministic multiplicative hash (Knuth 2^32/phi, exact "
    "int64 arithmetic in both engines) buckets keys 80/10/10. Output "
    "certifies the mechanism: the doc-keyed NAIVE split leaks real "
    "clusters across splits at every test scale while the cluster-keyed "
    "split leaks exactly ZERO. Scale shape: LSH pairs (banded, no "
    "all-pairs), min-label components, one hash per row — the split "
    "assignment itself is map-only.",
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.operators.graph import connected_components

    d = t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(d, threshold=0.5).select("id_a", "id_b")
    comps = connected_components(pairs, src="id_a", dst="id_b")
    allkeys = (
        d.select("doc_id")
        .join(comps.withColumnRenamed("n", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("component", "doc_id").alias("key"))
    )

    def _split(c):
        b = (c * F.lit(2654435761)) % 10
        return (
            F.when(b < 8, F.lit("train")).when(b == 8, F.lit("val")).otherwise(F.lit("test"))
        )

    sp = allkeys.select(
        "doc_id",
        "key",
        _split(F.col("key")).alias("split"),
        _split(F.col("doc_id")).alias("naive_split"),
    )
    per_comp = (
        comps.join(sp, comps["n"] == sp["doc_id"])
        .groupBy("component")
        .agg(
            F.countDistinct("naive_split").alias("ns"),
            F.countDistinct("split").alias("ss"),
        )
    )
    leaky = per_comp.agg(
        F.coalesce(
            F.sum(F.when(F.col("ns") > 1, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("naive_leaky"),
        F.coalesce(
            F.sum(F.when(F.col("ss") > 1, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("safe_leaky"),
    )
    return (
        sp.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("key").alias("n_groups"),
        )
        .crossJoin(F.broadcast(leaky))
        .orderBy("split")
    )


@query(
    "q_dedup_clusters",
    oracle=_COMPONENTS_CTE.format(shingles=_SHINGLES3)
    + """
    , csize AS (
      SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
    )
    SELECT cluster_size, COUNT(*) AS n_clusters, MIN(component) AS min_root
    FROM csize
    GROUP BY cluster_size
    ORDER BY cluster_size
    """,
    doc="Near-dup clustering (operators/graph.py): MinHash-LSH pairs "
    "closed into connected components via min-label propagation "
    "(shuffled join per round, one-scalar convergence check, lineage "
    "truncated per round); output is the cluster-size histogram. Oracle "
    "builds the exact J≥0.5 edge set via an inverted-index equi-join "
    "(sub-quadratic — runs at sf0.1) and closes it with a recursive CTE.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.operators.graph import connected_components

    d = t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(d, threshold=0.5).select("id_a", "id_b")
    comps = connected_components(pairs, src="id_a", dst="id_b")
    sizes = comps.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.min("component").alias("min_root"),
        )
        .orderBy("cluster_size")
    )
