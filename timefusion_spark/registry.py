"""Query registry — the single source for the driver contract.

Every implemented operator from SURVEY.md §2 registers here with:
  - a Spark callable (spark, sf_dir) -> DataFrame
  - an equivalent ANSI-SQL oracle string for DuckDB (or None for
    non-SQL-expressible operators → driver runs a rows-only check).

``__spark_entry__.queries()`` / ``oracle_sql()`` just read this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # a silent overwrite would replace BOTH the implementation and its
        # oracle — the gate then certifies the surviving duplicate while
        # the shadowed query is never verified (review r13)
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco


# The driver's correctness gate verifies the FIRST 50 registry entries per
# round. Registration order (module import order) put simple relational and
# function shapes there, leaving the engine's hardest surface — storage/MOR,
# streaming, ANN, percentile sketches, and the six round-1 failures — outside
# the checked window (VERDICT r4 "driver-gate blind spot"). PRIORITY pins
# those high-risk queries into the first 50 slots; everything else (almost all
# of it already driver-certified in rounds 1-4) follows in registration order.
PRIORITY: tuple[str, ...] = (
    # storage / MOR / DML / maintenance (rotated out round 13 —
    # VERDICT r12 #2 backlog retirement, all gate-certified r5-r12 and
    # unchanged: q_storage_partition_scan [scan surface kept pinned by
    # q_mor_merge_on_read / q_snapshot_isolation / q_otel_dashboard],
    # q_otel_recent_topk [pure built-in top-K; the DESC sorted-write
    # plan shape stays pinned in tests/test_plan_shapes.py],
    # q_otel_hash_enrichment [UPDATE…FROM kept pinned by q_update_from])
    "q_mor_merge_on_read",
    "q_update_from",
    "q_maintenance_invariance",
    "q_snapshot_isolation",
    "q_otel_dashboard",
    # streaming + custom source (rotated out across rounds:
    # q_streaming_windowed_counts, and in round 9
    # q_streaming_session_windows / q_streaming_stream_join — all
    # multi-round certified pure built-in streaming shapes, unchanged)
    "q_streaming_ingest",
    "q_streaming_multi_table",
    "q_streaming_changefeed",
    # (q_custom_source rotated out round 10 continuation — certified
    # r1-r10, unchanged; q_streaming_changefeed keeps the custom Python
    # DataSource surface pinned)
    # corpus parity (q_training_pipeline rotated out round 13 —
    # gate-certified r5-r12, unchanged composite of surfaces that each
    # keep their own gate pin)
    "q_slt_parity",
    # new/changed round 6-7 (rotated in; rotated out across rounds:
    # q_token_stats / q_bpe_ish_tokens / q_distinct_sketch /
    # q_time_bucket_counts / q_error_rate — all multi-round certified,
    # pure built-in expression shapes, unchanged)
    # (q_variant_family rotated out round 13 — gate-certified r2-r12
    # [10 rounds, the longest streak in the registry], unchanged; the
    # Variant storage/coerce/`->>` surface stays pinned by
    # q_streaming_changefeed_variant)
    "q_update_inplace",
    "q_dml_coalesced",
    "q_streaming_changefeed_variant",
    # new round 8: bulk network ingest entry points — COPY FROM STDIN
    # (chunked flushes + atomic group publish) and the Arrow-IPC
    # seq-acked listener (ack == durable, txn-watermark replay skip);
    # together the gRPC ingest-endpoint analog. Rotated out:
    # q_lsh_bucket_histogram and q_ann_bruteforce_topk (multi-round
    # certified, pure built-in shapes, unchanged).
    # (q_copy_ingest rotated out round 13 — gate-certified r8-r12
    # including the r12 delimiter/quote hardening; the network bulk-
    # ingest surface stays pinned by q_arrow_ingest and the COPY wire
    # tests; q_text_search_sql rotated out round 13 — gate-certified
    # r8-r12, unchanged; the text-index family keeps THREE gate pins:
    # q_text_search_prefix / q_text_search_raw_tokenizer /
    # q_text_search_compound_or)
    "q_arrow_ingest",
    # similarity / ANN (rotated out round 13 — VERDICT r12 #2 backlog
    # retirement: q_ann_ivf_topk / q_ann_ivf_flat / q_ann_knn_join_large,
    # all gate-certified r5/r6-r12 and unchanged; the IVF/ANN family
    # keeps five gate pins: q_ann_pq_adc / q_ann_opq_adc /
    # q_ann_ivf_append / q_ann_ivfopq / q_ann_ivf_partitioned /
    # q_ann_ivf_streaming)
    # percentile family + timeseries operators (q_hypertable_rollup
    # rotated out round 9; q_percentile_sketch rotated out round 10
    # continuation — multi-round certified, unchanged, and
    # q_percentile_tiles keeps the t-digest two-step API pinned)
    "q_percentile_tiles",
    # round 7 late addition: the explicit-transaction lifecycle (commit-
    # group staging, atomic publish, definitive rollback, read-your-own-
    # writes) — brand-new code path; rotated out: q_latest_event_per_user
    # (multi-round certified, pure built-in window shape, unchanged)
    "q_txn_atomic_commit",
    # new round 7 (rotated in; rotated out: q_moving_avg /
    # q_sessionization — multi-round certified, pure built-in window
    # shapes, unchanged; the count index and the trigram-indexed search
    # are the new high-risk storage/accelerator surfaces)
    # (q_text_search_indexed rotated out round 13 — gate-certified
    # r7-r12, unchanged; see the text-index family pins above)
    "q_count_index",
    # round 8 late additions q2_min_cost_supplier / q20_potential_promotion
    # rotated out round 11 (gate-certified r8-r10, unchanged pure
    # relational shapes); BM25 stays (float ln() in the score).
    "q_bm25_rank",
    # (q_fuzzy_decontamination rotated out round 10 continuation —
    # gate-certified r8-r10, unchanged; q_asof_join rotated out r8;
    # q_dedup_substring rotated out round 11 — gate-certified r8-r10,
    # unchanged, and its Arrow twin q_dedup_substring_arrow stays pinned;
    # q_streaming_dedup_online rotated out round 11 — gate-certified
    # r8-r10, unchanged)
    # (q_time_travel rotated out round 10 continuation — multi-round
    # certified, unchanged; q_snapshot_isolation and q_delta_history keep
    # the commit-log read surfaces pinned)
    # round 9 rotations (ADVICE r8 #2: changed/new queries belong in the
    # gate window). Changed THIS round: the PQ/ADC pipeline (joint-Lloyd
    # fit, hoisted-literal + Arrow encode, checkpointed codes), the LSH
    # degenerate-bucket routing (null-safe hot join, NULL-vs-'' routing
    # key, broadcast split), the substring-dedup short-doc contract
    # (both kernels). Changed/new in r8 but never gate-certified:
    # q_funnel_analysis (greedy min-chasing rewrite),
    # q_decontamination_bloom, q_trace_path_recursive_sql. Rotated out
    # (multi-round certified, pure built-in shapes, UNCHANGED):
    # q_insert_unnest_bulk, q_otel_promoted_columns,
    # q_otel_metrics_rollup, q_streaming_session_windows,
    # q_streaming_stream_join, q_stats_introspection,
    # q_continuous_aggregate.
    "q_ann_pq_adc",
    "q_dedup_substring_arrow",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    # (q_funnel_analysis rotated out round 12 — gate-certified r9-r11,
    # unchanged pure built-in shape; slot taken by q_pgwire_dml_literals)
    "q_trace_path_recursive_sql",
    # new round 9: per-field tokenizer routing under plain SQL (raw-term
    # index serves equality, declines substring). Rotated out:
    # q_mor_keep_first (multi-round certified, unchanged).
    "q_text_search_raw_tokenizer",
    # (q_ann_ivfpq rotated out round 13 — gate-certified r9-r12,
    # unchanged; q_ann_ivfopq keeps the composed residual-codebook ADC
    # path pinned as its superset)
    # new round 10: DELTA HISTORY/ACTIONS/RECOVERY AUDIT commit-log
    # introspection verbs (fresh pgshim code path over the commit log).
    # Rotated out: q_table_changes (multi-round certified, unchanged —
    # and the new q_delta_history exercises the same commit-log records
    # from the introspection side).
    "q_delta_history",
    # new round 10: prefix/ILIKE/suffix LIKE routing + compound-AND
    # post-filtering through the text-index sidecars (fresh pgshim
    # routing code path, tantivy_rewriter.rs:29-48 full table). Rotated
    # out: q_decontamination_bloom (gate-certified r8-r9, unchanged).
    "q_text_search_prefix",
    # new round 10 (continuation): OPQ learned-rotation PQ (fresh
    # fit/rotate code path composing with the PQ machinery) and the
    # incremental IVF append lifecycle (fresh index-maintenance path).
    "q_ann_opq_adc",
    "q_ann_ivf_append",
    # new round 10 (continuation): bigram-LM perplexity filtering —
    # fresh smoothed-LM scoring path with an exact-decimal keep verdict.
    # Rotated out: q_semantic_dedup (multi-round certified, unchanged).
    "q_bigram_perplexity_filter",
    # new round 10 (continuation): leakage-safe cluster-keyed splitting
    # (fresh components→hash-split composition; the oracle certifies
    # naive-split leakage > 0 and cluster-split leakage = 0) and
    # token-budget greedy sampling (window cumsum fill).
    "q_leakage_safe_split",
    "q_token_budget_sample",
    # new round 10 (continuation): the full FAISS factory composition
    # OPQ→IVF→PQ (fresh rotated-space index composition). Rotated out:
    # q16_supplier_relationship (gate-certified r8-r10, unchanged).
    "q_ann_ivfopq",
    # new round 10 (continuation): the cell-PARTITIONED persisted IVF
    # index with planning-time directory pruning (fresh storage-layout
    # path; PartitionFilters pinned in tests).
    "q_ann_ivf_partitioned",
    # new round 10 (continuation): IVF index maintained under streaming
    # ingest (assignment rides the stream; checkpoint resume indexes only
    # new arrivals — fresh streaming/index composition).
    "q_ann_ivf_streaming",
    # new round 11: mixed AND/OR precedence under text-index routing —
    # the VERDICT r10 wrong-answer bug's regression query (top-level OR
    # declines, parenthesized OR and qualified conjuncts route, answers
    # scan-identical).
    "q_text_search_compound_or",
    # rotated IN round 11 (changed code must sit in the gate window):
    # q_deletion_vectors — the DV DML path gained dedup-keyed visible-row
    # semantics (ADVICE r10 medium); q_table_changes — read_changes'
    # default cap clamp + the settled-prefix incremental upper-bound scan
    # (VERDICT r10 #4/#6); q_pg_shim_dialect — array-literal parsing now
    # rejects empty unquoted elements and the canonical-numeric rule
    # covers trailing fraction zeros (VERDICT r10 #5, ADVICE r10).
    "q_deletion_vectors",
    "q_table_changes",
    "q_pg_shim_dialect",
    # new round 12: pgwire-path DML whose predicates/SET exprs contain the
    # table name INSIDE string literals on a partitioned table — the
    # review r11-judge #1 wrong-row-data-loss regression shape (the
    # qualifier strip is now literal-skipping and subquery-scoped).
    # Rotated out: q_funnel_analysis (gate-certified r9-r11, pure
    # built-in window/aggregation shape, unchanged since r9).
    "q_pgwire_dml_literals",
    # rotated IN round 13 (VERDICT r12 #2: start retiring the 48-query
    # never-gate-certified backlog; these 12 are the shapes the gate has
    # never seen at all — window families, ordered-set/regression aggs,
    # gapfill/LOCF, anomaly scoring, the pointer-doubling critical path,
    # three TPC-H join shapes (EXISTS decorrelation, left-join
    # distribution, multi-relation anti/semi), plus the two queries whose
    # code changed in r12 (q_dedup_editdistance's FLOOR-aligned oracle,
    # q_unigram_logprob's 1-row corpus-total broadcast) — changed code
    # belongs in the gate window. All 12 verified green at
    # sf0.001/0.01/0.1 this round before rotating in.
    "q_window_rank_family",
    "q_window_time_range",
    "q_ordered_set_aggs",
    "q_regression_stats",
    "q_gapfill_locf",
    "q_anomaly_zscore",
    "q_trace_critical_path",
    "q4_order_priority",
    "q13_customer_distribution",
    "q21_waiting_suppliers",
    "q_dedup_editdistance",
    "q_unigram_logprob",
)


def _reorder() -> None:
    """Rebuild REGISTRY with PRIORITY names first, then the remaining
    entries in registration order. A PRIORITY name missing from the
    registry is a hard error, not a silent skip: a typo'd rotation would
    shift every later entry up one slot and evict the query the rotation
    meant to pin from the driver's first-50 gate with zero signal
    (review r13)."""
    missing = [n for n in PRIORITY if n not in REGISTRY]
    if missing:
        raise ValueError(f"PRIORITY names not registered: {missing}")
    if len(PRIORITY) != len(set(PRIORITY)):
        raise ValueError("PRIORITY contains duplicate names")
    if len(PRIORITY) != 50:
        raise ValueError(
            f"PRIORITY must pin exactly the 50-query gate window, got "
            f"{len(PRIORITY)}"
        )
    ordered = {n: REGISTRY[n] for n in PRIORITY}
    for n, spec in REGISTRY.items():
        if n not in ordered:
            ordered[n] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


def load_all() -> None:
    """Import every query module so their registrations run, then order the
    registry so the driver's first-50 gate covers the highest-risk queries."""
    from timefusion_spark.queries import (  # noqa: F401
        dedup_llm,
        functions_pg,
        json_variant,
        multimodal,
        pipeline_scale,
        relational,
        similarity,
        slt_parity,
        sources_q,
        storage_mor,
        text_analysis,
        timeseries,
    )

    _reorder()
