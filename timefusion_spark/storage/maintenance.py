"""Maintenance jobs: compaction, dedup sweep, vacuum, schema widening, stats.

Reference analogs (file:line in /root/reference/src/):
  - OPTIMIZE / compact_date (database.rs:5675, 6150): read partition → sort
    to sorting_columns → overwrite that partition with few large files.
  - dedup sweep (database.rs:6737 `dedup_partition`): rewrite a partition
    keeping only winning versions — physical duplicate removal.
  - VACUUM (database.rs:9514): delete files no longer referenced. Plain
    parquet has no transaction log, so the analog is temp/stray-file cleanup;
    dynamic partition overwrite already removes replaced data files.
  - migrate-columns (main.rs:622-671): widen the stored schema with new
    nullable columns — a sidecar rewrite; existing files read as NULL for
    the new columns via the explicit read schema.
  - stats introspection (stats_table.rs): per-partition file/byte/row counts
    as a DataFrame.
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timefusion_spark.storage.schema import FieldDef
from timefusion_spark.storage.table import Table


TEXT_INDEX_DIR = "_tf_text_index"


def create_text_index(
    table: Table,
    text_col: str,
    id_col: str | None = None,
    tokenizer: str = "ngram3",
) -> Table:
    """Build (or rebuild) the trigram text-index sidecar for `text_col` —
    the tantivy-index-dir analog (`tantivy_index/`, built beside the data;
    TantivyPredicateRewriter serves text_match from it). The sidecar is a
    full storage Table at `<table>/_tf_text_index/<col>/`: (id, gram,
    gbucket) rows partitioned by gram hash-bucket so a probe prunes to
    O(query grams) partitions. A meta sidecar records the base table's
    commit version at build time; `text_index_for` declines a stale index
    (the base advanced), so the SQL interception can never serve an
    under-selecting candidate set — the reference's "index only prunes,
    predicate always re-verifies" contract plus decline-on-doubt.

    `id_col` is the candidate-join column (defaults to the first dedup key,
    else the time column). It need not be unique: a matching row's own
    grams always qualify its id, so a shared id can only OVER-select —
    the exact text_match verify removes the excess.

    `tokenizer` routes per field exactly like the reference's per-field
    tantivy config (schemas/*.yaml `tantivy: {tokenizer}`; routing table
    tantivy_rewriter.rs:29-48): 'ngram3' (default) indexes trigrams and
    serves substring text_match; 'raw' indexes the whole value as one
    term and serves only equality probes — substring probes DECLINE to
    the scan path (answers identical either way; acceleration only)."""
    import json
    import shutil
    import uuid as _uuid

    from timefusion_spark.operators.text_index import raw_term_index, trigram_index
    from timefusion_spark.storage.schema import TableSchema

    if tokenizer == "default":
        # the reference's third tokenizer (tantivy's simple word splitter,
        # schema.rs DEFAULT_TOKENIZER) serves LIKE 'lit'/'pre%' and exact
        # ILIKE (tantivy_rewriter.rs:29-48) — a strict SUBSET of what the
        # trigram sidecar serves, and the additive contract (predicate
        # always re-applies) makes the answers identical regardless of the
        # physical index. Accepting the name keeps reference schemas with
        # `tantivy: {tokenizer: default}` working verbatim.
        tokenizer = "ngram3"
    if tokenizer not in ("ngram3", "raw"):
        raise ValueError(
            f"create_text_index: unknown tokenizer {tokenizer!r} "
            "(expected 'ngram3', 'raw' or 'default')"
        )

    if id_col is None:
        id_col = (
            table.schema.dedup_keys[0]
            if table.schema.dedup_keys
            else table.schema.time_column
        )
    declared = {f.name: f.data_type for f in table.schema.fields}
    for col in (text_col, id_col):
        if col not in declared:
            raise ValueError(
                f"create_text_index: {col!r} is not a column of "
                f"{table.schema.table_name}"
            )
    base_version = table.log.latest_version()
    docs = table.read().select(F.col(id_col), F.col(text_col))
    indexer = raw_term_index if tokenizer == "raw" else trigram_index
    idx_df = indexer(docs, id_col=id_col, text_col=text_col)
    from timefusion_spark.storage.schema import SortingColumnDef

    schema = TableSchema(
        table_name=f"{table.schema.table_name}__trgm_{text_col}",
        fields=[
            FieldDef(id_col, declared[id_col], True),
            FieldDef("gram", "Utf8", False),
            FieldDef("gbucket", "Int32", False),
        ],
        partitions=["gbucket"],
        time_column=id_col,
        # files sort by gram: parquet row-group min/max stats then prune
        # both the equi-probes (gram IN (...)) and the raw index's
        # term-range startswith probes to the matching groups — at corpus
        # scale a prefix probe seeks instead of scanning the sidecar
        sorting_columns=[SortingColumnDef("gram")],
    )
    path = os.path.join(table.path, TEXT_INDEX_DIR, text_col)
    if os.path.isdir(path):
        shutil.rmtree(path)  # rebuild from scratch (REINDEX semantics)
    sidecar = Table.create(table.spark, schema, path)
    sidecar.append(idx_df)
    meta = {
        "text_col": text_col,
        "id_col": id_col,
        "base_version": base_version,
        "tokenizer": tokenizer,
    }
    tmp = os.path.join(path, f".meta-{_uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_tf_textindex.json"))
    return sidecar


def refresh_text_index(table: Table, text_col: str) -> str:
    """Bring the trigram sidecar up to the base table's commit tip
    INCREMENTALLY — the ingest-maintained-tantivy analog: index only the
    parquet files ADDED since the recorded base version and advance the
    version stamp. Returns 'fresh' | 'incremental'.

    Correctness argument (why adds are sufficient): the index may only
    OVER-select — the exact text_match predicate re-verifies every
    candidate. Removed/rewritten files, deletion vectors and tombstones
    leave stale (id, gram) rows behind, which can only over-select; the
    ONLY way to under-select is a visible row whose grams were never
    indexed, and every such row lives in a file some commit ADDED after
    the base version. Duplicate (id, gram) pairs from re-appends are
    harmless: the candidate gate counts DISTINCT grams. Files added then
    already vacuumed are skipped — their surviving rows were rewritten
    into other added files."""
    import json
    import uuid as _uuid

    from timefusion_spark.operators.text_index import raw_term_index, trigram_index
    from timefusion_spark.storage.table import DV_DIR

    path = os.path.join(table.path, TEXT_INDEX_DIR, text_col)
    meta_path = os.path.join(path, "_tf_textindex.json")
    if not os.path.exists(meta_path):
        raise ValueError(
            f"no text index on {table.schema.table_name}.{text_col}; "
            "build one with create_text_index / CREATE INDEX"
        )
    with open(meta_path) as fh:
        meta = json.load(fh)
    tip = table.log.latest_version()  # read BEFORE indexing: a commit
    # landing after this point leaves meta < tip, so text_index_for still
    # declines — never an unindexed visible row behind a 'fresh' stamp
    base = int(meta["base_version"])
    if base >= tip:
        return "fresh"
    seen: dict[str, None] = {}
    for v in range(base + 1, tip + 1):
        rec = table.log.entry(v)
        if rec.get("op") == "overwrite":
            # same-rows rewrite (compaction / consolidation / z-order /
            # dedup sweep): every row it re-adds was visible before the
            # rewrite and is already indexed — re-indexing it each
            # maintenance cycle would grow the sidecar without bound
            # (review r11). 'append' and 'dml' commits are the only ops
            # that can introduce unindexed visible rows.
            continue
        for f in rec.get("add", []):
            p = f["path"]
            if p.startswith(DV_DIR + "/") or not p.endswith(".parquet"):
                continue
            seen.setdefault(p)
    added = [p for p in seen if os.path.exists(os.path.join(table.path, p))]
    if added:
        # basePath recovers PARTITION columns from the file paths — a
        # sidecar keyed on a partition column (id_col='project_id' is a
        # natural choice) would otherwise AnalysisException here, since
        # Hive-partitioned data files don't physically store those columns
        docs = (
            table.spark.read.option("basePath", table.path)
            .parquet(*[os.path.join(table.path, p) for p in added])
            .select(meta["id_col"], text_col)
        )
        sidecar = Table.open(table.spark, path)
        indexer = (
            raw_term_index if meta.get("tokenizer", "ngram3") == "raw" else trigram_index
        )
        sidecar.append(indexer(docs, id_col=meta["id_col"], text_col=text_col))
    meta["base_version"] = tip
    tmp = os.path.join(path, f".meta-{_uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)
    return "incremental"


def text_indexes_of(table: Table) -> list[str]:
    """Columns of `table` that have a trigram sidecar (fresh or stale)."""
    root = os.path.join(table.path, TEXT_INDEX_DIR)
    if not os.path.isdir(root):
        return []
    return sorted(
        d
        for d in os.listdir(root)
        if os.path.exists(os.path.join(root, d, "_tf_textindex.json"))
    )


def text_index_for(table: Table, text_col: str):
    """The FRESH text-index sidecar for `text_col`, as (Table, meta dict) —
    or None when absent or stale (any base-table commit after the build,
    including maintenance rewrites: conservatively correct, since the
    interception must never serve candidates that miss a newer row)."""
    import json

    path = os.path.join(table.path, TEXT_INDEX_DIR, text_col)
    meta_path = os.path.join(path, "_tf_textindex.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("base_version") != table.log.latest_version():
        return None  # stale: fall back to the scan path
    return Table.open(table.spark, path), meta


def _check_partition_keys(table: Table, partition_values: dict[str, str]) -> None:
    """Refuse partition_values keys that are not partition columns. A
    rewrite filtered by a DATA column reads only the matching rows but
    overwrite_partitions clears EVERY live file in the affected dirs —
    silently dropping all non-matching rows from the manifest (review
    r11: `OPTIMIZE t WHERE project_id='p1'` on a [date]-partitioned
    table would destroy every other project's rows in those dates)."""
    bad = sorted(set(partition_values) - set(table.schema.partitions))
    if bad:
        raise ValueError(
            f"{bad} are not partition columns of "
            f"{table.schema.table_name!r} (partitions: "
            f"{table.schema.partitions}); a rewrite filtered by a data "
            "column would drop the non-matching rows in the affected "
            "partitions"
        )


def _partition_filter(df: DataFrame, partition_values: dict[str, str]) -> DataFrame:
    # eqNullSafe: a None value (the __HIVE_DEFAULT_PARTITION__ dir) must
    # select the NULL partition — `col == None` matches nothing
    for k, v in partition_values.items():
        df = df.where(F.col(k).eqNullSafe(F.lit(v)))
    return df


@contextlib.contextmanager
def _dynamic_overwrite(spark: SparkSession):
    """Pin partitionOverwriteMode=dynamic for the duration of a partition
    overwrite (save/restore). Under the static default — which a
    driver-supplied session may carry — mode('overwrite').partitionBy(...)
    TRUNCATES the whole directory, deleting every partition not present in
    the written frame; dynamic replaces exactly the written partitions."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _overwrite_partitions(
    table: Table, df: DataFrame, read_files: list[str] | None = None
) -> None:
    # Dynamic partition overwrite: only the partitions present in `df` are
    # replaced — the replaceWhere analog (database.rs:6344
    # recompress_partition). Log-tracked tables publish the rewrite as ONE
    # atomic commit (add staged files, remove the replaced partition's
    # files) so a concurrent reader sees either the old or the new layout,
    # never a mix; pre-log tables use Spark's dynamic overwrite, with the
    # mode asserted locally rather than assumed from the session builder.
    # `read_files` pins the remove-set to the exact file list the rewrite
    # read (see Table.overwrite_partitions): a file appended concurrently
    # — or published by an in-window group — survives instead of being
    # silently dropped.
    if table.log.exists():
        table.overwrite_partitions(df, read_files=read_files)
        return
    writer = df.write.mode("overwrite").options(**table._writer_options())
    if table.schema.partitions:
        writer = writer.partitionBy(*table.schema.partitions)
    with _dynamic_overwrite(table.spark):
        writer.parquet(table.path)


def compact(table: Table, partition_values: dict[str, str], target_files: int = 1) -> int:
    """OPTIMIZE: rewrite one partition's files into `target_files` sorted
    files. Returns rows rewritten. Keeps ALL row versions (compaction does
    not resolve merge-on-read — that is the dedup sweep's job)."""
    _check_partition_keys(table, partition_values)
    pinned, rf = table.pinned_raw()
    part = _partition_filter(pinned, partition_values)
    rows = part.count()
    if rows == 0:
        return 0
    out = part.repartition(target_files)
    if table.schema.sorting_columns:
        out = out.sortWithinPartitions(
            *[F.col(c) for c in table.schema.partitions], *table._sort_cols()
        )
    _overwrite_partitions(table, out, read_files=rf)
    return rows


def consolidate(
    table: Table,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
) -> list[str]:
    """Leveled small-file consolidation (database.rs:6590-6736 consolidate
    / main.rs --consolidate): pick every partition whose live file count
    is ≥ `min_files` AND whose average live file is under half the
    target, and compact each into ceil(bytes/target) sorted files.

    Candidate selection is PURE MANIFEST METADATA — file counts and sizes
    come from the commit log snapshot, zero filesystem LISTs and zero
    data reads for partitions already healthy. At object-store scale
    that's the difference between a nightly metadata scan and an
    O(table) crawl; each unhealthy partition then rewrites as one atomic
    commit. Returns the partition directories consolidated."""
    if not table.log.exists():
        raise ValueError("consolidate requires a commit log (Table.create)")
    from timefusion_spark.storage.table import DV_DIR

    by_dir: dict[str, list[int]] = {}
    for rel, size in table.log.snapshot().files.items():
        d = os.path.dirname(rel)
        if d == DV_DIR or d.startswith(DV_DIR + "/"):
            # Deletion-vector files are NOT data partitions: their dir
            # parses to an empty partition dict, so treating them as a
            # candidate would trigger compact(table, {}) — a silent
            # FULL-TABLE rewrite. DV accumulation is dv_sweep's job.
            continue
        by_dir.setdefault(d, []).append(size)
    done = []
    for d, sizes in sorted(by_dir.items()):
        total = sum(sizes)
        if len(sizes) < min_files or total / len(sizes) >= target_file_bytes / 2:
            continue
        # manifest dir names are Hive-ESCAPED ('team%20a', the NULL
        # sentinel): unescape before building the compact filter, or the
        # predicate matches zero rows and the partition silently never
        # consolidates while being reported done
        from timefusion_spark.storage.dml import _unescape_partition_value

        parts = {
            k: _unescape_partition_value(v)
            for k, v in (p.split("=", 1) for p in d.split("/") if "=" in p)
        }
        n_out = max(1, -(-total // target_file_bytes))
        compact(table, parts, target_files=n_out)
        done.append(d)
    return done


def dv_sweep(table: Table) -> int:
    """Deletion-vector housekeeping: drop DV entries whose data file is no
    longer live (a compaction/consolidation already materialized the mask
    and removed the file from the manifest — the entries then match
    nothing and are pure read-side overhead). The surviving entries
    rewrite into one consolidated DV file, published as ONE commit (add
    new, remove old); an all-orphan set removes the DV files outright.
    Returns the number of entries dropped."""
    import uuid as _uuid

    from timefusion_spark.storage.table import DV_DIR

    snap = table.log.snapshot()
    dv_rel = [p for p in snap.files if p.startswith(DV_DIR + "/")]
    if not dv_rel:
        return 0
    data_live = [p for p in snap.files if not p.startswith(DV_DIR + "/")]
    dv = table.spark.read.parquet(
        *[os.path.join(table.path, p) for p in dv_rel]
    ).select("_tf_dv_file", "_tf_dv_pos")
    # membership via a broadcast join, not Column.isin: a literal IN over
    # every live file path is O(files) per row and bloats the plan at the
    # file counts this module targets (review r11)
    live_df = F.broadcast(
        table.spark.createDataFrame(
            [(p,) for p in data_live], "_tf_live string"
        )
    )
    joined = dv.join(
        live_df, F.col("_tf_dv_file") == F.col("_tf_live"), "left"
    )
    keep = joined.where(F.col("_tf_live").isNotNull()).select(
        "_tf_dv_file", "_tf_dv_pos"
    )
    counts = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.col("_tf_live").isNotNull().cast("long")), F.lit(0)
        ).alias("k"),
    ).collect()[0]
    n_before, n_after = counts["n"], counts["k"]
    if n_after == n_before:
        return 0
    if n_after == 0:
        table.log.commit(add=[], remove=dv_rel, op="overwrite")
        return n_before
    rel = f"{DV_DIR}/{_uuid.uuid4().hex}.parquet"
    stage = os.path.join(table.path, "_tf_staging", _uuid.uuid4().hex)
    keep.coalesce(1).write.parquet(stage)
    part = next(n for n in os.listdir(stage) if n.endswith(".parquet"))
    src = os.path.join(stage, part)
    size = os.path.getsize(src)
    os.replace(src, os.path.join(table.path, rel))
    import shutil as _shutil

    _shutil.rmtree(stage, ignore_errors=True)
    table.log.commit(add=[(rel, size)], remove=dv_rel, op="overwrite")
    return n_before - n_after


def dedup_sweep(table: Table, partition_values: dict[str, str]) -> int:
    """Physical duplicate removal: rewrite one partition keeping only the
    winning version per dedup key (database.rs:6737). Tombstone WINNERS are
    kept — the key must stay masked for older versions living in other
    partitions; fully dropping a key is `vacuum_tombstones`. Returns the
    number of physical rows removed."""
    if not table.schema.dedup_keys:
        return 0
    _check_partition_keys(table, partition_values)
    pinned, rf = table.pinned_raw()
    raw = _partition_filter(pinned, partition_values)
    before = raw.count()
    winners = table._dedup_view(raw, policy="keep_greatest")
    after = winners.count()
    if after < before:
        out = winners
        if table.schema.sorting_columns:
            out = out.sortWithinPartitions(
                *[F.col(c) for c in table.schema.partitions], *table._sort_cols()
            )
        _overwrite_partitions(table, out, read_files=rf)
    return before - after


def zorder_rewrite(
    table: Table,
    partition_values: dict[str, str],
    cols: list[str] | None = None,
    bits: int = 8,
) -> int:
    """OPTIMIZE … ZORDER BY analog (database.rs z-order compaction path;
    e2e idempotence contract tests/e2e/zorder_idempotence.rs): rewrite one
    partition with rows clustered along a Z-order (Morton) curve over
    `cols`, so multi-column range predicates prune row groups on every
    listed column instead of only the leading sort key.

    Each column is rank-normalized into 2^bits buckets (percent_rank —
    distribution-agnostic), and bucket bits are interleaved into the sort
    key. The global-order window runs over ONE table partition (the unit
    the reference compacts), which bounds the sort. Deterministic, hence
    idempotent: a second rewrite reproduces the same layout."""
    cols = cols or table.schema.z_order_columns
    if not cols:
        return 0
    from pyspark.sql import Window as W

    _check_partition_keys(table, partition_values)
    pinned, rf = table.pinned_raw()
    part = _partition_filter(pinned, partition_values)
    rows = part.count()
    if rows == 0:
        return 0
    n = len(cols)
    staged = part
    for i, c in enumerate(cols):
        pr = F.percent_rank().over(W.orderBy(F.col(c).asc_nulls_first()))
        staged = staged.withColumn(
            f"_zb{i}",
            F.least(F.floor(pr * F.lit(1 << bits)).cast("long"), F.lit((1 << bits) - 1)),
        )
    zkey = F.lit(0).cast("long")
    for j in range(bits):
        for i in range(n):
            zkey = zkey + F.shiftleft(
                F.shiftright(F.col(f"_zb{i}"), j).bitwiseAND(F.lit(1)), j * n + i
            )
    out = (
        staged.withColumn("_zkey", zkey)
        .repartition(1)
        # partition cols lead the sort so FileFormatWriter's dynamic-
        # partition ordering requirement is already satisfied and it does
        # not re-sort (its sort is unstable and would undo the clustering).
        .sortWithinPartitions(*table.schema.partitions, "_zkey", *cols)
        .drop("_zkey", *[f"_zb{i}" for i in range(n)])
    )
    _overwrite_partitions(table, out, read_files=rf)
    return rows


def drop_partitions_before(table: Table, cutoff_date: str) -> int:
    """Retention / TTL enforcement: drop every `date` partition strictly
    older than `cutoff_date` as ONE atomic log commit (remove-only) —
    the observability data-retention primitive. Readers see either all of
    the expired partitions or none; the dropped files stay on disk for
    in-flight readers of older snapshots until `vacuum` collects them.

    Metadata-only: no data is read or rewritten — the commit lists the
    removed files straight from the current snapshot's manifest, so at
    100 TB this costs one manifest scan regardless of data size. Returns
    the number of files dropped."""
    if "date" not in table.schema.partitions:
        raise ValueError("drop_partitions_before requires a date partition")
    if not table.log.exists():
        raise ValueError("drop_partitions_before requires a commit log (Table.create)")
    snap = table.log.snapshot()

    def part_date(rel: str) -> str | None:
        for seg in rel.split("/"):
            if seg.startswith("date="):
                return seg[len("date="):]
        return None

    removed = [p for p in snap.files if (d := part_date(p)) is not None and d < cutoff_date]
    if removed:
        table.log.commit(add=[], remove=removed, op="retention")
    return len(removed)


def vacuum(table: Table, retain_hours: float = 0.0) -> list[str]:
    """VACUUM by manifest diff (database.rs:9514): delete every data file
    in the table directory that the commit log's current snapshot does NOT
    reference — files replaced by compaction/dedup/z-order rewrites, or
    orphaned by a writer that staged but never committed. Also removes the
    stray non-data files Spark leaves behind (_SUCCESS markers, `.crc`
    checksums, temporary/staging dirs). Pre-log tables get only the
    stray-file cleanup (no manifest to diff against).

    `retain_hours` (the PG-surface `VACUUM t RETAIN n HOURS`; Delta's
    retention contract) keeps unreferenced files younger than the cutoff:
    readers of recent older snapshots — and writers mid-stage — keep
    their files for the grace window. 0 collects immediately (safe in a
    single-process engine where the snapshot is re-read per query)."""
    import shutil
    import time as _time

    cutoff = _time.time() - retain_hours * 3600.0
    removed: list[str] = []
    live = None
    if table.log.exists():
        # staged_files(): parquet staged by PENDING commit groups (an open
        # BEGIN…COMMIT, a mid-flight multi-table flush) sits at its final
        # path but is in no snapshot — without this union, VACUUM (default
        # retain 0) would collect an open transaction's data out from
        # under its own COMMIT. intent_files(): same protection for a
        # PLAIN append between its file moves and its log commit — the
        # writer declares the destination paths before moving, so a
        # concurrent VACUUM RETAIN 0 can't collect files the imminent
        # commit is about to publish (review r13).
        live = (
            set(table.log.snapshot().files)
            | table.log.staged_files()
            | table.intent_files()
        )
    # Sidecar stores live INSIDE the table dir but are NOT manifest-tracked
    # by the base log: quarantined DML rows (their only copy — losing them
    # is data loss) and text-index sidecars (self-contained Tables with
    # their own logs; their own vacuum runs against their own manifests).
    # _tf_dv deliberately stays under the diff: deletion-vector files ARE
    # base-manifest entries, so stale DVs dropped by dv_sweep get collected.
    protected = ("_tf_quarantine", TEXT_INDEX_DIR)
    for root, dirs, files in os.walk(table.path):
        rel_root = os.path.relpath(root, table.path)
        top = rel_root.split(os.sep)[0]
        in_log_dir = top == "_tf_log"
        if top in protected:
            dirs[:] = []
            continue
        for name in files:
            p = os.path.join(root, name)
            if name == "_SUCCESS" or name.endswith(".crc"):
                os.remove(p)
                removed.append(p)
            elif (
                live is not None
                and not in_log_dir
                and name.endswith(".parquet")
            ):
                rel = os.path.relpath(p, table.path).replace(os.sep, "/")
                if rel not in live and os.path.getmtime(p) <= cutoff:
                    os.remove(p)
                    removed.append(p)
        for d in list(dirs):
            if d.startswith("_temporary") or d == "_tf_staging":
                p = os.path.join(root, d)
                if os.path.getmtime(p) > cutoff:
                    # A writer may be mid-stage: leave young staging dirs
                    # for the retention window.
                    dirs.remove(d)
                    continue
                shutil.rmtree(p)
                dirs.remove(d)
                removed.append(p)
    # Prune now-empty partition directories left by manifest-diff deletes.
    for root, dirs, files in os.walk(table.path, topdown=False):
        if root != table.path and not dirs and not files:
            os.rmdir(root)
    return removed


def migrate_columns(table: Table, new_fields: list[FieldDef]) -> None:
    """Widen the declared schema with new NULLABLE columns (main.rs:622-671).
    Zero data rewrite: the sidecar gains the columns; every existing file
    reads NULL for them through the explicit read schema (parquet
    missing-column semantics — the mergeSchema analog)."""
    # validate EVERYTHING before mutating anything: a bad second field
    # must not leave the live schema half-migrated (in-memory fields out
    # of sync with the sidecar), and duplicates WITHIN new_fields must
    # not persist a sidecar with a doubled column
    existing = {f.name for f in table.schema.fields}
    for f in new_fields:
        if f.name in existing:
            raise ValueError(f"column {f.name} already exists")
        if not f.nullable:
            raise ValueError(f"column {f.name}: widening must be nullable")
        f.to_spark()  # validates the type string
        existing.add(f.name)
    table.schema.fields.extend(new_fields)
    table.save_schema()


def stats(table: Table) -> DataFrame:
    """Per-partition introspection (stats_table.rs analog): partition values,
    file count, bytes. Log-tracked tables report the commit log's LIVE
    snapshot (sizes come from the manifest — zero filesystem calls, which
    at object-store scale is the difference between a metadata read and a
    LIST storm); pre-log tables walk the directory."""
    spark = table.spark
    rows = []
    base = table.path
    if table.log.exists():
        from timefusion_spark.storage.dml import _unescape_partition_value

        by_dir: dict[str, list[int]] = {}
        for rel, size in table.log.snapshot().files.items():
            d = os.path.dirname(rel)
            if any(seg.startswith("_") for seg in d.split("/")):
                # deletion-vector masks (_tf_dv/…) and other sidecar dirs
                # are not data partitions — consolidate() skips them for
                # the same reason (review r11: on an unpartitioned table
                # they even collided with the real root-partition row)
                continue
            by_dir.setdefault(d, []).append(size)
        for d, sizes in by_dir.items():
            parts = {
                k: _unescape_partition_value(v)
                for k, v in (p.split("=", 1) for p in d.split("/") if "=" in p)
            }
            rows.append(
                {
                    "partition": json_dumps_sorted(parts),
                    "n_files": len(sizes),
                    "bytes": sum(sizes),
                }
            )
    else:
        for root, _dirs, files in os.walk(base):
            data = [f for f in files if f.endswith(".parquet")]
            if not data:
                continue
            rel = os.path.relpath(root, base)
            parts = dict(p.split("=", 1) for p in rel.split(os.sep) if "=" in p)
            rows.append(
                {
                    "partition": json_dumps_sorted(parts),
                    "n_files": len(data),
                    "bytes": sum(os.path.getsize(os.path.join(root, f)) for f in data),
                }
            )
    if not rows:
        return spark.createDataFrame([], "partition string, n_files long, bytes long")
    return spark.createDataFrame(rows).select("partition", "n_files", "bytes")


def json_dumps_sorted(d: dict) -> str:
    import json

    return json.dumps(d, sort_keys=True)


def refresh_rollup(
    table: Table,
    rollup_path: str,
    agg_fn,
    policy: str = "keep_greatest",
) -> list[tuple[str, ...]]:
    """Incrementally refresh a continuous aggregate (the TimescaleDB
    continuous-aggregate / reference hypertable-rollup maintenance job,
    the scheduled counterpart of q_hypertable_rollup's on-demand
    materialization).

    `agg_fn(visible_rows) -> DataFrame` computes the rollup for a slice of
    the table; its output MUST retain the table's partition columns — each
    source partition maps to the same rollup partition, so dynamic
    partition overwrite replaces exactly the recomputed tiles.

    Staleness is tracked per source partition directory as the set of
    (file, size, mtime) — a refresh recomputes ONLY partitions whose file
    signature changed since the last run (state in _refresh_state.json
    inside the rollup dir; the underscore prefix hides it from readers).

    Correctness under merge-on-read: version-appends never change a row's
    dedup keys, and `timestamp` (a dedup key) determines `date` — so all
    versions of a key live in one partition and per-partition dedup equals
    global dedup; aggregating the dedup view of only the stale partitions
    is exact.

    At 100 TB this is the difference between an O(changed-partitions)
    nightly job and an O(table) recompute: the partition predicate prunes
    the scan to changed dirs, and the overwrite touches only their tiles.
    Returns the refreshed partition-value tuples."""
    import json

    parts = table.schema.partitions
    if not parts:
        raise ValueError("refresh_rollup requires a partitioned table")
    state_file = os.path.join(rollup_path, "_refresh_state.json")
    old_state: dict[str, list] = {}
    if os.path.exists(state_file):
        with open(state_file) as fh:
            old_state = json.load(fh)

    # Signature per partition dir (relative path like project_id=p1/date=...).
    # Log-tracked tables sign with the LIVE snapshot's (file, size) sets —
    # part-file names are unique per write, so any data change changes the
    # signature, and dead files awaiting vacuum don't cause false staleness.
    new_state: dict[str, list] = {}
    base = table.path
    if table.log.exists():
        dv_sig: list[list] = []
        for rel, size in table.log.snapshot().files.items():
            d = os.path.dirname(rel)
            # non-partition manifest dirs (deletion vectors under
            # `_tf_dv/`) are not rollup tiles themselves: values() would
            # IndexError on a '='-less segment and the agg predicate is
            # meaningless. But a DV file CHANGES VISIBILITY of rows in
            # ordinary partitions without touching their files — fold the
            # DV set into every tile's signature so any DV change
            # conservatively re-stales all tiles.
            if any(seg.startswith("_") for seg in d.split("/")):
                dv_sig.append([rel, size])
                continue
            new_state.setdefault(d, []).append([os.path.basename(rel), size])
        dv_sig.sort()
        for sig in new_state.values():
            sig.sort()
            sig.extend(dv_sig)
    else:
        for dirpath, _dirs, files in os.walk(base):
            rel = os.path.relpath(dirpath, base)
            if any(seg.startswith(("_", ".")) for seg in rel.split(os.sep)):
                continue
            data = sorted(
                (f, os.path.getsize(os.path.join(dirpath, f)),
                 os.path.getmtime(os.path.join(dirpath, f)))
                for f in files
                if not f.startswith(("_", "."))
            )
            if data:
                new_state[rel] = [list(x) for x in data]

    stale = [p for p, sig in new_state.items() if old_state.get(p) != sig]
    # a partition whose files ALL left the manifest (a DELETE emptied it)
    # disappears from new_state instead of changing signature — its tile
    # must still be cleared, or the rollup reports rows for a partition
    # that no longer exists (review r11)
    vanished = [p for p in old_state if p not in new_state]
    if not stale and not vanished:
        return []

    # Partition-value tuples from the dir names (k=v/k=v...), Hive-
    # UNESCAPED: the dir says 'team%20a' for value 'team a' and the NULL
    # sentinel for None — matching the escaped text against column values
    # selects nothing, so the tile would be marked fresh without ever
    # being recomputed (permanently-stale rollup).
    from timefusion_spark.storage.dml import _unescape_partition_value

    def values(rel: str) -> tuple[str | None, ...]:
        return tuple(
            _unescape_partition_value(seg.split("=", 1)[1])
            for seg in rel.split(os.sep)
        )

    import shutil as _shutil

    stale_values = [values(p) for p in stale]
    if stale:
        pred = None
        for vals in stale_values:
            conj = None
            for col, v in zip(parts, vals):
                c = F.col(col).cast("string").eqNullSafe(F.lit(v))
                conj = c if conj is None else (conj & c)
            pred = conj if pred is None else (pred | conj)

        from timefusion_spark.storage.table import KEEP_GREATEST

        visible = table._tombstone_filter(
            table._dedup_view(table.read_raw().where(pred), policy=KEEP_GREATEST if policy == "keep_greatest" else policy)
        )
        out = agg_fn(visible)
        missing = [c for c in parts if c not in out.columns]
        if missing:
            raise ValueError(
                f"agg_fn output must retain partition columns; missing {missing}"
            )
        # one aggregation pass: the `present` collect below and the
        # overwrite would each execute agg_fn's whole plan — checkpoint
        # the result so the nightly maintenance path pays it once
        # (review r11-judge #7)
        out = out.localCheckpoint(eager=True)
        # tiles whose recomputed aggregate is EMPTY (all source rows
        # deleted/tombstoned) get nothing from the dynamic overwrite — it
        # only replaces partitions present in `out` — so their stale tile
        # must be cleared explicitly or it would report forever while the
        # state file marks it fresh (review r11). Membership uses Spark's
        # OWN string rendering (cast, same as the selection predicate and
        # the Hive dir names): Python str() diverges on booleans
        # ('True' vs dir 'flag=true'), which made every fresh tile of a
        # boolean-partitioned rollup look absent and get rmtree'd right
        # after being written (review r11-judge #2)
        present = {
            tuple(r[c] for c in parts)
            for r in out.select(
                [F.col(c).cast("string").alias(c) for c in parts]
            )
            .distinct()
            .collect()
        }
        with _dynamic_overwrite(table.spark):
            (
                out.write.mode("overwrite")
                .options(**table._writer_options())
                .partitionBy(*parts)
                .parquet(rollup_path)
            )
        for rel, vals in zip(stale, stale_values):
            if vals not in present:
                _shutil.rmtree(os.path.join(rollup_path, rel), ignore_errors=True)
    # partitions that left the manifest entirely have no rows to
    # aggregate — just clear their tiles
    for rel in vanished:
        _shutil.rmtree(os.path.join(rollup_path, rel), ignore_errors=True)
    # atomic state write (tmp + replace, like the text-index meta): a
    # crash mid-dump would otherwise leave a truncated JSON that breaks
    # every later refresh until manually deleted (review r11)
    import uuid as _uuid

    os.makedirs(rollup_path, exist_ok=True)
    tmp = os.path.join(rollup_path, f".state-{_uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(new_state, fh, sort_keys=True)
    os.replace(tmp, state_file)
    return stale_values + [values(p) for p in vanished]


def redrive_dml(table: Table, dry_run: bool = False) -> tuple[int, int]:
    """Replay parked (quarantined) coalesced-DML groups — the maintenance
    surface of `coalescer.redrive` (main.rs:155-174 `timefusion
    redrive-dml [--dry-run]`). Returns (recovered, left_parked)."""
    from timefusion_spark.storage import coalescer

    return coalescer.redrive(table, dry_run=dry_run)
