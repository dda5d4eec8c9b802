"""Streaming change-feed source: tail a table's commit log as a stream.

The Spark-native form of the reference's WAL-tailing subscriber contract
(buffered_write_layer.rs: ingest subscribers observe committed batches in
order): micro-batch OFFSETS ARE LOG VERSIONS. Each poll advances to the
log tip; a micro-batch (start, end] reads exactly the files those commits
added — the same rows `Table.read_changes(start, end)` returns — tagged
with `_commit_version` and `_change_type` ('delete' for tombstones,
'upsert' otherwise). Checkpoint recovery restarts from the committed
version, so a consumer sees every commit exactly once.

Scale shape: one input partition per added FILE (a commit's files decode
in parallel); workers read parquet directly via Arrow — the driver only
lists the log (metadata, no data I/O). Nothing is re-diffed: the commit
log already is the change stream.

Usage:
    spark.readStream.format("tf_changes").option("path", table_path)
         [.option("startingVersion", N)]  # default 0 → everything after create
         [.option("maxVersionsPerTrigger", K)]  # steady-state batch cap
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_LOG_DIR = "_tf_log"
_SIDECAR = "_tf_schema.json"


class _FilePartition(InputPartition):
    def __init__(self, abs_path: str, rel_path: str, version: int,
                 tombstone_col: str | None, part_types: dict[str, str],
                 field_order: list[str], arrow_types: dict,
                 variant_cols: tuple[str, ...] = ()):
        self.abs_path = abs_path
        self.rel_path = rel_path
        self.version = version
        self.tombstone_col = tombstone_col
        self.part_types = part_types
        self.field_order = field_order
        self.arrow_types = arrow_types
        self.variant_cols = variant_cols


def _read_data_file(path: str, variant_cols: tuple[str, ...], arrow_types: dict):
    """Worker-side file decode. Plain tables read via pyarrow; tables with
    Variant columns read via DuckDB's parquet reader (this container's
    pyarrow rejects the VARIANT logical type at the footer). The engine
    writes Variant UNSHREDDED, so DuckDB surfaces each variant column as
    struct<metadata: binary, value: binary> — reordered to (value,
    metadata) those two binaries ARE Spark's Arrow encoding for
    VariantType, no re-encoding needed. Non-variant columns normalize to
    the declared Arrow types (DuckDB may drop the UTC timezone label)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not variant_cols:
        import pyarrow.parquet as pq

        return pq.read_table(path)
    import duckdb

    quoted = path.replace("'", "''")
    tbl = duckdb.connect().execute(f"select * from read_parquet('{quoted}')").arrow()
    cols, names = [], []
    for name in tbl.column_names:
        arr = tbl.column(name).combine_chunks()
        if name in variant_cols:
            sub = {arr.type.field(i).name for i in range(arr.type.num_fields)}
            if "typed_value" in sub:
                raise ValueError(
                    f"{path}: variant column '{name}' is SHREDDED "
                    "(typed_value present) — the change-feed stream decodes "
                    "only the engine's unshredded variant layout; rewrite "
                    "the file through the table's own write path"
                )
            typ = pa.struct([
                pa.field("value", pa.binary(), nullable=False),
                pa.field("metadata", pa.binary(), nullable=False),
            ])
            arr = pa.StructArray.from_arrays(
                [arr.field("value").cast(pa.binary()),
                 arr.field("metadata").cast(pa.binary())],
                fields=[typ.field(0), typ.field(1)],
                mask=arr.is_null(),
            )
        elif name in arrow_types and arr.type != arrow_types[name]:
            arr = pc.cast(arr, arrow_types[name])
        cols.append(arr)
        names.append(name)
    return pa.table(dict(zip(names, cols)))


def _log_entries(log_dir: str) -> list[str]:
    if not os.path.isdir(log_dir):
        return []
    return sorted(
        f for f in os.listdir(log_dir)
        if f.endswith(".json") and not f.endswith(".checkpoint.json")
        and not f.startswith(".")
    )


class _ChangeFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tf_changes requires option 'path'")
        self.start_version = int(options.get("startingVersion", 0))
        # Backpressure (the reference's gRPC mem-pressure RETRY analog,
        # Spark's maxOffsetsPerTrigger idiom): cap how many commits one
        # micro-batch may advance, so a consumer restarting far behind the
        # tip drains in bounded batches instead of one giant catch-up.
        self.max_versions = int(options.get("maxVersionsPerTrigger", 0)) or None
        with open(os.path.join(self.path, _SIDECAR)) as fh:
            sc = json.load(fh)
        self.fields = [(f["name"], f["data_type"]) for f in sc["fields"]]
        self.partitions_cols = list(sc.get("partitions") or [])
        self.tombstone_col = sc.get("tombstone_column")
        self.part_types = {
            name: dt for name, dt in self.fields if name in self.partitions_cols
        }
        # Declared-field Arrow types (picklable), so workers can fill a
        # column that predates a migrate-columns widening with typed nulls
        # — an old file simply lacks the new column (parquet
        # missing-column semantics).
        from pyspark.sql.pandas.types import to_arrow_type

        from timefusion_spark.storage.schema import parse_data_type

        # Variant tables ARE streamable (the flagship otel schemas carry 7
        # Variant columns — the reference's WAL tail serves them too,
        # wal.rs:142-160): the engine stores Variant UNSHREDDED (plain
        # metadata/value binary pair, `table._unshredded_variants`), and
        # the worker decode path reads such files with DuckDB's parquet
        # reader (this container's pyarrow rejects the VARIANT logical
        # type at the footer), handing back exactly the two binaries that
        # form Spark's Arrow encoding for VariantType.
        self.variant_cols = tuple(n for n, dt in self.fields if dt == "Variant")
        self.arrow_types = {
            name: to_arrow_type(parse_data_type(dt)) for name, dt in self.fields
        }

    def initialOffset(self):
        return {"version": self.start_version}

    def latestOffset(self):
        entries = _log_entries(os.path.join(self.path, _LOG_DIR))
        tip = max((int(e.split(".")[0]) for e in entries), default=-1)
        tip = max(tip, self.start_version)
        # A PENDING coalesced commit (group resolution not yet settled)
        # must not be skipped over: cap the tip just below it so the batch
        # that includes it plans only after publish. A pending entry older
        # than ITS GROUP'S declared abort_after (60 s for streaming
        # coordinators; a heartbeat-refreshed day for interactive pgwire
        # transactions, which this poll therefore never ages out while the
        # client is alive) is settled as ABORTED first — the atomic
        # arbiter makes a late publish() fail instead of resurrecting rows
        # this feed has permanently advanced past — so the skip is
        # definitive, never a silent data loss.
        from timefusion_spark.storage.commitlog import settle_if_aged

        # The FIRST poll of a (re)started query scans from the query's
        # declared start — NOT from tip+1 (which would skip the gate
        # entirely and let the checkpoint advance past a still-pending
        # group, permanently dropping its rows from the feed once it
        # publishes). Capping below a pending commit can never plan a
        # backward batch: steady-state polls never hand out an offset at
        # or past a young pending commit, so any commit still pending at
        # restart is strictly ABOVE the committed checkpoint, and the
        # loop's range keeps the cap at or above start_version.
        base = getattr(self, "_last", None)
        scan_from = (base if base is not None else self.start_version) + 1
        log_dir = os.path.join(self.path, _LOG_DIR)
        # shared settled-prefix cache (r11 stretch): versions at or below
        # the floor are terminal — no pending commit can live there, so
        # the cap can never need to land below it. Skipping them keeps
        # the FIRST poll of a (re)started query O(new commits) instead of
        # O(tip - start) within this process (the cache is process-local;
        # correctness never depends on it).
        from timefusion_spark.storage.commitlog import (
            raise_settled_floor,
            settled_floor,
        )

        floor = settled_floor(log_dir)
        scan_from = max(scan_from, floor + 1)
        capped_at = None
        for v in range(scan_from, tip + 1):
            p = os.path.join(log_dir, f"{v:08d}.json")
            if not os.path.exists(p):
                continue
            with open(p) as fh:
                rec = json.load(fh)
            if settle_if_aged(rec, p, log_dir) == "pending":
                capped_at = v
                tip = v - 1
                break
        # raise the shared floor only when this scan EXTENDS a proven
        # prefix (scan started at the floor's edge): a scan that began at
        # the consumer's start offset says nothing about older versions
        if scan_from <= floor + 1:
            raise_settled_floor(log_dir, capped_at - 1 if capped_at else tip)
        if self.max_versions is not None:
            # The cap bounds the STEADY-STATE advance: each poll after the
            # first moves at most max_versions past the furthest offset
            # this reader has handed out or seen executing. The FIRST poll
            # of a (re)started query is deliberately uncapped — Spark asks
            # for the latest offset before revealing the committed start,
            # and returning anything below that start would plan a
            # backward batch and regress the checkpoint. (availableNow
            # batches the whole catch-up as one batch regardless.)
            base = getattr(self, "_last", None)
            if base is not None:
                tip = min(max(tip, base), base + self.max_versions)
        self._last = max(getattr(self, "_last", None) or tip, tip)
        return {"version": tip}

    def partitions(self, start, end):
        lo, hi = start["version"], end["version"]
        self._last = max(getattr(self, "_last", None) or lo, hi)
        out = []
        log_dir = os.path.join(self.path, _LOG_DIR)
        order = [n for n, _ in self.fields]
        for v in range(lo + 1, hi + 1):
            entry = os.path.join(log_dir, f"{v:08d}.json")
            with open(entry) as fh:
                rec = json.load(fh)
            # Rewrite/retention commits carry no logical change (see
            # Table.read_changes — the Delta CDF dataChange=false rule);
            # only append commits ship to the feed. In-place DML commits
            # (op 'dml') change visible rows in a way file adds cannot
            # represent — fail the stream loudly, mirroring
            # Table.read_changes. Pending/aborted coalesced commits
            # (unsettled group resolution) are invisible.
            if rec.get("op") == "dml":
                raise ValueError(
                    f"change feed cannot represent in-place DML commit {v}; "
                    "use a version_append table for change-feed consumers"
                )
            if rec.get("op") != "append":
                continue
            from timefusion_spark.storage.commitlog import _group_visible

            if not _group_visible(rec, log_dir):
                continue
            for f in rec.get("add", []):
                out.append(
                    _FilePartition(
                        os.path.join(self.path, f["path"]), f["path"], v,
                        self.tombstone_col, self.part_types, order,
                        self.arrow_types, self.variant_cols,
                    )
                )
        # Spark requires ≥1 partition per batch; an empty range yields an
        # empty file list — return a sentinel that reads nothing.
        return out or [
            _FilePartition("", "", -1, self.tombstone_col, self.part_types,
                           [n for n, _ in self.fields], self.arrow_types,
                           self.variant_cols)
        ]

    def read(self, partition: _FilePartition):
        if not partition.abs_path:
            return
        import datetime as dt

        import pyarrow as pa
        import pyarrow.compute as pc

        tbl = _read_data_file(partition.abs_path, partition.variant_cols,
                              partition.arrow_types)
        n = tbl.num_rows
        # Partition columns live in the directory name (k=v segments), not
        # in the file — reconstruct them as constant columns, typed per the
        # sidecar declaration.
        part_vals: dict[str, str] = {}
        for seg in partition.rel_path.split("/")[:-1]:
            if "=" in seg:
                k, val = seg.split("=", 1)
                part_vals[k] = val
        cols = []
        for name in partition.field_order:
            if name in part_vals:
                # Reconstruct the partition constant THROUGH the declared
                # arrow type (not a date32-or-string special case), so an
                # int/float-partitioned table emits arrays matching the
                # stream's declared schema — same casting rule as the batch
                # read path. Directory names are Hive-ESCAPED ('a b' →
                # 'a%20b', NULL → the sentinel dir): unescape exactly like
                # the batch read path, or the stream emits a different key
                # for the same row.
                from timefusion_spark.storage.dml import _unescape_partition_value

                v = _unescape_partition_value(part_vals[name])
                typ = partition.arrow_types[name]
                if v is None:
                    arr = pa.nulls(n, type=typ)
                elif pa.types.is_date(typ):
                    arr = pa.array([dt.date.fromisoformat(v)] * n, typ)
                else:
                    arr = pc.cast(pa.array([v] * n, pa.string()), typ)
            elif name in tbl.column_names:
                arr = tbl.column(name).combine_chunks()
            else:
                # Column added by migrate_columns after this file was
                # written: reads as typed NULLs, like the batch path.
                arr = pa.nulls(n, type=partition.arrow_types[name])
            cols.append(arr)
        names = list(partition.field_order)
        cols.append(pa.array([partition.version] * n, pa.int64()))
        names.append("_commit_version")
        if partition.tombstone_col and partition.tombstone_col in tbl.column_names:
            tomb = pc.fill_null(
                tbl.column(partition.tombstone_col).combine_chunks(), False
            )
            change = pc.if_else(tomb, pa.scalar("delete"), pa.scalar("upsert"))
        else:
            change = pa.array(["upsert"] * n, pa.string())
        cols.append(change)
        names.append("_change_type")
        out = pa.table(dict(zip(names, cols)))
        for batch in out.to_batches():
            yield batch

    def commit(self, end):
        self._last = max(getattr(self, "_last", None) or 0, end["version"])


class ChangeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tf_changes"

    def schema(self):
        # Declared table schema + the two feed columns. Reuses the engine's
        # own Arrow-name → Spark-type mapping so the stream's schema equals
        # Table.read_changes' schema exactly.
        from pyspark.sql import types as T

        from timefusion_spark.storage.schema import TableSchema

        with open(os.path.join(self.options["path"], _SIDECAR)) as fh:
            sc = TableSchema.from_dict(json.load(fh))
        fields = list(sc.spark_schema.fields) + [
            T.StructField("_commit_version", T.LongType()),
            T.StructField("_change_type", T.StringType()),
        ]
        return T.StructType(fields)

    def streamReader(self, schema):
        return _ChangeFeedStreamReader(self.options)
