"""timefusion_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of monoscope-tech/timefusion.

The reference (/root/reference) is a Rust observability TSDB: Delta-on-S3
storage, DataFusion execution, PG wire protocol. This package re-expresses
its semantics Spark-first:

- storage: partitioned Parquet tables (project_id, date) with last-write-wins
  dedup + tombstone merge-on-read read views (reference: read_dedup.rs,
  database.rs:12553-13159) — ~3,000 LoC of custom physical operators in the
  reference collapse into window-function views here.
- functions: the PG/Timescale-parity scalar surface (reference:
  src/functions.rs) as native Column expression compositions.
- streaming: Structured Streaming ingest replacing WAL + MemBuffer + flush
  (reference: wal.rs, mem_buffer.rs, buffered_write_layer.rs).
- operators: large-scale training-data pipeline ops (dedup families,
  similarity search, text analysis, multimodal plumbing) designed
  partition-parallel for 100 TB.
"""

__version__ = "0.1.0"

from timefusion_spark.session import get_spark  # noqa: F401
