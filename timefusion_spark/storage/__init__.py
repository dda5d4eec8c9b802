"""Storage core: YAML-declared tables, partitioned-parquet write path,
merge-on-read dedup views, DML, streaming ingest, maintenance.

Spark-first re-expression of the reference's storage engine
(/root/reference/src/: schema_loader.rs, buffered_write_layer.rs,
read_dedup.rs, dml.rs, database.rs maintenance paths). The WAL/MemBuffer/
hot-tier machinery collapses into Structured Streaming checkpoints + one
partitioned table as the single source of truth (SURVEY §1.4).
"""

from timefusion_spark.storage.schema import TableSchema, load_schema, load_schema_text
from timefusion_spark.storage.table import Table

__all__ = ["TableSchema", "Table", "load_schema", "load_schema_text"]
