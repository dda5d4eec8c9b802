"""Reference slt-corpus parity as a driver-checked query.

Runs every /root/reference/tests/slt/*.slt file through the engine's
sqllogictest runner (timefusion_spark/slt.py) and returns one row per
file: (file, records, passed). The oracle pins the expected counts —
all records pass (modulo the one documented skip in slt.SKIPS) — so
any regression in the PG shim, the storage write path, DML, or the MOR
read views turns this row red in CORRECTNESS.

Reference: tests/suite/sqllogictest.rs:1-40 runs the same files against
the live server; this is that suite re-homed onto Spark.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from timefusion_spark.registry import query

_SLT_DIR = "/root/reference/tests/slt"

_EXPECTED: list[tuple[str, int, int]] = [
    ("aggregations.slt", 23, 23),
    ("basic_operations.slt", 27, 27),
    ("custom_functions.slt", 15, 15),
    ("distinct_on_variant.slt", 2, 2),
    ("edge_cases.slt", 25, 25),
    ("filtering.slt", 22, 22),
    ("function_availability_test.slt", 15, 15),
    ("integration.slt", 44, 44),
    ("json_functions.slt", 29, 29),
    ("merge_on_read.slt", 23, 23),
    ("partition_pruning_test.slt", 6, 6),
    ("percentile_functions.slt", 30, 30),
    ("variant_column.slt", 20, 20),
    ("variant_functions.slt", 44, 44),
]

_ORACLE = "SELECT * FROM (VALUES " + ", ".join(
    f"('{f}', {n}, {p})" for f, n, p in _EXPECTED
) + ") AS t(file, records, passed) ORDER BY file"


@query(
    "q_slt_parity",
    oracle=_ORACLE,
    doc="The reference's own sqllogictest corpus (tests/slt/*.slt, run by "
    "tests/suite/sqllogictest.rs) executed end-to-end on this engine: "
    "INSERT/UPDATE/DELETE through the storage core, queries through the "
    "PG shim over MOR read views. Expected counts are pinned; passed "
    "includes the one documented skip (slt.SKIPS: PG's verbatim "
    "json-text slicing).",
)
def q_slt_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefusion_spark.slt import SKIPS, run_file

    rows = []
    for fname, _, _ in _EXPECTED:
        path = os.path.join(_SLT_DIR, fname)
        if not os.path.exists(path):
            continue
        base = tempfile.mkdtemp(prefix="tf_slt_")
        try:
            results = run_file(spark, path, base, skips=SKIPS.get(fname, {}))
        finally:
            shutil.rmtree(base, ignore_errors=True)
        rows.append((fname, len(results), sum(r.ok for r in results)))
    return spark.createDataFrame(rows, "file string, records int, passed int").orderBy(
        "file"
    )
