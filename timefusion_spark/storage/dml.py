"""DML over merge-on-read tables: UPDATE / DELETE / UPDATE…FROM.

Version-append semantics (dml.rs:765-914 `perform_version_append`): an
UPDATE or DELETE rewrites nothing — it resolves the currently-visible rows
from the dedup view, applies the assignments (or sets the tombstone), stamps
a fresh tiebreak, and APPENDS complete row versions. The read view's
keep-greatest window makes the new versions win.

The reference's derived date-bound clamp (optimizers/mod.rs:141-150) is the
`ts_lo`/`ts_hi` parameters — they bound both the time column and the `date`
partition, so the resolve scan prunes partitions instead of reading the
whole table.

UPDATE…FROM (dml.rs:84-130 `UpdateSource`): equi-join keys against a
materialized source, capped at MAX_UPDATE_SOURCE_ROWS (dml.rs:40) — the
source is broadcast (it is small by contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timefusion_spark.storage.table import Table

# dml.rs:40 — the reference materializes the UPDATE…FROM source and refuses
# above this; same guard here since we broadcast it.
MAX_UPDATE_SOURCE_ROWS = 1_000_000


def _resolve(
    table: Table,
    predicate: Column | str | None,
    project_id: str | None,
    ts_lo: str | None,
    ts_hi: str | None,
) -> DataFrame:
    """Currently-visible rows matching the DML predicate (the dedup view,
    partition-pruned by the derived date bounds)."""
    df = table.scan(project_id=project_id, ts_lo=ts_lo, ts_hi=ts_hi)
    if predicate is not None:
        df = df.where(predicate)
    return df


def _require_mor(table: Table) -> None:
    if not table.schema.version_append:
        raise ValueError(
            f"{table.schema.table_name}: DML requires version_append "
            "(in-place parquet mutation is not transactional; the reference's "
            "in-place path is Delta MERGE, unavailable here)"
        )


def _count_and_append(table: Table, new_versions: DataFrame, stamp) -> int:
    """Append the new versions and count them in the SAME job via an
    Observation metric: the resolve plan — a dedup-window scan of the
    whole table — executes exactly once, and no persist/second action is
    needed (dml.rs materializes the matched set before its version-append;
    the observe node is the Spark-native way to get the matched count as a
    side output of the write job itself)."""
    from datetime import datetime, timezone

    from pyspark.sql import Observation

    from timefusion_spark import clock

    if stamp is None:
        # Make the engine-owned stamp CONCRETE (instead of the lazy
        # current_timestamp() default) so the fallback below can identify
        # this append's rows by their tiebreak value. Reads the engine
        # clock, so frozen-clock runs produce reproducible DML stamps.
        stamp = datetime.fromtimestamp(
            clock.now_micros() / 1_000_000, tz=timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S.%f")
    obs = Observation()
    table.append(new_versions.observe(obs, F.count(F.lit(1)).alias("n")), stamp=stamp)
    try:
        return int(obs.get["n"])
    except Exception:
        # AQE's empty-relation propagation removes the CollectMetrics node
        # when the runtime-materialized matched set is EMPTY (the observe
        # subtree is replaced by an empty LocalRelation before it can
        # report). But an unreadable observation can ALSO follow a
        # successful non-empty append (py4j/listener failures), where
        # returning 0 would misreport a write that happened — so don't
        # guess: count the appended batch itself by the stamp this call
        # pinned above (a pushdown-friendly tiebreak-equality scan).
        tb = table.schema.dedup_tiebreak
        if isinstance(stamp, str) and tb:
            return (
                table.read_raw()
                .where(F.col(tb) == F.lit(stamp).cast("timestamp"))
                .count()
            )
        raise


def update(
    table: Table,
    assignments: dict[str, Column],
    predicate: Column | str | None = None,
    project_id: str | None = None,
    ts_lo: str | None = None,
    ts_hi: str | None = None,
    stamp: Column | str | None = None,
) -> int:
    """UPDATE table SET assignments WHERE predicate → rows updated."""
    _require_mor(table)
    matched = _resolve(table, predicate, project_id, ts_lo, ts_hi)
    new_versions = matched.withColumns(assignments)
    return _count_and_append(table, new_versions, stamp)


def delete(
    table: Table,
    predicate: Column | str | None = None,
    project_id: str | None = None,
    ts_lo: str | None = None,
    ts_hi: str | None = None,
    stamp: Column | str | None = None,
) -> int:
    """DELETE FROM table WHERE predicate → rows deleted (tombstone append)."""
    _require_mor(table)
    tomb = table.schema.tombstone_column
    assert tomb is not None  # guaranteed by version_append validation
    matched = _resolve(table, predicate, project_id, ts_lo, ts_hi)
    new_versions = matched.withColumn(tomb, F.lit(True))
    return _count_and_append(table, new_versions, stamp)


def update_from(
    table: Table,
    source: DataFrame,
    join_keys: list[str],
    assignments: dict[str, Column],
    predicate: Column | str | None = None,
    project_id: str | None = None,
    ts_lo: str | None = None,
    ts_hi: str | None = None,
    stamp: Column | str | None = None,
) -> int:
    """UPDATE … FROM source USING join_keys SET assignments.

    `predicate` filters the TARGET side before the join (the reference
    splits UPDATE…FROM conjuncts the same way, dml.rs:84-130: equi-join
    conjuncts become keys, target-only conjuncts stay filters).
    Assignment columns may reference ``source.<col>`` via the aliased side
    (`F.col("_src.<col>")`). The source is guarded to
    MAX_UPDATE_SOURCE_ROWS and broadcast — at 100 TB target-side scale the
    join stays a broadcast hash join with zero target shuffle."""
    _require_mor(table)
    n_src = source.count()
    if n_src > MAX_UPDATE_SOURCE_ROWS:
        raise ValueError(f"UPDATE…FROM source too large: {n_src} > {MAX_UPDATE_SOURCE_ROWS}")
    target = _resolve(table, predicate, project_id, ts_lo, ts_hi).alias("_tgt")
    src = F.broadcast(source.alias("_src"))
    cond = None
    for k in join_keys:
        c = F.col(f"_tgt.{k}") == F.col(f"_src.{k}")
        cond = c if cond is None else (cond & c)
    joined = target.join(src, cond, "inner")
    # Select assignment expressions against the joined frame so `_src.`
    # references resolve; untouched columns pass through from the target.
    new_versions = joined.select(
        *[
            F.col(f"_tgt.{f.name}").alias(f.name)
            if f.name not in assignments
            else assignments[f.name].alias(f.name)
            for f in table.schema.fields
        ]
    )
    return _count_and_append(table, new_versions, stamp)
