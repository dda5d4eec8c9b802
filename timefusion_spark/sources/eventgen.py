"""Custom Python DataSource: a deterministic synthetic event generator
(batch + micro-batch streaming) — the engine's "source connector" surface.

Reference analog: the gRPC Arrow-IPC ingest entry point
(/root/reference/src/grpc_handlers.rs:1-33, proto/timefusion.proto:12-33) —
an external feed that is NOT a file on disk. Spark 4's Python DataSource
API is the idiomatic way to mount such a feed: the source declares a
schema, partitions itself, and each partition generates/fetches rows
worker-side (never through the driver).

The row function is pure integer arithmetic on `event_id`, so the exact
output is reproducible in closed form by any engine (the DuckDB oracle
rebuilds it with generate_series) — the source itself is oracle-checkable.

Scale shape: `numPartitions` input partitions generate independently (a
real connector would hold one shard/subscription per partition); the
streaming reader advances a monotone row-index offset per micro-batch, so
checkpoint recovery replays exactly the uncommitted index range
(at-least-once from the source, exactly-once visibility through the
engine's LWW dedup keys, as with any ingest path).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)
TYPES = ["click", "view", "purchase", "error"]
SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


def row_for(i: int) -> tuple:
    """Deterministic event row for index i (pure closed-form arithmetic —
    mirrored by the oracle's generate_series expression)."""
    return (
        i,
        EPOCH + dt.timedelta(seconds=i),
        (i * 37 + 11) % 100,
        TYPES[i % 4],
        ((i * 2654435761) % 1_000_000) / 1000.0,
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("numPartitions", 4))

    def partitions(self):
        if self.n <= 0:
            return [_Range(0, 0)]  # n=0: empty frame, not range(0,0,0)
        step = -(-self.n // self.parts)
        return [
            _Range(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield row_for(i)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.total = int(options.get("n", 1000))
        self.per_batch = int(options.get("rowsPerBatch", 250))
        self.parts = int(options.get("numPartitions", 4))

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        # A real connector asks the feed for its head (an ABSOLUTE
        # position); this generator's per-instance counter restarts at 0
        # with the process, so after a checkpoint restart it could hand
        # Spark an offset BELOW the committed one and re-emit committed
        # rows (review r11). `_floor` — the highest offset this instance
        # has seen planned or committed — makes the head monotone again;
        # partitions() additionally clamps its low edge to the floor so
        # a transient backward offset in the log never replays rows.
        #
        # Restart safety (ADVICE r11 #4, verified live on Spark 4.1.2):
        # a checkpoint restart ALWAYS re-plans the restored batch first —
        # partitions(restored_start, restored_end) runs BEFORE the first
        # latestOffset and seeds _floor with the committed position — so
        # no poll on the fresh instance can log a regressed offset.
        # Resuming the head FROM the floor (not 0) removes even the
        # cosmetic sub-floor heads: the first post-restart poll advances
        # straight to floor + per_batch instead of stalling per_batch-at-
        # a-time until the counter catches up.
        if not hasattr(self, "_head"):
            self._head = 0
        self._head = max(self._head, getattr(self, "_floor", 0))
        self._head = min(self._head + self.per_batch, self.total)
        return {"index": max(self._head, getattr(self, "_floor", 0))}

    def partitions(self, start, end):
        lo, hi = start["index"], end["index"]
        lo = max(lo, min(hi, getattr(self, "_floor", 0)))
        self._floor = max(getattr(self, "_floor", 0), lo, hi)
        if hi <= lo:
            return [_Range(lo, lo)]
        step = -(-(hi - lo) // self.parts)
        return [_Range(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield row_for(i)

    def commit(self, end):
        self._floor = max(getattr(self, "_floor", 0), end["index"])


class EventGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return _Reader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def register_sources(spark) -> None:
    """Idempotently register the engine's Python data sources."""
    from timefusion_spark.sources.changefeed import ChangeFeedDataSource

    spark.dataSource.register(EventGenDataSource)
    spark.dataSource.register(ChangeFeedDataSource)
