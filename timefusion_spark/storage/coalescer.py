"""Deferred, batched UPDATE…FROM legs — the DML coalescer.

The reference batches high-rate enrichment DML (dml_coalescer.rs:1-36:
~1.4k UPDATE…FROM statements/hour would otherwise each pay a full
copy-on-write parquet rewrite and starve OPTIMIZE via OCC conflicts).
Statements coalesce when (table, join keys, assignments, residual
predicate, source schema) all match; per-statement timestamp-range
conjuncts widen to the union window; same-key source rows with different
payloads cannot share one merge (duplicate source matches are forbidden —
`dml.update_from` raises), so a drained group splits into ordered ROUNDS:
round N holds each key's Nth occurrence, applied in submission order.

A group that exhausts MAX_DRAIN_ATTEMPTS is PARKED, not dropped
(dml_coalescer.rs:28-36: the Delta leg targets rows already flushed, so
there is no newer copy to converge from): its source rows land under
`<table>/_tf_quarantine/dml/<gid>/` as parquet + a JSON meta sidecar, and
`redrive()` (main.rs:155-174 `timefusion redrive-dml`) replays them.

Scale shape: the win is O(statements) → O(groups) partition rewrites.
Each drained group runs ONE `dml.update_from` per round — broadcast
source, affected-partition-only rewrite — so a thousand single-row
enrichment statements against one hot partition become one bounded merge
instead of a thousand commits. Sources stay under
`dml.MAX_UPDATE_SOURCE_ROWS` by chunking rounds (dml_coalescer.rs:80-84:
an unbounded merged group is how the reference once lost a 1.25M-row
drain)."""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timefusion_spark.storage import dml
from timefusion_spark.storage.table import Table

QUARANTINE_DIR = "_tf_quarantine/dml"
MAX_DRAIN_ATTEMPTS = 3


@dataclass
class _Statement:
    seq: int
    source: DataFrame
    ts_lo: str | None
    ts_hi: str | None


@dataclass
class _Group:
    table: Table
    join_keys: tuple[str, ...]
    assignments: dict[str, str]
    predicate: str | None
    project_id: str | None
    statements: list[_Statement] = field(default_factory=list)
    # rounds [1, done_rounds] have COMMITTED — a retry or quarantine
    # resumes AFTER them: re-applying a committed round would run its
    # (non-idempotent) assignments twice (review r10)
    done_rounds: int = 0
    # the checkpointed merged frame from the last _drain_group, reused by
    # _quarantine so a park doesn't recompute the union (review r13)
    merged_cache: DataFrame | None = None


def _group_key(table: Table, join_keys, assignments, predicate, project_id, src_schema):
    return (
        table.path,
        tuple(join_keys),
        tuple(sorted(assignments.items())),
        predicate,
        project_id,
        src_schema,
    )


class DmlCoalescer:
    """Queue UPDATE…FROM statements; `drain()` executes them as coalesced
    groups. Assignments and predicates are SQL STRINGS (evaluated against
    the merge frame with `_tgt`/`_src` aliases, exactly as
    `dml.update_from` does) so parked groups serialize losslessly to the
    quarantine manifest and redrive."""

    def __init__(self, max_drain_attempts: int = MAX_DRAIN_ATTEMPTS):
        self.max_drain_attempts = max_drain_attempts
        self._groups: dict[tuple, _Group] = {}
        self._seq = 0

    def enqueue(
        self,
        table: Table,
        source: DataFrame,
        join_keys: list[str],
        assignments: dict[str, str],
        predicate: str | None = None,
        project_id: str | None = None,
        ts_lo: str | None = None,
        ts_hi: str | None = None,
    ) -> None:
        for name, expr in assignments.items():
            if not isinstance(expr, str):
                raise TypeError(
                    f"coalesced assignment '{name}' must be a SQL string "
                    "(quarantined groups must serialize losslessly)"
                )
        # predicate and bounds carry the same lossless-serialization
        # contract: a datetime/Column here is accepted at enqueue but then
        # breaks BOTH drain (unparseable window) and quarantine (meta.json
        # can't serialize it), wedging the group in memory (review r13)
        if predicate is not None and not isinstance(predicate, str):
            raise TypeError("coalesced predicate must be a SQL string or None")
        for label, v in (("ts_lo", ts_lo), ("ts_hi", ts_hi)):
            if v is not None and not isinstance(v, str):
                raise TypeError(
                    f"coalesced {label} must be a timestamp STRING or None"
                )
        key = _group_key(
            table, join_keys, assignments, predicate, project_id,
            source.schema.simpleString(),
        )
        g = self._groups.get(key)
        if g is None:
            g = self._groups[key] = _Group(
                table, tuple(join_keys), dict(assignments), predicate, project_id
            )
        self._seq += 1
        g.statements.append(_Statement(self._seq, source, ts_lo, ts_hi))

    def pending(self) -> int:
        return sum(len(g.statements) for g in self._groups.values())

    def drain(self) -> dict:
        """Execute every queued group; returns drain statistics. A group
        that fails `max_drain_attempts` times parks in the table's
        quarantine directory instead of being dropped."""
        stats = {
            "groups": len(self._groups),
            "statements": self.pending(),
            "rows_updated": 0,
            "rounds": 0,
            "quarantined": 0,
        }
        # pop each group BEFORE processing: a failure while PARKING one
        # group must never leave already-drained groups queued for a
        # re-apply on the caller's retry (review r10)
        for key in list(self._groups):
            g = self._groups.pop(key)
            try:
                # stats update per COMMITTED round inside _drain_group: a
                # park/requeue after partial progress must not report the
                # already-written rows as 0, and a resumed group counts
                # only the rounds it actually ran (review r13)
                self._drain_group(g, stats)
            except Exception as e:  # park after exhausted attempts
                try:
                    _quarantine(g, str(e))
                    stats["quarantined"] += 1
                except Exception:
                    # parking itself failed: re-queue (done_rounds marks
                    # the committed progress, so a later drain resumes
                    # after it) rather than dropping unconverged rows.
                    # SEAL the re-queued group under a unique key: a later
                    # enqueue matching the ORIGINAL key must start a fresh
                    # group — appending here would give any NEW join keys
                    # round numbers <= done_rounds, which _drain_group has
                    # already advanced past, silently skipping their rows
                    # (ADVICE r10)
                    self._groups[key + (("__requeued__", uuid.uuid4().hex),)] = g
                    raise
        return stats

    def _drain_group(self, g: _Group, stats: dict) -> None:
        """Apply the group's rounds IN ORDER with per-round progress:
        each committed round advances `g.done_rounds`, so the in-loop
        retries — and any later redrive of a parked group — resume at
        the first UNAPPLIED round instead of re-running committed
        (non-idempotent) assignments (review r10)."""
        # stash the checkpointed frame on the group so a park after a
        # failure reuses it instead of recomputing the whole union a
        # third time (review r13 round-diff)
        merged = g.merged_cache = _merge_sources(g)
        rounds, max_dup = _round_plan(merged)
        _require_no_intra_statement_dups(max_dup)
        attempts = 0
        idx = 0
        while idx < len(rounds):
            r = rounds[idx]
            if r <= g.done_rounds:
                idx += 1
                continue
            try:
                stats["rows_updated"] += _apply_round(g, merged, r)
                g.done_rounds = r
                idx += 1
                stats["rounds"] += 1
            except Exception:
                attempts += 1
                if attempts >= self.max_drain_attempts:
                    raise


def _merge_sources(g: _Group) -> DataFrame:
    """Union the group's sources tagged with submission order, then assign
    each row its per-key occurrence ROUND (row_number over the join keys,
    ordered by submission) — round N of the drained group holds each
    key's Nth payload, so every round's source has unique keys."""
    parts = []
    for st in g.statements:
        parts.append(st.source.withColumn("_tf_seq", F.lit(st.seq)))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return _with_rounds(merged, list(g.join_keys))


def _with_rounds(merged: DataFrame, join_keys: list[str]) -> DataFrame:
    """Assign `_tf_round` (and the `_tf_dup` intra-statement duplicate
    probe) to a `_tf_seq`-tagged union — shared by drain and redrive so
    both number rounds identically.

    Rounds larger than `dml.MAX_UPDATE_SOURCE_ROWS` are CHUNKED (the
    module contract: an unbounded merged group is how the reference once
    lost a 1.25M-row drain — without this, a group with >1M distinct keys
    could never converge and would park/redrive-fail forever, review
    r13): each oversize occurrence-round splits into C = ceil(max round
    size / cap) subrounds via ntile over a total deterministic order, and
    round numbers renumber as (round-1)*C + subround. Keys within one
    subround stay unique (a subround is a subset of a unique-key round)
    and a key's Nth occurrence still applies before its (N+1)th (all of
    round N's subrounds precede round N+1's). The renumbering is
    deterministic for fixed input, so per-round resume (done_rounds)
    stays coherent across drain retries, quarantine and redrive."""
    w = Window.partitionBy(*[F.col(k) for k in join_keys]).orderBy(F.col("_tf_seq"))
    # _tf_dup detects same-key rows WITHIN one statement (same _tf_seq):
    # their round assignment would be an arbitrary tiebreak, so
    # _drain_group AND redrive raise on max(_tf_dup) > 1 (review r13)
    w_dup = Window.partitionBy(
        *[F.col(k) for k in join_keys], F.col("_tf_seq")
    ).orderBy(F.lit(1))
    # ONE materialization, BEFORE the round-size count: the plan is
    # consumed by that count, the round listing, every round's filter and
    # each of update_from's actions — uncached it re-read every source
    # per action, and window re-evaluation could re-break row_number ties
    # between actions (review r13)
    merged = (
        merged.withColumn("_tf_round", F.row_number().over(w))
        .withColumn("_tf_dup", F.row_number().over(w_dup))
        .localCheckpoint(eager=True)
    )
    max_n = (
        merged.groupBy("_tf_round")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n"))
        .collect()[0][0]
        or 0
    )
    cap = dml.MAX_UPDATE_SOURCE_ROWS
    if max_n > cap:
        n_chunks = -(-max_n // cap)
        w_sub = Window.partitionBy("_tf_round").orderBy(
            F.hash(*[F.col(k) for k in join_keys]),
            *[F.col(k) for k in join_keys],
        )
        merged = merged.withColumn(
            "_tf_round",
            (F.col("_tf_round") - 1) * n_chunks + F.ntile(n_chunks).over(w_sub),
        )
    return merged


def _round_plan(merged: DataFrame) -> tuple[list[int], int]:
    """One job over the checkpointed merged frame: the sorted list of
    round numbers ACTUALLY PRESENT plus the max intra-statement duplicate
    count. Iterating present rounds (not 1..max) matters after chunk
    renumbering: later occurrence-rounds are smaller than round 1 (a key
    in round r+1 is also in round r), so most of their renumbered ntile
    slots are empty — a dense 1..max loop would pay a no-op update_from
    (count + distinct-count jobs) per empty slot (review r13)."""
    rows = merged.groupBy("_tf_round").agg(F.max("_tf_dup").alias("_d")).collect()
    rounds = sorted(int(r["_tf_round"]) for r in rows)
    max_dup = max((int(r["_d"]) for r in rows), default=0)
    return rounds, max_dup


def _require_no_intra_statement_dups(max_dup: int) -> None:
    """Mirror dml.update_from's loud duplicate-keys raise: same-key rows
    WITHIN one statement have no defined submission order, so round
    assignment would be an arbitrary tiebreak. drain() parks the group
    with this error; redrive REFUSES to replay such a parked group for
    the same reason (review r13 round-diff: redrive used to bypass the
    guard and apply an arbitrary payload order on the recovery path)."""
    if max_dup > 1:
        raise ValueError(
            "coalesced statement has duplicate join keys within a "
            "single source (dml.update_from would raise; refusing to "
            "apply an arbitrary payload order)"
        )


def _widened_window(g: _Group) -> tuple[str | None, str | None]:
    """Union of the statements' time windows (dml_coalescer.rs: timestamp
    conjuncts widen to the covering range; any unbounded statement makes
    the group unbounded). Bounds compare as PARSED datetimes, not strings:
    two renderings of one instant ('2024-01-02' vs '2024-01-02 00:00:00')
    or a non-zero-padded literal would mis-order lexicographically, and a
    window that NARROWS silently drops rows from the mutation (widening
    too far is merely slower — never wrong). Any unparseable literal
    makes the group unbounded, same decline-on-doubt direction."""
    import datetime as _dt

    def _parse(v: str) -> "_dt.datetime | None":
        try:
            parsed = _dt.datetime.fromisoformat(v)
        except ValueError:
            return None
        # normalize tz-aware bounds to naive UTC: a group mixing
        # '… 00:00:00' and '… 00:00:00+00:00' must compare, not raise
        # (aware vs naive datetimes are unorderable in Python)
        if parsed.tzinfo is not None:
            parsed = parsed.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return parsed

    los = [st.ts_lo for st in g.statements]
    his = [st.ts_hi for st in g.statements]
    lo = hi = None
    if not any(v is None for v in los):
        parsed = [(_parse(v), v) for v in los]
        lo = None if any(p is None for p, _ in parsed) else min(parsed)[1]
    if not any(v is None for v in his):
        parsed = [(_parse(v), v) for v in his]
        hi = None if any(p is None for p, _ in parsed) else max(parsed)[1]
    return lo, hi


def _apply_round(g: _Group, merged: DataFrame, r: int) -> int:
    """Commit ONE round of the group (each round's source has unique
    keys by construction — see _merge_sources)."""
    ts_lo, ts_hi = _widened_window(g)
    src = merged.where(F.col("_tf_round") == r).drop(
        "_tf_seq", "_tf_round", "_tf_dup"
    )
    return dml.update_from(
        g.table,
        src,
        list(g.join_keys),
        {name: F.expr(expr) for name, expr in g.assignments.items()},
        predicate=g.predicate,
        project_id=g.project_id,
        ts_lo=ts_lo,
        ts_hi=ts_hi,
    )


def _quarantine(g: _Group, error: str) -> None:
    """Park the group under <table>/_tf_quarantine/dml/<gid>/: source rows
    as parquet (submission order preserved in _tf_seq), statement
    metadata as JSON. Parking is the no-loss path — these rows have no
    newer copy anywhere to converge from."""
    gid = uuid.uuid4().hex
    qdir = os.path.join(g.table.path, QUARANTINE_DIR, gid)
    os.makedirs(qdir, exist_ok=True)
    # park only the UNAPPLIED remainder: rounds <= done_rounds committed
    # before the failure, and redriving them would re-run their
    # non-idempotent assignments (review r10)
    merged = (
        (g.merged_cache if g.merged_cache is not None else _merge_sources(g))
        .where(F.col("_tf_round") > g.done_rounds)
        .drop("_tf_round", "_tf_dup")
    )
    merged.write.mode("overwrite").parquet(os.path.join(qdir, "source"))
    ts_lo, ts_hi = _widened_window(g)
    meta = {
        "table_path": g.table.path,
        "join_keys": list(g.join_keys),
        "assignments": g.assignments,
        "predicate": g.predicate,
        "project_id": g.project_id,
        "ts_lo": ts_lo,
        "ts_hi": ts_hi,
        "error": error,
        "attempts": 0,
    }
    tmp = os.path.join(qdir, ".meta.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(qdir, "meta.json"))


def redrive(table: Table, dry_run: bool = False, max_attempts: int | None = None) -> tuple[int, int]:
    """Replay parked DML groups (main.rs:155-174 `timefusion redrive-dml
    [--dry-run]`): returns (recovered, left_parked). Each group re-runs
    through the same round-split merge path; success removes its
    quarantine entry, failure increments the attempt counter and leaves
    it parked."""
    qroot = os.path.join(table.path, QUARANTINE_DIR)
    if not os.path.isdir(qroot):
        return 0, 0
    ok = left = 0
    for gid in sorted(os.listdir(qroot)):
        qdir = os.path.join(qroot, gid)
        meta_path = os.path.join(qdir, "meta.json")
        if not os.path.isfile(meta_path):
            continue
        with open(meta_path) as fh:
            meta = json.load(fh)
        if dry_run:
            left += 1
            continue
        if meta.get("exhausted"):
            # max_attempts was reached on a previous redrive: retrying the
            # identical group forever is pointless churn — it stays parked
            # (and counted) until an operator clears the flag or removes
            # the entry (review r13: the flag was written but never read)
            left += 1
            continue
        try:
            merged = table.spark.read.parquet(os.path.join(qdir, "source"))
            merged = _with_rounds(merged, list(meta["join_keys"]))
            g = _Group(
                table,
                tuple(meta["join_keys"]),
                dict(meta["assignments"]),
                meta["predicate"],
                meta["project_id"],
                statements=[_Statement(0, merged, meta["ts_lo"], meta["ts_hi"])],
                done_rounds=int(meta.get("done_rounds", 0)),
            )
            rounds, max_dup = _round_plan(merged)
            _require_no_intra_statement_dups(max_dup)
            # per-round progress persists to meta.json after EACH commit:
            # a redrive that fails mid-group resumes at the first
            # unapplied round next time (review r10)
            for r in rounds:
                if r <= g.done_rounds:
                    continue
                _apply_round(g, merged, r)
                g.done_rounds = r
                meta["done_rounds"] = r
                with open(meta_path, "w") as fh:
                    json.dump(meta, fh)
            shutil.rmtree(qdir, ignore_errors=True)
            ok += 1
        except Exception as e:
            meta["attempts"] = int(meta.get("attempts", 0)) + 1
            meta["error"] = str(e)
            if max_attempts is not None and meta["attempts"] >= max_attempts:
                meta["exhausted"] = True
            with open(meta_path, "w") as fh:
                json.dump(meta, fh)
            left += 1
    return ok, left
