"""Bounded reads of Observation metrics.

PySpark's ``Observation.get`` blocks INDEFINITELY waiting for metrics.
When the optimizer eliminates the CollectMetrics node — AQE's
empty-relation propagation replaces a runtime-empty subtree with a
LocalRelation before the node can report — no metrics ever arrive and
``.get`` hangs the caller; an ``except Exception`` around it can never
trigger on that failure mode (ADVICE r13). The JVM-side
``Observation.getOrEmpty`` instead waits up to ~100 ms and returns an
empty map when nothing was observed yet, so a caller that has ALREADY
run the observed action can poll it briefly and fall back to an explicit
recount when no metrics arrive.
"""

from __future__ import annotations

from typing import Callable


def observed_count(
    obs, key: str, fallback: Callable[[], int], timeout_s: float = 10.0
) -> int:
    """One numeric metric from `obs` with a BOUNDED wait, else `fallback()`.

    Call only AFTER the observed DataFrame's action has completed:
    metrics then either arrive within listener-delivery latency (ms) or
    never (CollectMetrics eliminated), so the deadline is a grace period,
    not a wait-for-the-job. A NULL metric (e.g. sum over zero rows) reads
    as 0. py4j/listener failures take the fallback too — never guess."""
    import time as _t

    deadline = _t.monotonic() + timeout_s
    try:
        jo = obs._jo
        while jo is not None and _t.monotonic() < deadline:
            # getOrEmpty blocks <=100 ms JVM-side when still empty — the
            # loop is a 100 ms-granularity poll, not a busy spin
            if not jo.getOrEmpty().isEmpty():
                v = obs.get[key]
                return 0 if v is None else int(v)
    except Exception:  # noqa: BLE001 — fall back to the recount
        pass
    return int(fallback())
