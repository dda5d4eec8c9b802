"""Frozen-clock facility for deterministic version stamps.

Reference: src/clock.rs + functions.rs:505-535 — `timefusion_set_clock`
(freeze at an RFC-3339 instant), `timefusion_advance_clock` (step the
frozen clock by µs), `timefusion_now_micros` (frozen-or-wall read). The
reference uses it so tests and replays produce identical engine-owned
tiebreak stamps; here the same facility feeds `Table.stamp_version`'s
default, so an unstamped append/DML is reproducible whenever the clock
is frozen (and exactly wall-clock otherwise).

State is process-local by design: stamps are driver-side literals (the
stamp column is a constant per batch), so executors never read the clock.
"""

from __future__ import annotations

import datetime as _dt

_frozen_us: int | None = None


def set_micros(us: int) -> int:
    """Freeze the clock at `us` microseconds since the epoch (UTC)."""
    global _frozen_us
    _frozen_us = int(us)
    return _frozen_us


def set_rfc3339(s: str) -> int:
    """Freeze at an RFC-3339 / ISO-8601 instant (timefusion_set_clock)."""
    d = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return set_micros(int(d.timestamp() * 1_000_000))


def advance_micros(delta: int) -> int:
    """Step the frozen clock forward (timefusion_advance_clock); requires
    a frozen clock — advancing wall time is meaningless."""
    global _frozen_us
    if _frozen_us is None:
        raise RuntimeError("clock is not frozen; call set_micros/set_rfc3339 first")
    _frozen_us += int(delta)
    return _frozen_us


def now_micros() -> int:
    """Frozen value if set, else wall clock (timefusion_now_micros)."""
    if _frozen_us is not None:
        return _frozen_us
    return int(_dt.datetime.now(_dt.timezone.utc).timestamp() * 1_000_000)


def is_frozen() -> bool:
    return _frozen_us is not None


def clear() -> None:
    """Return to wall clock."""
    global _frozen_us
    _frozen_us = None
