"""Lightweight metrics/observability for the framework's drivers.

The reference library has no observability surface (SURVEY.md §5 — it is a
pure `no_std` crate); this module is the rebuild's counterpart for the
layers that do real work at scale: counters for permutations executed,
field elements absorbed, Merkle levels built, and wall-clock split between
compute and collectives in sharded builds.

Design: a process-global registry of monotonic counters + timers, zero
overhead when disabled (the default). Drivers call `count()`/`timer()`
unconditionally; both no-op unless `enable()` was called. Values are host
side bookkeeping only — nothing here touches the traced compute path.

Caveat: counts must be placed OUTSIDE jit/scan/shard_map (a count inside a
traced function fires once at trace time and never on cached executions).
The drivers place them at host-level call sites; if a caller jits a whole
driver function (e.g. wraps sponge_hash in jax.jit), the counters reflect
traces, not executions.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

_enabled = False
_counters: dict[str, int] = defaultdict(int)
_timers: dict[str, float] = defaultdict(float)


def enable() -> None:
    global _enabled
    _enabled = True


def disable() -> None:
    global _enabled
    _enabled = False


def reset() -> None:
    _counters.clear()
    _timers.clear()


def count(name: str, n: int = 1) -> None:
    """Increment a monotonic counter (no-op unless enabled)."""
    if _enabled:
        _counters[name] += int(n)


@contextmanager
def timer(name: str):
    """Accumulate wall-clock seconds under `name` (no-op unless enabled).

    Note: kernel launches are asynchronous; wrap a block that includes a
    sync (e.g. block_until_ready) for meaningful compute timings.
    """
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _timers[name] += time.perf_counter() - t0


def snapshot() -> dict[str, dict[str, float]]:
    """Current counters + timers (copies)."""
    return {"counters": dict(_counters), "timers": dict(_timers)}


def report() -> str:
    """Human-readable one-liner per metric."""
    lines = []
    for k in sorted(_counters):
        lines.append(f"{k}: {_counters[k]}")
    for k in sorted(_timers):
        lines.append(f"{k}: {_timers[k]:.6f}s")
    return "\n".join(lines)
