"""Profiling helpers: roofline accounting and jax.profiler trace capture.

SURVEY.md §5 (tracing/profiling): the reference ships no timers or benches;
the rebuild reports permutations/sec/chip and the position against the
field-multiplication roofline. The permutation's work is fixed by the
algorithm (reference: src/strategies.rs:140-157 + scalar.rs:32-49):

    field muls / permutation = 1972  (297 S-box + 1675 MDS)

With the optimized schedules fewer *machine* multiplies are executed
(sparse partial rounds, MXU constant products), but the roofline metric is
defined against the algorithmic 1972 so numbers stay comparable across
backends and to any external implementation.
"""

from __future__ import annotations

import contextlib

#: Algorithmic field multiplications per permutation (SURVEY.md §3.1)
MULS_PER_PERM = 1972


def roofline_report(perms_per_sec: float) -> dict[str, float]:
    """Throughput -> derived roofline numbers.

    Returns field muls/sec and the per-mul wall time in ns — the honest
    hardware-independent way to compare against other 255-bit Montgomery
    multiply implementations.
    """
    muls_per_sec = perms_per_sec * MULS_PER_PERM
    return {
        "perms_per_sec": float(perms_per_sec),
        "field_muls_per_sec": muls_per_sec,
        "ns_per_field_mul": 1e9 / muls_per_sec if muls_per_sec else float("inf"),
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block (view with TensorBoard
    or Perfetto). Degrades to a no-op where the backend can't profile
    (e.g. relayed TPU plugins)."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
