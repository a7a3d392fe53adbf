"""Compute ops: the permutation backends.

`make_perm_mont_fn` is the seam the model drivers (sponge, Merkle) build on:
a function (B, WIDTH, N_DIGITS) Montgomery-domain state -> permuted state,
with backend-pluggability mirroring the reference's Strategy trait split
(reference: src/strategies.rs:31 — one schedule, N backends).
"""

from __future__ import annotations

from .perm_ref import permute, permute_mont  # noqa: F401


def default_perm_mont_fn():
    """The Montgomery-domain permutation the model drivers should use when
    none is passed: the fused Pallas kernel on TPU, the pure-JAX oracle
    elsewhere (bit-identical either way)."""
    import jax

    if jax.default_backend() == "tpu":
        from .perm_pallas import permute_pallas_mont

        return permute_pallas_mont
    return permute_mont


def make_perm_mont_fn(backend: str = "ref", *, block: int = 1024,
                      interpret: bool = False, emulate: bool = False):
    """Return a Montgomery-domain batched permutation callable.

    backend "ref": pure-JAX oracle (runs on any platform).
    backend "pallas": fused TPU kernel (emulate=True runs the kernel body as
    a plain XLA function for CPU testing; interpret=True is Mosaic interpret
    mode, too slow for CI).
    """
    if backend == "ref":
        return permute_mont
    if backend == "pallas":
        from .perm_pallas import permute_pallas_mont

        def fn(x):
            return permute_pallas_mont(x, block=block, interpret=interpret,
                                       emulate=emulate)

        return fn
    raise ValueError(f"unknown backend: {backend}")
