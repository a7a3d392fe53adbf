"""Pure-JAX reference Hades252 permutation — the bit-exact oracle.

Implements the reference round schedule (reference: src/strategies.rs:140-157
`perm`: 4 full rounds, 59 partial rounds, 4 full rounds) on limbed field
elements from `field.py`. This backend is the correctness anchor: it runs on
CPU or TPU under plain XLA, is shape-polymorphic over leading batch axes, and
every faster backend (the fused Pallas kernel) is tested against it.

Semantics matched to the reference:
  * ARK adds a constant to ALL five words in every round, partial rounds
    included (reference: src/strategies.rs:86,111; src/strategies/scalar.rs:27-29).
  * Full round: quintic S-box on all words (src/strategies.rs:115).
  * Partial round: quintic S-box on the LAST word only (src/strategies.rs:83,89).
  * Mix layer: 5x5 MDS matrix-vector product (src/strategies/scalar.rs:36-49).
  * The constants iterator restarts at 0 each permutation and consumes
    exactly 335 of the 960 constants (src/strategies.rs:141; SURVEY.md §2.3).

State layout: (..., WIDTH, N_DIGITS) uint32 canonical digits. Internally the
state lives in the Montgomery domain; constants are pre-converted at load
(params.perm_constants_np), so the only domain conversions are one to_mont /
from_mont per word per call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import field
from ..params import (
    N_DIGITS,
    PARTIAL_ROUNDS,
    TOTAL_FULL_ROUNDS,
    WIDTH,
    perm_constants_np,
)


def _ark(state: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """Add round keys to every word (reference: scalar.rs:23-30)."""
    return field.add_mod(state, consts)


def _mds(state: jnp.ndarray) -> jnp.ndarray:
    """MDS matrix-vector product over the field (reference: scalar.rs:36-49).

    state: (..., WIDTH, N_DIGITS) in Montgomery domain.
    """
    mds = jnp.asarray(perm_constants_np()["mds_mont"])  # (W, W, D) Montgomery
    # prods[..., k, j, :] = mds[k, j] * state[j]   (Montgomery product)
    prods = field.mont_mul(mds, state[..., None, :, :])
    # Fold j with modular adds; fixed reduction order (j ascending) so every
    # backend and mesh shape produces bit-identical intermediate values.
    acc = prods[..., 0, :]
    for j in range(1, WIDTH):
        acc = field.add_mod(acc, prods[..., j, :])
    return acc


def _full_round(state: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """ARK -> S-box on all words -> MDS (reference: strategies.rs:107-119)."""
    state = _ark(state, consts)
    state = field.quintic_sbox_mont(state)
    return _mds(state)


def _partial_round(state: jnp.ndarray, consts: jnp.ndarray) -> jnp.ndarray:
    """ARK -> S-box on last word -> MDS (reference: strategies.rs:79-93)."""
    state = _ark(state, consts)
    last = field.quintic_sbox_mont(state[..., WIDTH - 1, :])
    state = state.at[..., WIDTH - 1, :].set(last)
    return _mds(state)


@jax.jit
def permute_mont(state: jnp.ndarray) -> jnp.ndarray:
    """The 67-round Hades252 permutation on Montgomery-domain state.

    state: (..., WIDTH, N_DIGITS) uint32, each word < p, Montgomery form.
    """
    if state.shape[-2:] != (WIDTH, N_DIGITS):
        raise ValueError(f"state must be (..., {WIDTH}, {N_DIGITS}), got {state.shape}")
    consts = perm_constants_np()
    ark = jnp.asarray(consts["ark_mont"])  # (ROUNDS, WIDTH, N_DIGITS)
    half = TOTAL_FULL_ROUNDS // 2

    def full_body(s, c):
        return _full_round(s, c), None

    def partial_body(s, c):
        return _partial_round(s, c), None

    state, _ = jax.lax.scan(full_body, state, ark[:half])
    state, _ = jax.lax.scan(partial_body, state, ark[half : half + PARTIAL_ROUNDS])
    state, _ = jax.lax.scan(full_body, state, ark[half + PARTIAL_ROUNDS :])
    return state


@jax.jit
def permute(state: jnp.ndarray) -> jnp.ndarray:
    """Hades252 permutation on canonical-digit state.

    Drop-in equivalent of the reference `ScalarStrategy::perm`
    (src/strategies.rs:140-157) but batched: state is
    (..., WIDTH, N_DIGITS) uint32 canonical digits, returned likewise.
    """
    return field.from_mont(permute_mont(field.to_mont(state)))
