"""Batched device NTT (ops/ntt.py): bit-exactness against the host oracle.

The contract that makes prover_tpu's proofs bit-identical to plonk.prove:
every transform here must equal plonk.ntt / plonk._coset_eval /
plonk._coset_interp element-for-element.
"""

import numpy as np
import jax.numpy as jnp

from hades252_tpu import plonk
from hades252_tpu.ops import ntt
from hades252_tpu.params import P
from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits


def _rows(rng, b, n):
    return [
        [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
        for _ in range(b)
    ]


def _as_ints(arr):
    return [[int(v) for v in row] for row in digits_to_ints(np.asarray(arr))]


def test_ntt_matches_host(rng):
    rows = _rows(rng, 3, 16)
    x = jnp.asarray(ints_to_digits(rows, shape=(3, 16)))
    fwd = _as_ints(ntt.ntt_batched(x))
    inv = _as_ints(ntt.ntt_batched(x, invert=True))
    for b in range(3):
        assert fwd[b] == plonk.ntt(rows[b])
        assert inv[b] == plonk.ntt(rows[b], invert=True)


def test_ntt_roundtrip(rng):
    rows = _rows(rng, 2, 32)
    x = jnp.asarray(ints_to_digits(rows, shape=(2, 32)))
    back = _as_ints(ntt.ntt_batched(ntt.ntt_batched(x), invert=True))
    assert back == rows


def test_coset_eval_interp_match_host(rng):
    rows = _rows(rng, 2, 16)
    x = jnp.asarray(ints_to_digits(rows, shape=(2, 16)))
    ev = ntt.coset_eval_batched(x, 7)
    for b, row in enumerate(_as_ints(ev)):
        assert row == plonk._coset_eval(rows[b], 16, 7)
    back = _as_ints(ntt.coset_interp_batched(ev, 7))
    assert back == rows


def test_leading_batch_axes(rng):
    # (B, C, N, D) — the prover's wire-column shape
    rows = _rows(rng, 4, 16)
    x = jnp.asarray(ints_to_digits(rows, shape=(4, 16))).reshape(2, 2, 16, 16)
    out = ntt.ntt_batched(x).reshape(4, 16, 16)
    for b in range(4):
        assert _as_ints(out[b : b + 1])[0] == plonk.ntt(rows[b])
