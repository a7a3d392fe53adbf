"""Randomized cross-backend differential fuzzing (SURVEY.md §4 item c,
widened): every execution backend must agree with an independent
plain-Python int model on random states, including adversarial values
near the modulus.

Backends crossed here: the plain-int oracle (no library field code), the
native C++ engine (4x u64 Montgomery CIOS), and the Pallas kernel body in
numpy emulation (the exact TPU code object, default mxu8 schedule). The
pure-JAX oracle is crossed against these in test_perm_ref/test_perm_pallas.
"""

import numpy as np
import pytest

from hades252_tpu import params
from hades252_tpu.ops.perm_pallas import permute_pallas
from hades252_tpu.utils import native
from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits

P = params.P


def _int_perm(state):
    ark = params.round_constants_int()
    mds = params.mds_matrix_int()
    s = list(state)
    for r in range(67):
        s = [(w + ark[r * 5 + k]) % P for k, w in enumerate(s)]
        if r < 4 or r >= 63:
            s = [pow(w, 5, P) for w in s]
        else:
            s[4] = pow(s[4], 5, P)
        s = [sum(mds[k][j] * s[j] for j in range(5)) % P for k in range(5)]
    return s


def _fuzz_states(rng, n):
    """Random states biased toward carry/borrow edge cases."""
    out = []
    edge = [0, 1, 2, P - 1, P - 2, (1 << 255) % P, P // 2, 0xFFFF, 1 << 16]
    for i in range(n):
        if i % 4 == 0:
            out.append([edge[(i + k) % len(edge)] for k in range(5)])
        else:
            out.append(
                [int.from_bytes(rng.bytes(40), "little") % P for _ in range(5)]
            )
    return out


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_vs_int_oracle_fuzz(rng):
    # the native engine is fast: cross a larger sample against plain ints
    states = _fuzz_states(rng, 200)
    x = ints_to_digits(states, shape=(200, 5))
    out = native.perm_batch_digits(x)
    for i in (0, 1, 2, 3, 50, 100, 150, 199):  # spot-check int model (slow)
        got = [int(v) for v in digits_to_ints(out[i])]
        assert got == _int_perm(states[i]), f"state {i}"
    # determinism + input sensitivity (reference hades_det semantics)
    out2 = native.perm_batch_digits(x)
    assert np.array_equal(out, out2)
    assert not np.array_equal(out[0], out[1])


def test_kernel_emulation_vs_native_fuzz(rng):
    if not native.available():
        pytest.skip("no native toolchain")
    states = _fuzz_states(rng, 128)
    x = ints_to_digits(states, shape=(128, 5))
    kern = np.asarray(permute_pallas(x, emulate=True))  # default schedule
    nat = native.perm_batch_digits(x)
    assert np.array_equal(kern, nat)
