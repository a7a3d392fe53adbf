"""Field-layer unit tests vs a Python big-int oracle (SURVEY.md §4 plan d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hades252_tpu import field, params
from hades252_tpu.params import P, R, digits_to_int
from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits


def rand_elems(rng, n):
    vals = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
    return vals, ints_to_digits(vals, shape=(n,))


@pytest.fixture(scope="module")
def batch(rng):
    return rand_elems(rng, 256)


def test_add_mod(rng, batch):
    a_int, a = batch
    b_int, b = rand_elems(rng, 256)
    out = np.asarray(field.add_mod(jnp.asarray(a), jnp.asarray(b)))
    for i in range(256):
        assert digits_to_int(out[i]) == (a_int[i] + b_int[i]) % P


def test_sub_mod(rng, batch):
    a_int, a = batch
    b_int, b = rand_elems(rng, 256)
    out = np.asarray(field.sub_mod(jnp.asarray(a), jnp.asarray(b)))
    for i in range(256):
        assert digits_to_int(out[i]) == (a_int[i] - b_int[i]) % P


def test_mul_wide(rng, batch):
    a_int, a = batch
    b_int, b = rand_elems(rng, 256)
    out = np.asarray(field.mul_wide(jnp.asarray(a), jnp.asarray(b)))
    for i in range(16):  # 512-bit recomposition is slow; spot-check
        got = sum(int(v) << (16 * k) for k, v in enumerate(out[i]))
        assert got == a_int[i] * b_int[i]


def test_mont_mul(rng, batch):
    a_int, a = batch
    b_int, b = rand_elems(rng, 256)
    out = np.asarray(field.mont_mul(jnp.asarray(a), jnp.asarray(b)))
    rinv = pow(R, P - 2, P)
    for i in range(256):
        assert digits_to_int(out[i]) == (a_int[i] * b_int[i] * rinv) % P


def test_mont_domain_round_trip(batch):
    a_int, a = batch
    m = field.to_mont(jnp.asarray(a))
    m_np = np.asarray(m)
    for i in range(32):
        assert digits_to_int(m_np[i]) == (a_int[i] * params.R_MOD_P) % P
    back = np.asarray(field.from_mont(m))
    for i in range(256):
        assert digits_to_int(back[i]) == a_int[i]


def test_quintic_sbox(batch):
    a_int, a = batch
    m = field.to_mont(jnp.asarray(a))
    out = np.asarray(field.from_mont(field.quintic_sbox_mont(m)))
    for i in range(64):
        assert digits_to_int(out[i]) == pow(a_int[i], 5, P)


def test_edge_values():
    # 0, 1, p-1, p-2: boundary cases for the conditional subtract paths
    edge = [0, 1, P - 1, P - 2]
    a = jnp.asarray(ints_to_digits(edge, shape=(4,)))
    s = np.asarray(field.add_mod(a, a))
    for i, v in enumerate(edge):
        assert digits_to_int(s[i]) == (2 * v) % P
    m = field.to_mont(a)
    sq = np.asarray(field.from_mont(field.mont_mul(m, m)))
    for i, v in enumerate(edge):
        assert digits_to_int(sq[i]) == (v * v) % P


def test_dtype_guard():
    bad = jnp.zeros((16,), jnp.int32)
    with pytest.raises(TypeError):
        field.add_mod(bad, bad)


def test_vmap_and_jit_compose(rng):
    vals, d = rand_elems(rng, 8)
    f = jax.jit(jax.vmap(field.mont_mul))
    out = np.asarray(f(jnp.asarray(d), jnp.asarray(d)))
    rinv = pow(R, P - 2, P)
    for i in range(8):
        assert digits_to_int(out[i]) == vals[i] * vals[i] * rinv % P


def test_encoding_round_trip(rng):
    vals, d = rand_elems(rng, 8)
    from hades252_tpu.utils import encoding

    blob = encoding.digits_to_bytes(d)
    assert len(blob) == 8 * 32
    back = encoding.bytes_to_digits(blob, (8,))
    assert np.array_equal(back, d)
    assert list(digits_to_ints(d)) == vals


def test_invert(rng):
    # L0 parity: BlsScalar::invert (SURVEY.md §1); Fermat via traced scan
    from hades252_tpu.params import P, digits_to_int

    x = field.np_random_elements((4,), rng)
    inv = np.asarray(field.invert(jnp.asarray(x)))
    for i in range(4):
        v = digits_to_int(x[i])
        assert digits_to_int(inv[i]) == pow(v, -1, P)
    # 0 -> 0 (documented deviation from the reference's CtOption::none)
    zero = np.zeros((1, 16), np.uint32)
    assert np.array_equal(np.asarray(field.invert(jnp.asarray(zero))), zero)
    # a * a^{-1} == 1 through the field's own mul
    one = np.asarray(field.mont_mul(field.to_mont(jnp.asarray(x)),
                                    field.to_mont(jnp.asarray(inv))))
    one = np.asarray(field.from_mont(jnp.asarray(one)))
    for i in range(4):
        assert digits_to_int(one[i]) == 1
