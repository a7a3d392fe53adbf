"""Native C++ host engine (native/hades_cpu.cpp) vs the JAX oracles.

The native engine is the framework's CPU execution backend and the
measured stand-in for the reference implementation's performance class
(single-threaded 4x u64 Montgomery limbs). Skipped when the toolchain
can't build it."""

import jax.numpy as jnp
import numpy as np
import pytest

from hades252_tpu import ScalarStrategy, params
from hades252_tpu.models import merkle, sponge
from hades252_tpu.utils import native
from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

P = params.P


def test_native_perm_kats():
    x = ints_to_digits([[0] * 5, [0, 1, 2, 3, 4]], shape=(2, 5))
    out = native.perm_batch_digits(x)
    got = [int(v) for v in digits_to_ints(out[:, 0, :])]
    assert got[0] == 0x4448679E00A28DD381089245EFAAB4249E99C5825CEEC146D8AAC63A3C3BBC95
    assert got[1] == 0x4C78FE2E2CDB6E76B43742B08A782A771258F76F57B5FFE586F2391A0363013A


def test_native_backend_matches_ref(rng):
    vals = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(5)]
            for _ in range(8)]
    x = ints_to_digits(vals, shape=(8, 5))
    ref = np.asarray(ScalarStrategy("ref").perm(jnp.asarray(x)))
    nat = ScalarStrategy("native").perm(x)
    assert np.array_equal(ref, np.asarray(nat))


def test_native_sponge_matches(rng):
    words = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(7)]
    msgs = ints_to_digits([words], shape=(1, 7))
    d_native = int(digits_to_ints(native.sponge_hash_digits(msgs)[0]))
    assert d_native == sponge.sponge_hash_ints(words)


def test_native_merkle_matches(rng):
    leaves_int = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(16)]
    leaves = ints_to_digits(leaves_int, shape=(16,))
    r_native = int(digits_to_ints(native.merkle_root_digits(leaves)))
    r_jax = int(digits_to_ints(np.asarray(merkle.merkle_root(jnp.asarray(leaves)))))
    assert r_native == r_jax


def test_native_bench_sane():
    assert native.bench_perms_per_sec(200) > 0


def test_native_cipher_parity(rng):
    # native duplex cipher == JAX models.cipher, bit-identical (encrypt,
    # decrypt, tags), plus roundtrip through the native path alone
    if not native.available():
        pytest.skip("no native toolchain")
    import jax.numpy as jnp

    from hades252_tpu.models import cipher

    b, l = 2, 8
    key = ints_to_digits(
        [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(2)]
         for _ in range(b)], shape=(b, 2))
    nonce = ints_to_digits(
        [int.from_bytes(rng.bytes(40), "little") % P for _ in range(b)],
        shape=(b,))
    msg = ints_to_digits(
        [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(l)]
         for _ in range(b)], shape=(b, l))

    ct_j, tag_j = cipher.encrypt(jnp.asarray(key), jnp.asarray(nonce),
                                 jnp.asarray(msg))
    ct_n, tag_n = native.cipher_digits(key, nonce, msg)
    assert np.array_equal(np.asarray(ct_j), ct_n)
    assert np.array_equal(np.asarray(tag_j), tag_n)

    pt_n, tag_n2 = native.cipher_digits(key, nonce, ct_n, decrypt=True)
    assert np.array_equal(pt_n, msg)
    assert np.array_equal(tag_n2, tag_n)


def test_native_mt_perm_bit_identical(rng):
    """perm_batch_digits_mt shards one buffer across OS threads; every
    shard runs the same C++ per state, so outputs must be bit-identical
    to the single-thread engine for every thread count and for batch
    sizes that do and don't divide evenly (including threads > batch)."""
    vals = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(5)]
            for _ in range(11)]
    x = ints_to_digits(vals, shape=(11, 5))
    want = native.perm_batch_digits(x)
    for nt in (1, 2, 3, 4, 16):
        got = native.perm_batch_digits_mt(x, n_threads=nt)
        assert np.array_equal(got, want), nt
    # the injectable perm_fn factory wraps the same path
    fn = native.threaded_perm(3)
    assert np.array_equal(fn(x), want)


def test_native_mt_perm_through_verify_seam(rng):
    """The threaded engine must be injectable at fri's perm_fn seam with
    verdicts identical to the default engine: build a tree with the
    single-thread perm, verify its openings with the threaded one."""
    from hades252_tpu import fri

    leaves = [int.from_bytes(rng.bytes(40), "little") % P
              for _ in range(16)]
    levels = fri.tree_build(leaves, native.perm_batch_digits)
    root = int(digits_to_ints(levels[-1][0]))
    idx = [1, 7, 12]
    nodes = fri.multiproof_open(levels, idx)
    digs = levels[0][idx]
    ok = fri.multiproof_verify_many(
        [(root, digs, idx, nodes, len(levels) - 1)],
        native.threaded_perm(2),
    )
    assert ok.tolist() == [True]


def test_native_opt_engine_bit_identical(rng):
    """The sparse-factored engine (the serving default) must be
    bit-identical to the naive dense-schedule engine (the reference-
    class baseline) on random batches, and measurably the same function
    the bench reports on (bench_perms_per_sec_opt runs)."""
    vals = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(5)]
            for _ in range(128)]
    x = ints_to_digits(vals, shape=(128, 5))
    assert np.array_equal(native.perm_batch_digits(x),
                          native.perm_batch_digits_naive(x))
    assert native.bench_perms_per_sec_opt(2000) > 0


def test_native_ifma_group_tail_and_edges(rng):
    """On AVX-512 IFMA hosts hades_perm_batch_opt runs 8-state groups
    through the radix-52 vector engine and the remainder through the
    scalar path; the seam and the extreme field values must both be
    bit-identical to the naive engine and canonical. On non-IFMA hosts
    this degenerates to scalar-vs-naive (still a valid identity)."""
    edge = [0, 1, P - 1, P - 2, (1 << 255) % P]
    vals = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(5)]
            for _ in range(21)]  # 2 vector groups + a 5-state scalar tail
    vals[0] = edge
    vals[8] = edge[::-1]  # edge values inside the second vector group
    vals[20] = edge       # and inside the scalar tail
    x = ints_to_digits(vals, shape=(21, 5))
    got = native.perm_batch_digits(x)
    assert np.array_equal(got, native.perm_batch_digits_naive(x))
    assert not (np.asarray(got, np.uint32) >> 16).any()  # 16-bit digits
    # capability probe + batch-engine bench are consistent
    if native.has_ifma():
        assert native.bench_perms_per_sec_opt8(2000) > 0
    else:
        assert native.bench_perms_per_sec_opt8(2000) == -1.0


def test_native_validate_flag(rng):
    """validate=False (the pooled-seam fast path: canonicality proven
    at every admission point) must be bit-identical to the validating
    path on canonical inputs; validate=True must keep rejecting
    non-canonical and non-normalized digits."""
    vals = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(5)]
            for _ in range(9)]
    x = ints_to_digits(vals, shape=(9, 5))
    assert np.array_equal(native.perm_batch_digits(x, validate=False),
                          native.perm_batch_digits(x))
    assert np.array_equal(
        native.perm_batch_digits_mt(x, n_threads=2, validate=False),
        native.perm_batch_digits(x))
    bad = np.asarray(x, np.uint32).copy()
    bad[0, 0, :] = 0xFFFF  # 16-bit digits but value >= p
    with pytest.raises(ValueError, match="canonical"):
        native.perm_batch_digits(bad)
    wide = np.asarray(x, np.uint32).copy()
    wide[0, 0, 0] += 1 << 16
    with pytest.raises(ValueError, match="normalized"):
        native.perm_batch_digits(wide)
    # the framework's pooled seam is the validate=False fast path
    from hades252_tpu import fri

    assert fri.default_pcs_perm() in (fri._pcs_perm_native,
                                      fri._pcs_perm_native_mt)
