"""Sponge and Merkle driver tests vs a plain-Python big-int oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from hades252_tpu import field, params
from hades252_tpu.models import merkle, sponge
from hades252_tpu.ops import make_perm_mont_fn
from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits

P = params.P


# --- independent Python oracle (plain ints, no library field code) ---------


def _oracle_perm(state):
    ark = params.round_constants_int()
    mds = params.mds_matrix_int()
    s = list(state)
    ci = 0
    for r in range(67):
        s = [(w + ark[ci + k]) % P for k, w in enumerate(s)]
        ci += 5
        if r < 4 or r >= 63:
            s = [pow(w, 5, P) for w in s]
        else:
            s[4] = pow(s[4], 5, P)
        s = [sum(mds[k][j] * s[j] for j in range(5)) % P for k in range(5)]
    return s


def _oracle_sponge(words):
    length = len(words)
    padded = list(words) + [0] * ((-length) % 4)
    state = [length, 0, 0, 0, 0]
    for c in range(0, len(padded), 4):
        for i in range(4):
            state[1 + i] = (state[1 + i] + padded[c + i]) % P
        state = _oracle_perm(state)
    return state[1]


def _oracle_merkle(leaves):
    n = 1
    while n < len(leaves):
        n *= 4
    level = list(leaves) + [0] * (n - len(leaves))
    while len(level) > 1:
        level = [
            _oracle_perm([4] + level[i : i + 4])[1]
            for i in range(0, len(level), 4)
        ]
    return level[0]


# --- tests ------------------------------------------------------------------


def test_sponge_matches_oracle(rng):
    words = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(7)]
    got = sponge.sponge_hash_ints(words)
    assert got == _oracle_sponge(words)


def test_sponge_batched_and_rate_boundary(rng):
    # L=4 (exactly one chunk) and L=8 (two chunks), batch of 3
    for L in (4, 8):
        msgs = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(L)]
                for _ in range(3)]
        out = sponge.sponge_hash(jnp.asarray(ints_to_digits(msgs, shape=(3, L))))
        for b in range(3):
            assert int(digits_to_ints(np.asarray(out[b]))) == _oracle_sponge(msgs[b])


def test_sponge_length_domain_separation():
    # same words, different declared length (zero-padding vs real zeros)
    a = sponge.sponge_hash_ints([7, 8, 9])
    b = sponge.sponge_hash_ints([7, 8, 9, 0])
    assert a != b


def test_sponge_pallas_backend_matches(rng):
    words = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(5)]]
    msgs = jnp.asarray(ints_to_digits(words, shape=(1, 5)))
    ref = sponge.sponge_hash(msgs)
    fast = sponge.sponge_hash(
        msgs, make_perm_mont_fn("pallas", block=128, emulate=True), scan=False
    )
    assert np.array_equal(np.asarray(ref), np.asarray(fast))


def test_sponge_streaming_matches_oneshot(rng):
    # absorb in odd chunk sizes (1, 3, 2, 1) == one-shot hash of all 7 words
    msgs = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(7)]
            for _ in range(2)]
    arr = ints_to_digits(msgs, shape=(2, 7))
    st = sponge.SpongeState(2, 7)
    st.absorb(jnp.asarray(arr[:, :1]))
    st.absorb(jnp.asarray(arr[:, 1:4]))
    st.absorb(jnp.asarray(arr[:, 4:6]))
    st.absorb(jnp.asarray(arr[:, 6:7]))
    digest = st.digest()
    oneshot = sponge.sponge_hash(jnp.asarray(arr))
    assert np.array_equal(np.asarray(digest), np.asarray(oneshot))


def test_sponge_squeeze_extendable(rng):
    msgs = ints_to_digits([[5, 6, 7, 8]], shape=(1, 4))
    st = sponge.SpongeState(1, 4).absorb(jnp.asarray(msgs))
    out = st.squeeze(6)  # crosses a permutation boundary at word 4
    assert out.shape == (1, 6, 16)
    # first word == the fixed-length digest; words distinct
    assert np.array_equal(
        np.asarray(out[0, 0]),
        np.asarray(sponge.sponge_hash(jnp.asarray(msgs))[0]),
    )
    ints = [int(digits_to_ints(np.asarray(out[0, i]))) for i in range(6)]
    assert len(set(ints)) == 6


def test_sponge_digest_idempotent(rng):
    msgs = ints_to_digits([[1, 2, 3, 4]], shape=(1, 4))
    st = sponge.SpongeState(1, 4).absorb(jnp.asarray(msgs))
    a = np.asarray(st.digest())
    b = np.asarray(st.digest())
    assert np.array_equal(a, b)
    # digest unchanged even after squeezing past it
    st.squeeze(3)
    assert np.array_equal(np.asarray(st.digest()), a)


def test_sponge_streaming_validation(rng):
    st = sponge.SpongeState(1, 4)
    with pytest.raises(ValueError):
        st.absorb(jnp.zeros((1, 5, 16), jnp.uint32))  # past declared length
    st.absorb(jnp.zeros((1, 2, 16), jnp.uint32))
    with pytest.raises(RuntimeError):
        st.digest()  # under-absorbed
    st.absorb(jnp.zeros((1, 2, 16), jnp.uint32))
    st.digest()
    with pytest.raises(RuntimeError):
        st.absorb(jnp.zeros((1, 1, 16), jnp.uint32))  # absorb after squeeze


def test_merkle_root_matches_oracle(rng):
    leaves_int = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(16)]
    leaves = jnp.asarray(ints_to_digits(leaves_int, shape=(16,)))
    root = merkle.merkle_root(leaves)
    assert int(digits_to_ints(np.asarray(root))) == _oracle_merkle(leaves_int)


def test_merkle_non_pow4_padding(rng):
    leaves_int = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(6)]
    leaves = jnp.asarray(ints_to_digits(leaves_int, shape=(6,)))
    root = merkle.merkle_root(leaves)
    assert int(digits_to_ints(np.asarray(root))) == _oracle_merkle(leaves_int)


def test_merkle_single_leaf():
    leaves = jnp.asarray(ints_to_digits([42], shape=(1,)))
    root = merkle.merkle_root(leaves)
    assert int(digits_to_ints(np.asarray(root))) == 42


def test_merkle_open_verify(rng):
    leaves_int = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(16)]
    leaves = jnp.asarray(ints_to_digits(leaves_int, shape=(16,)))
    levels = merkle.merkle_levels(leaves)
    root = merkle.merkle_root(leaves)
    path = merkle.merkle_open(levels, 5)
    leaf5 = ints_to_digits([leaves_int[5]])[0]
    assert merkle.merkle_verify(root, leaf5, path, height=2)
    # wrong leaf fails
    bad = ints_to_digits([(leaves_int[5] + 1) % P])[0]
    assert not merkle.merkle_verify(root, bad, path, height=2)
    # an internal node with a truncated path must NOT verify as a leaf
    internal = np.asarray(field.from_mont(levels[1][1]))
    short = path[1:]
    assert not merkle.merkle_verify(root, internal, short, height=2)


def test_merkle_pallas_backend_matches(rng):
    leaves_int = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(16)]
    leaves = jnp.asarray(ints_to_digits(leaves_int, shape=(16,)))
    ref = merkle.merkle_root(leaves)
    fast = merkle.merkle_root(
        leaves, make_perm_mont_fn("pallas", block=128, emulate=True)
    )
    assert np.array_equal(np.asarray(ref), np.asarray(fast))


def test_shape_validation():
    with pytest.raises(ValueError):
        sponge.sponge_hash(jnp.zeros((3, 16), jnp.uint32))
    with pytest.raises(ValueError):
        merkle.merkle_root(jnp.zeros((4, 4, 16), jnp.uint32))


# -- compact batched Merkle openings (round-2) -------------------------------


def test_merkle_compact_proofs_batch(rng):
    from hades252_tpu import field
    from hades252_tpu.models.merkle import (
        merkle_levels, merkle_open_batched, merkle_root,
        merkle_verify_batched, tree_levels,
    )

    n = 64
    leaves = jnp.asarray(ints_to_digits(list(range(3, 3 + n)), shape=(n,)))
    root = merkle_root(leaves)
    levels = merkle_levels(leaves)
    h = tree_levels(n)
    idx = [0, 1, 17, 42, 63]
    sibs, poss = merkle_open_batched(levels, idx)
    assert sibs.shape == (len(idx), h, 3, 16)  # 3 siblings/level: compact
    ok = merkle_verify_batched(root, leaves[jnp.asarray(idx)], sibs, poss, h)
    assert bool(jnp.all(ok))

    # wrong leaf fails only for the tampered row
    bad_leaves = leaves[jnp.asarray(idx)].at[2, 0].add(1)
    ok2 = merkle_verify_batched(root, bad_leaves, sibs, poss, h)
    assert list(np.asarray(ok2)) == [True, True, False, True, True]

    # tampered sibling fails
    bad_sibs = sibs.at[0, 1, 0, 0].add(1)
    ok3 = merkle_verify_batched(root, leaves[jnp.asarray(idx)], bad_sibs,
                                poss, h)
    assert not bool(ok3[0]) and bool(ok3[1])

    # height binding: truncated path is rejected wholesale
    ok4 = merkle_verify_batched(root, leaves[jnp.asarray(idx)],
                                sibs[:, :-1], poss[:, :-1], h)
    assert not bool(jnp.any(ok4))


def test_merkle_out_of_range_position_rejected():
    # Advisor finding (round 2): for pos >= ARITY, _insert_at never places
    # the node, so the child group is ENTIRELY proof-supplied — on a padded
    # tree (whose padding groups are all-zero, i.e. duplicate digests exist)
    # an out-of-range position plus the real all-zero group forges a
    # membership proof for an arbitrary leaf. The verdict must range-check
    # attacker-supplied positions.
    from hades252_tpu.models.merkle import (
        merkle_levels, merkle_open_batched, merkle_root,
        merkle_verify_batched, tree_levels,
    )

    n = 5  # pads to 16 leaves: level-0 groups 2 and 3 are all-zero
    leaves = jnp.asarray(ints_to_digits(list(range(1, n + 1)), shape=(n,)))
    root = merkle_root(leaves)
    levels = merkle_levels(leaves)
    h = tree_levels(16)
    # honest opening of padded slot 12 (group 3, all-zero children):
    # its level-0 siblings are already the zero digests the attack needs
    sibs, poss = merkle_open_batched(levels, [12])
    evil_leaf = jnp.asarray(ints_to_digits([12345], shape=(1,)))
    forged_poss = poss.at[0, 0].set(merkle.ARITY)  # out of range
    ok = merkle_verify_batched(root, evil_leaf, sibs, forged_poss, h)
    assert not bool(ok[0])
    # sanity: without the out-of-range position the evil leaf also fails
    ok2 = merkle_verify_batched(root, evil_leaf, sibs, poss, h)
    assert not bool(ok2[0])


def test_merkle_compact_matches_legacy(rng):
    from hades252_tpu.models.merkle import (
        merkle_levels, merkle_open, merkle_open_batched, merkle_root,
        merkle_verify, merkle_verify_batched, tree_levels,
    )

    n = 16
    leaves = jnp.asarray(ints_to_digits(list(range(n)), shape=(n,)))
    root = merkle_root(leaves)
    levels = merkle_levels(leaves)
    h = tree_levels(n)
    path = merkle_open(levels, 5)
    assert merkle_verify(root, ints_to_digits([5])[0], path, h)
    sibs, poss = merkle_open_batched(levels, [5])
    ok = merkle_verify_batched(root, leaves[5:6], sibs, poss, h)
    assert bool(ok[0])


# -- duplex cipher (round-2 capability) --------------------------------------


def _int_cipher(key2, nonce, msg):
    """Independent int-oracle of the cipher spec (models/cipher.py)."""
    from hades252_tpu.strategy import ScalarStrategy

    strat = ScalarStrategy()
    msg = list(msg) + [0] * ((-len(msg)) % 4)
    state = [(6 + (len(msg) << 32)) % P, key2[0], key2[1], nonce, 1]
    state = strat.perm(state)
    ct = []
    for off in range(0, len(msg), 4):
        for i in range(4):
            c = (msg[off + i] + state[1 + i]) % P
            ct.append(c)
            state[1 + i] = c
        state = strat.perm(state)
    return ct, state[1]


def test_cipher_roundtrip_and_oracle(rng):
    from hades252_tpu.models import cipher

    b, l = 3, 6
    keys = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(2)]
            for _ in range(b)]
    nonces = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(b)]
    msgs = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(l)]
            for _ in range(b)]
    key_d = jnp.asarray(ints_to_digits(keys, shape=(b, 2)))
    nonce_d = jnp.asarray(ints_to_digits(nonces, shape=(b,)))
    msg_d = jnp.asarray(ints_to_digits(msgs, shape=(b, l)))

    ct, tag = cipher.encrypt(key_d, nonce_d, msg_d)
    assert ct.shape == (b, 8, 16)  # padded to the rate

    # cross-check every row against the independent int oracle
    for i in range(b):
        ct_i, tag_i = _int_cipher(keys[i], nonces[i], msgs[i])
        got = [int(digits_to_ints(np.asarray(ct[i, j]))) for j in range(8)]
        assert got == ct_i, f"row {i}"
        assert int(digits_to_ints(np.asarray(tag[i]))) == tag_i

    # roundtrip + authentication
    pt, ok = cipher.decrypt(key_d, nonce_d, ct, tag)
    assert bool(jnp.all(ok))
    assert np.array_equal(np.asarray(pt[:, :l]), np.asarray(msg_d))

    # wrong key fails authentication
    bad_key = key_d.at[0, 0, 0].add(1)
    _, ok2 = cipher.decrypt(bad_key, nonce_d, ct, tag)
    assert not bool(ok2[0]) and bool(ok2[1])

    # tampered ciphertext fails
    bad_ct = ct.at[1, 2, 0].add(1)
    _, ok3 = cipher.decrypt(key_d, nonce_d, bad_ct, tag)
    assert bool(ok3[0]) and not bool(ok3[1])

    # truncation fails (the tag binds the padded length)
    _, ok4 = cipher.decrypt(key_d, nonce_d, ct[:, :4], tag)
    assert not bool(jnp.any(ok4))
