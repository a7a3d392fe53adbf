"""Circuit-gadget library (circuits.py): in-circuit sponge / Merkle / cipher.

Each gadget must mirror its scalar model's spec bit-exactly (the same
cross-backend consistency contract the reference's prove/verify tests
enforce for the bare permutation, reference src/strategies/gadget.rs:
172-175, extended to every model family), and every circuit must prove and
verify through the unchanged proving stack.

Oracles here are pure-int re-derivations of the model specs through the
ScalarStrategy schedule engine (instant, no compiles); the model tie-in
tests go through the native C++ engine (bit-identical to the JAX models,
tests/test_native.py) so this module adds no fresh XLA compilations beyond
the small tree shapes test_models.py already builds.
"""

import numpy as np
import pytest

from hades252_tpu import circuits, fri, plonk
from hades252_tpu.gadget import Composer
from hades252_tpu.params import P
from hades252_tpu.strategy import ScalarStrategy
from hades252_tpu.utils import native
from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits


def _perm5(state):
    return ScalarStrategy().perm([int(v) % P for v in state])


def _sponge_oracle(words):
    """models/sponge.py spec on canonical ints."""
    length = len(words)
    msg = list(words) + [0] * ((-length) % 4)
    st = [length, 0, 0, 0, 0]
    for c in range(len(msg) // 4):
        st = [st[0]] + [(st[1 + i] + msg[c * 4 + i]) % P for i in range(4)]
        st = _perm5(st)
    return st[1]


def _cipher_oracle(key, nonce, words):
    """models/cipher.py spec on canonical ints."""
    msg = list(words) + [0] * ((-len(words)) % 4)
    n_padded = len(msg)
    st = _perm5([6 + (n_padded << 32), key[0], key[1], nonce, 1])
    ct = []
    for c in range(n_padded // 4):
        cw = [(msg[c * 4 + i] + st[1 + i]) % P for i in range(4)]
        ct += cw
        st = _perm5([st[0]] + cw)
    return ct, st[1]


def _merkle_parent(group):
    return _perm5([4] + list(group))[1]


def _rand_ints(rng, k):
    return [int.from_bytes(rng.bytes(40), "little") % P for _ in range(k)]


# -- sponge gadget ------------------------------------------------------------


@pytest.mark.parametrize("length", [1, 4, 5, 8])
def test_sponge_gadget_matches_spec(rng, length):
    words = _rand_ints(rng, length)
    c = Composer()
    msg_w = [c.append_witness(w) for w in words]
    d = circuits.sponge_hash_gadget(c, msg_w)
    assert c.value(d) == _sponge_oracle(words)
    assert c.check_satisfied()


def test_sponge_gadget_matches_model(rng):
    if not native.available():
        pytest.skip("native engine not built")
    words = _rand_ints(rng, 4)
    c = Composer()
    d = circuits.sponge_hash_gadget(c, [c.append_witness(w) for w in words])
    model = native.sponge_hash_digits(ints_to_digits(words, shape=(1, 4)))
    assert c.value(d) == int(digits_to_ints(model[0]))


def test_sponge_gadget_gate_count():
    c = Composer()
    circuits.sponge_hash_gadget(c, [c.append_witness(i) for i in range(8)])
    # reserved + IV constant + 2 perms + 4 feed adds for the second chunk
    assert len(c) == 1 + 1 + 2 * circuits.PERM_GATES + 4


def test_sponge_preimage_circuit_prove_verify(rng):
    words = _rand_ints(rng, 4)
    digest = _sponge_oracle(words)
    c = circuits.sponge_preimage_circuit(words, digest)
    assert c.check_satisfied()
    key = plonk.preprocess(c)
    assert key.n == 1024  # 975 gates fit the reference-scale domain
    proof = plonk.prove(c, key)
    pi = circuits.public_input_column(c)
    assert plonk.verify(key, proof, pi)
    # a different public digest must not verify against the same proof
    bad = list(pi)
    bad[-1] = (bad[-1] + 1) % P
    assert not plonk.verify(key, proof, bad)


def test_sponge_preimage_succinct_zk(rng):
    words = _rand_ints(rng, 4)
    c = circuits.sponge_preimage_circuit(words, _sponge_oracle(words))
    params = fri.FriParams(blowup=4, n_queries=6, final_degree=16, zk=True)
    pk, vk = fri.preprocess_succinct(c, params)
    proof = fri.prove_succinct(c, pk, rng=np.random.default_rng(7))
    pi = circuits.public_input_column(c)
    assert fri.verify_succinct(vk, proof, pi)
    bad = list(pi)
    bad[-1] = (bad[-1] + 1) % P
    assert not fri.verify_succinct(vk, proof, bad)


# -- Merkle membership gadget -------------------------------------------------


def _int_tree(leaves):
    """Pure-int arity-4 tree levels (canonical ints, padded to a power of 4)."""
    n = 1
    while n < len(leaves):
        n *= 4
    level = list(leaves) + [0] * (n - len(leaves))
    levels = [level]
    while len(level) > 1:
        level = [
            _merkle_parent(level[g * 4 : (g + 1) * 4])
            for g in range(len(level) // 4)
        ]
        levels.append(level)
    return levels


def _path_from_int_tree(levels, index):
    groups, positions = [], []
    for level in levels[:-1]:
        g = index // 4
        groups.append(level[g * 4 : (g + 1) * 4])
        positions.append(index % 4)
        index = g
    return groups, positions


def test_merkle_gadget_matches_spec(rng):
    leaves = _rand_ints(rng, 16)
    levels = _int_tree(leaves)
    root = levels[-1][0]
    for index in (0, 5, 15):
        groups, positions = _path_from_int_tree(levels, index)
        c = circuits.merkle_membership_circuit(
            leaves[index], groups, positions, root, index=index
        )
        assert c.check_satisfied()


def test_merkle_gadget_rejects_wrong_slot(rng):
    """The multiplexer constraint pins the node to its claimed position:
    lying about the position bits (pointing at a DIFFERENT child that does
    not equal the leaf) must leave the circuit unsatisfied."""
    leaves = _rand_ints(rng, 16)
    levels = _int_tree(leaves)
    groups, positions = _path_from_int_tree(levels, 5)
    lying = [(positions[0] + 1) % 4] + positions[1:]
    c = circuits.merkle_membership_circuit(
        leaves[5], groups, lying, levels[-1][0]
    )
    assert not c.check_satisfied()


def test_merkle_gadget_rejects_nonboolean_bits(rng):
    """Position bits are constrained boolean — a crafted b0 outside {0,1}
    cannot satisfy b^2 = b even if it satisfies the multiplexer."""
    leaves = _rand_ints(rng, 16)
    levels = _int_tree(leaves)
    groups, positions = _path_from_int_tree(levels, 5)
    c = Composer()
    leaf_w = c.append_witness(leaves[5])
    groups_w = [[c.append_witness(v) for v in g] for g in groups]
    bits_w = [
        (c.append_witness(2), c.append_witness(0)),  # b0 = 2: non-boolean
        (c.append_witness(positions[1] & 1), c.append_witness(positions[1] >> 1)),
    ]
    circuits.merkle_membership_gadget(c, leaf_w, groups_w, bits_w)
    assert not c.check_satisfied()


def test_merkle_path_ints_matches_model(rng):
    """merkle_path_ints extracts witness data from a real models/merkle.py
    build (64 leaves — the same level shapes test_models.py compiles)."""
    import jax.numpy as jnp

    from hades252_tpu.models import merkle

    leaves_int = _rand_ints(rng, 64)
    leaves = jnp.asarray(ints_to_digits(leaves_int, shape=(64,)))
    levels = merkle.merkle_levels(leaves)
    leaf, groups, positions, root = circuits.merkle_path_ints(levels, 37)
    assert leaf == leaves_int[37]
    int_levels = _int_tree(leaves_int)
    assert root == int_levels[-1][0]
    assert (groups, positions) == _path_from_int_tree(int_levels, 37)
    c = circuits.merkle_membership_circuit(
        leaf, groups, positions, root, index=37
    )
    assert c.check_satisfied()


def test_merkle_membership_circuit_prove_verify(rng):
    """End-to-end membership proof at height 3 (n = 4096): the proving
    stack is circuit-agnostic beyond the reference-scale n = 1024."""
    leaves = _rand_ints(rng, 64)
    levels = _int_tree(leaves)
    root = levels[-1][0]
    groups, positions = _path_from_int_tree(levels, 37)
    c = circuits.merkle_membership_circuit(
        leaves[37], groups, positions, root, index=37
    )
    key = plonk.preprocess(c)
    assert key.n == 4096
    proof = plonk.prove(c, key)
    pi = circuits.public_input_column(c)
    assert plonk.verify(key, proof, pi)
    # rebinding the SAME proof to a different tree root must fail
    other_root_pi = [
        (v + 1) % P if v == (P - root) % P else v for v in pi
    ]
    assert not plonk.verify(key, proof, other_root_pi)
    # ... and to a different leaf index (statement carries the position)
    other_index_pi = [
        (P - 38) % P if v == (P - 37) % P else v for v in pi
    ]
    assert not plonk.verify(key, proof, other_index_pi)


def test_merkle_gate_count():
    leaves = list(range(1, 17))
    levels = _int_tree(leaves)
    groups, positions = _path_from_int_tree(levels, 3)
    c = circuits.merkle_membership_circuit(
        leaves[3], groups, positions, levels[-1][0], index=3
    )
    # reserved + tag + 2*(13 mux/bool + perm) + root PI + 2 index adds + PI
    assert len(c) == 1 + 1 + 2 * (13 + circuits.PERM_GATES) + 1 + 2 + 1


def test_merkle_membership_aggregate(rng):
    """B memberships, ONE succinct argument: the membership circuit has a
    fixed structure for a given height (positions are witness bits, the
    root/index only enter the public-input column), so one preprocessing
    serves every leaf of every same-height tree and the aggregate prover
    accepts them as same-circuit instances."""
    from hades252_tpu import aggregate

    leaves = _rand_ints(rng, 16)
    levels = _int_tree(leaves)
    root = levels[-1][0]
    cs = []
    for index in (2, 7, 11):
        groups, positions = _path_from_int_tree(levels, index)
        cs.append(
            circuits.merkle_membership_circuit(
                leaves[index], groups, positions, root, index=index
            )
        )
    params = fri.FriParams(blowup=4, n_queries=6, final_degree=16)
    pk, vk = fri.preprocess_succinct(cs[0], params)
    proof = aggregate.prove_aggregate(cs, pk)
    pis = [circuits.public_input_column(c) for c in cs]
    assert aggregate.verify_aggregate(vk, proof, pis)
    # swapping two instances' statements must fail (per-instance binding)
    assert not aggregate.verify_aggregate(vk, proof, [pis[1], pis[0], pis[2]])


# -- cipher gadget ------------------------------------------------------------


@pytest.mark.parametrize("length", [3, 4, 8])
def test_cipher_gadget_matches_spec(rng, length):
    key = _rand_ints(rng, 2)
    nonce, = _rand_ints(rng, 1)
    words = _rand_ints(rng, length)
    ct, tag = _cipher_oracle(key, nonce, words)
    c = Composer()
    key_w = (c.append_witness(key[0]), c.append_witness(key[1]))
    nonce_w = c.append_witness(nonce)
    msg_w = [c.append_witness(w) for w in words]
    ct_w, tag_w = circuits.cipher_encrypt_gadget(c, key_w, nonce_w, msg_w)
    assert [c.value(w) for w in ct_w] == ct
    assert c.value(tag_w) == tag
    assert c.check_satisfied()


def test_cipher_gadget_matches_model(rng):
    if not native.available():
        pytest.skip("native engine not built")
    key = _rand_ints(rng, 2)
    nonce, = _rand_ints(rng, 1)
    words = _rand_ints(rng, 4)
    ct_d, tag_d = native.cipher_digits(
        ints_to_digits(key, shape=(1, 2)),
        ints_to_digits([nonce], shape=(1,)),
        ints_to_digits(words, shape=(1, 4)),
        decrypt=False,
    )
    c = Composer()
    ct_w, tag_w = circuits.cipher_encrypt_gadget(
        c,
        (c.append_witness(key[0]), c.append_witness(key[1])),
        c.append_witness(nonce),
        [c.append_witness(w) for w in words],
    )
    assert [c.value(w) for w in ct_w] == list(digits_to_ints(ct_d[0]))
    assert c.value(tag_w) == int(digits_to_ints(tag_d[0]))


def test_cipher_encryption_circuit_prove_verify(rng):
    key = _rand_ints(rng, 2)
    nonce, = _rand_ints(rng, 1)
    words = _rand_ints(rng, 4)
    ct, tag = _cipher_oracle(key, nonce, words)
    c = circuits.cipher_encryption_circuit(key, nonce, words, ct, tag)
    assert c.check_satisfied()
    pkey = plonk.preprocess(c)
    assert pkey.n == 2048
    proof = plonk.prove(c, pkey)
    pi = circuits.public_input_column(c)
    assert plonk.verify(pkey, proof, pi)
    # tampering with one public ciphertext word must fail
    bad = list(pi)
    idx = bad.index((P - ct[0]) % P)
    bad[idx] = (bad[idx] + 1) % P
    assert not plonk.verify(pkey, proof, bad)


def test_cipher_circuit_rejects_wrong_padded_length(rng):
    key = _rand_ints(rng, 2)
    nonce, = _rand_ints(rng, 1)
    words = _rand_ints(rng, 3)
    ct, tag = _cipher_oracle(key, nonce, words)
    with pytest.raises(ValueError):
        circuits.cipher_encryption_circuit(key, nonce, words, ct[:3], tag)
