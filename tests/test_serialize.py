"""Proof / verifier-key wire format (serialize.py).

Reference parity: dusk-plonk's `Proof`/verifier data are `Serializable`
(`to_bytes`/`from_bytes`) — the cycle the reference exercises at
src/strategies/gadget.rs:198-223 hands proofs around as bytes. These
tests pin the round-trip, the exact-size contract, and the strict
rejection paths (truncation, trailing bytes, bad magic, non-canonical
scalars, out-of-range Merkle positions, key/header disagreement).
"""

import numpy as np
import pytest

from hades252_tpu import fri, serialize
from hades252_tpu.gadget import Composer, Constraint


def _tiny_composer():
    c = Composer()
    a = c.append_witness(3)
    b = c.append_witness(5)
    c.gate_mul(Constraint().mult(1).a(a).b(b))
    c.gate_add(Constraint().left(1).a(a).right(1).b(b).public(-8))
    return c


@pytest.fixture(scope="module")
def setup():
    c = _tiny_composer()
    pk, vk = fri.preprocess_succinct(
        c, fri.FriParams(blowup=8, n_queries=8, final_degree=8)
    )
    proof = fri.prove_succinct(c, pk)
    return c, pk, vk, proof


@pytest.fixture(scope="module")
def zk_setup():
    c = _tiny_composer()
    pk, vk = fri.preprocess_succinct(
        c, fri.FriParams(blowup=4, n_queries=6, final_degree=16, zk=True)
    )
    proof = fri.prove_succinct(c, pk, rng=np.random.default_rng(7))
    return c, pk, vk, proof


# -- round trips --------------------------------------------------------------


def test_proof_roundtrip(setup):
    c, pk, vk, proof = setup
    data = serialize.proof_to_bytes(proof, vk)
    assert len(data) == serialize.expected_proof_size(vk.n, vk.params)
    back = serialize.proof_from_bytes(data, vk)
    assert fri.verify_succinct(vk, back, [g.pi for g in c.gates])
    # deterministic: re-serializing the decoded proof is byte-identical
    assert serialize.proof_to_bytes(back, vk) == data


def test_zk_proof_roundtrip(zk_setup):
    c, pk, vk, proof = zk_setup
    data = serialize.proof_to_bytes(proof, vk)
    assert len(data) == serialize.expected_proof_size(
        vk.n, vk.params, n_final=len(proof.fri.final_coeffs)
    )
    back = serialize.proof_from_bytes(data, vk)
    assert fri.verify_succinct(vk, back, [g.pi for g in c.gates])


def test_vk_roundtrip(setup):
    c, pk, vk, proof = setup
    data = serialize.vk_to_bytes(vk)
    back = serialize.vk_from_bytes(data)
    assert back == vk
    # the decoded key verifies a decoded proof end to end
    wire = serialize.proof_to_bytes(proof, vk)
    assert fri.verify_succinct(
        back, serialize.proof_from_bytes(wire, back),
        [g.pi for g in c.gates],
    )


# -- strict rejection ---------------------------------------------------------


def test_bad_magic(setup):
    _, _, vk, proof = setup
    data = bytearray(serialize.proof_to_bytes(proof, vk))
    data[:4] = b"XXXX"
    with pytest.raises(ValueError, match="magic"):
        serialize.proof_from_bytes(bytes(data), vk)
    with pytest.raises(ValueError, match="magic"):
        serialize.vk_from_bytes(b"YYYY" + serialize.vk_to_bytes(vk)[4:])


def test_truncation_and_trailing(setup):
    _, _, vk, proof = setup
    data = serialize.proof_to_bytes(proof, vk)
    with pytest.raises(ValueError, match="truncated"):
        serialize.proof_from_bytes(data[:-1], vk)
    with pytest.raises(ValueError, match="trailing"):
        serialize.proof_from_bytes(data + b"\x00", vk)
    vkb = serialize.vk_to_bytes(vk)
    with pytest.raises(ValueError, match="truncated"):
        serialize.vk_from_bytes(vkb[:-1])
    with pytest.raises(ValueError, match="trailing"):
        serialize.vk_from_bytes(vkb + b"\x00")


def test_non_canonical_scalar_rejected(setup):
    _, _, vk, proof = setup
    data = bytearray(serialize.proof_to_bytes(proof, vk))
    off = len(serialize.MAGIC_PROOF) + serialize._PROOF_HEADER.size
    data[off : off + 32] = b"\xff" * 32  # first root >= p
    with pytest.raises(ValueError, match="canonical"):
        serialize.proof_from_bytes(bytes(data), vk)


def test_out_of_range_position_rejected(setup):
    _, _, vk, proof = setup
    data = bytearray(serialize.proof_to_bytes(proof, vk))
    # every block (opening or FRI layer) ends with its position bytes,
    # so the final byte of the encoding is always a Merkle position
    data[-1] = fri.ARITY
    with pytest.raises(ValueError, match="position out of range"):
        serialize.proof_from_bytes(bytes(data), vk)


def test_header_key_mismatch(setup, zk_setup):
    _, _, vk, proof = setup
    _, _, vk_zk, _ = zk_setup
    data = serialize.proof_to_bytes(proof, vk)
    with pytest.raises(ValueError, match="disagrees"):
        serialize.proof_from_bytes(data, vk_zk)


def test_vk_header_validation(setup):
    _, _, vk, _ = setup
    data = bytearray(serialize.vk_to_bytes(vk))
    hdr_off = len(serialize.MAGIC_VK)
    # n = 3: not a power of two
    bad = bytearray(data)
    bad[hdr_off : hdr_off + 4] = (3).to_bytes(4, "little")
    with pytest.raises(ValueError, match="power of two"):
        serialize.vk_from_bytes(bytes(bad))
    # n_gates > n
    bad = bytearray(data)
    bad[hdr_off + 4 : hdr_off + 8] = (vk.n + 1).to_bytes(4, "little")
    with pytest.raises(ValueError, match="gate count"):
        serialize.vk_from_bytes(bytes(bad))


def test_serializer_validates_structure(setup):
    _, _, vk, proof = setup
    # wrong-shape sibling block refuses to serialize
    mangled_sibs = dict(proof.open_sibs)
    mangled_sibs["a"] = np.asarray(proof.open_sibs["a"])[:, :-1]
    forged = fri.SuccinctProof(
        roots=proof.roots, evals=proof.evals, fri=proof.fri,
        open_values=proof.open_values, open_sibs=mangled_sibs,
        open_poss=proof.open_poss,
    )
    with pytest.raises(ValueError, match="sibling block shape"):
        serialize.proof_to_bytes(forged, vk)
    # missing commitment root refuses to serialize
    roots = dict(proof.roots)
    del roots["z"]
    forged = fri.SuccinctProof(
        roots=roots, evals=proof.evals, fri=proof.fri,
        open_values=proof.open_values, open_sibs=proof.open_sibs,
        open_poss=proof.open_poss,
    )
    with pytest.raises(ValueError, match="missing commitment root"):
        serialize.proof_to_bytes(forged, vk)


def test_tampered_byte_still_verifies_as_false(setup):
    # a flipped low byte inside an opened value deserializes fine (still
    # canonical) but must fail verification — decode strictness is not a
    # substitute for the cryptographic check
    c, _, vk, proof = setup
    data = bytearray(serialize.proof_to_bytes(proof, vk))
    off = len(serialize.MAGIC_PROOF) + serialize._PROOF_HEADER.size
    data[off] ^= 1  # low byte of the first root: value stays < p
    back = serialize.proof_from_bytes(bytes(data), vk)
    assert not fri.verify_succinct(vk, back, [g.pi for g in c.gates])


# -- aggregated proofs (HAP1) -------------------------------------------------


def _agg_instances():
    def tiny(a_val, b_val):
        c = Composer()
        a = c.append_witness(a_val)
        b = c.append_witness(b_val)
        c.gate_mul(Constraint().mult(1).a(a).b(b))
        c.gate_add(Constraint().left(1).a(a).right(1).b(b)
                   .public(-(a_val + b_val)))
        return c

    return [tiny(3, 5), tiny(2, 9), tiny(7, 11)]


@pytest.fixture(scope="module")
def agg_setup(setup):
    from hades252_tpu import aggregate

    _, pk, vk, _ = setup
    cs = _agg_instances()
    proof = aggregate.prove_aggregate(cs, pk)
    pis = [[g.pi for g in c.gates] for c in cs]
    return vk, proof, pis


def test_aggregate_roundtrip(agg_setup):
    from hades252_tpu import aggregate

    vk, proof, pis = agg_setup
    data = serialize.aggregate_to_bytes(proof, vk)
    assert len(data) == serialize.expected_aggregate_size(
        vk.n, vk.params, proof.n_instances
    )
    back = serialize.aggregate_from_bytes(data, vk)
    assert aggregate.verify_aggregate(vk, back, pis)
    assert serialize.aggregate_to_bytes(back, vk) == data


def test_aggregate_zk_roundtrip(zk_setup):
    from hades252_tpu import aggregate, fri

    c, pk, vk, _ = zk_setup
    cs = _agg_instances()
    proof = aggregate.prove_aggregate(cs, pk, rng=np.random.default_rng(3))
    pis = [[g.pi for g in ci.gates] for ci in cs]
    data = serialize.aggregate_to_bytes(proof, vk)
    assert len(data) == serialize.expected_aggregate_size(
        vk.n, vk.params, proof.n_instances,
        n_final=len(proof.fri.final_coeffs),
    )
    back = serialize.aggregate_from_bytes(data, vk)
    assert aggregate.verify_aggregate(vk, back, pis)


def test_aggregate_strict_rejections(agg_setup):
    vk, proof, pis = agg_setup
    data = serialize.aggregate_to_bytes(proof, vk)
    # bad magic
    with pytest.raises(ValueError, match="magic"):
        serialize.aggregate_from_bytes(b"XXXX" + data[4:], vk)
    # a succinct-proof blob is not an aggregate blob
    with pytest.raises(ValueError, match="magic"):
        serialize.aggregate_from_bytes(
            serialize.MAGIC_PROOF + data[4:], vk
        )
    # truncation / trailing bytes
    with pytest.raises(ValueError, match="truncated"):
        serialize.aggregate_from_bytes(data[:-1], vk)
    with pytest.raises(ValueError, match="trailing"):
        serialize.aggregate_from_bytes(data + b"\0", vk)
    # zero instances in the header
    hdr = bytearray(data)
    off = len(serialize.MAGIC_AGG) + serialize._AGG_HEADER.size - 4
    hdr[off:off + 4] = (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="at least one"):
        serialize.aggregate_from_bytes(bytes(hdr), vk)
    # header/key disagreement
    import dataclasses

    other = dataclasses.replace(vk, n=2 * vk.n)
    with pytest.raises(ValueError, match="disagrees"):
        serialize.aggregate_from_bytes(data, other)


def test_aggregate_tampered_byte_verifies_false(agg_setup):
    # flip one opened-value byte: decode still succeeds structurally,
    # verification catches it
    from hades252_tpu import aggregate

    vk, proof, pis = agg_setup
    data = bytearray(serialize.aggregate_to_bytes(proof, vk))
    # first wire opened value starts after roots/evals/key_evals/
    # layer_roots/final_coeffs
    n_scalars_before = (
        6 + proof.n_instances * 7 + 10
        + len(proof.fri.layer_roots) + len(proof.fri.final_coeffs)
    )
    off = len(serialize.MAGIC_AGG) + serialize._AGG_HEADER.size \
        + 32 * n_scalars_before
    data[off] ^= 1
    back = serialize.aggregate_from_bytes(bytes(data), vk)
    assert not aggregate.verify_aggregate(vk, back, pis)
