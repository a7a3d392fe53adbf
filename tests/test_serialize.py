"""Proof / verifier-key wire format (serialize.py).

Reference parity: dusk-plonk's `Proof`/verifier data are `Serializable`
(`to_bytes`/`from_bytes`) — the cycle the reference exercises at
src/strategies/gadget.rs:198-223 hands proofs around as bytes. These
tests pin the round-trip, the size bound, and the strict rejection
paths (truncation, trailing bytes, bad magic, non-canonical scalars,
impossible pruned-node counts, key/header disagreement) of the HSP2
layout — which ships NO Merkle positions and no derivable digest.
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
        c, fri.FriParams(blowup=8, n_queries=8, final_degree=8, pow_bits=3)
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
    # the size bound assumes zero multiproof merging; real proofs fit in it
    assert len(data) <= serialize.expected_proof_size(vk.n, vk.params)
    back = serialize.proof_from_bytes(data, vk)
    assert fri.verify_succinct(vk, back, [g.pi for g in c.gates])
    # deterministic: re-serializing the decoded proof is byte-identical
    assert serialize.proof_to_bytes(back, vk) == data


def test_zk_proof_roundtrip(zk_setup):
    c, pk, vk, proof = zk_setup
    data = serialize.proof_to_bytes(proof, vk)
    assert len(data) <= serialize.expected_proof_size(
        vk.n, vk.params, n_final=len(proof.fri.final_coeffs)
    )
    back = serialize.proof_from_bytes(data, vk)
    assert back.evals["r"] == proof.evals["r"]
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
    # the v1 magic is not silently accepted either
    data[:4] = b"HSP1"
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


def test_impossible_node_count_rejected(setup):
    # the pruned node sets carry explicit u32 counts; a count larger than
    # any valid plan must be rejected before allocation
    _, _, vk, proof = setup
    data = bytearray(serialize.proof_to_bytes(proof, vk))
    blob = serialize.proof_to_bytes(proof, vk)
    # locate the first node-count u32: after header, roots, evals,
    # layer_roots, final_coeffs, nonce, u16, and the w-tree's blocks
    schema = fri.proof_schema(vk.n, vk.params)
    u0 = len(proof.open_blocks["w"])
    bs_w = 2 * len(fri.tree_columns(vk.params.zk)["w"])
    off = (len(serialize.MAGIC_PROOF) + serialize._PROOF_HEADER.size
           + 32 * (3 + len(fri.eval_order(vk.params.zk))
                   + len(schema["sched"])
                   + len(proof.fri.final_coeffs))
           + 8 + 2 + u0 * bs_w * 32)
    count = int.from_bytes(blob[off : off + 4], "little")
    assert count == np.asarray(proof.open_nodes["w"]).shape[0]
    data[off : off + 4] = (10 ** 6).to_bytes(4, "little")
    with pytest.raises(ValueError, match="larger than any valid plan"):
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
    from dataclasses import replace

    _, _, vk, proof = setup
    # wrong-shape block set refuses to serialize
    blocks = {k: [list(b) for b in v] for k, v in proof.open_blocks.items()}
    blocks["w"][0] = blocks["w"][0][:-1]
    with pytest.raises(ValueError, match="opened-block set"):
        serialize.proof_to_bytes(replace(proof, open_blocks=blocks), vk)
    # oversized pruned node set refuses to serialize
    big = np.zeros((10 ** 4, 16), np.uint32)
    nodes = dict(proof.open_nodes)
    nodes["w"] = big
    with pytest.raises(ValueError, match="larger than any valid plan"):
        serialize.proof_to_bytes(replace(proof, open_nodes=nodes), vk)
    # missing commitment root refuses to serialize
    roots = dict(proof.roots)
    del roots["z"]
    with pytest.raises(ValueError, match="missing commitment root"):
        serialize.proof_to_bytes(replace(proof, roots=roots), vk)


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


def test_tampered_nonce_bytes_verify_false(setup):
    # the PoW nonce travels as 8 raw bytes; flipping it decodes fine but
    # the verifier's grinding gate rejects
    c, _, vk, proof = setup
    schema = fri.proof_schema(vk.n, vk.params)
    data = bytearray(serialize.proof_to_bytes(proof, vk))
    off = (len(serialize.MAGIC_PROOF) + serialize._PROOF_HEADER.size
           + 32 * (3 + len(fri.eval_order(vk.params.zk))
                   + len(schema["sched"])
                   + len(proof.fri.final_coeffs)))
    assert int.from_bytes(data[off : off + 8], "little") == proof.pow_nonce
    data[off] ^= 1
    back = serialize.proof_from_bytes(bytes(data), vk)
    assert not fri.verify_succinct(vk, back, [g.pi for g in c.gates])


# -- aggregated proofs (HAP2) -------------------------------------------------


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
    assert len(data) <= serialize.expected_aggregate_size(
        vk.n, vk.params, proof.n_instances
    )
    back = serialize.aggregate_from_bytes(data, vk)
    assert aggregate.verify_aggregate(vk, back, pis)
    assert serialize.aggregate_to_bytes(back, vk) == data


def test_aggregate_zk_roundtrip(zk_setup):
    from hades252_tpu import aggregate

    c, pk, vk, _ = zk_setup
    cs = _agg_instances()
    proof = aggregate.prove_aggregate(cs, pk, rng=np.random.default_rng(3))
    pis = [[g.pi for g in ci.gates] for ci in cs]
    data = serialize.aggregate_to_bytes(proof, vk)
    assert len(data) <= serialize.expected_aggregate_size(
        vk.n, vk.params, proof.n_instances,
        n_final=len(proof.fri.final_coeffs),
    )
    back = serialize.aggregate_from_bytes(data, vk)
    assert back.r_eval == proof.r_eval
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
    schema = fri.proof_schema(vk.n, vk.params)
    data = bytearray(serialize.aggregate_to_bytes(proof, vk))
    # first w-tree opened value starts after roots/evals/key_evals/
    # layer_roots/final_coeffs + the nonce and count fields
    n_scalars_before = (
        3 + proof.n_instances * 7 + 10
        + len(schema["sched"]) + len(proof.fri.final_coeffs)
    )
    off = (len(serialize.MAGIC_AGG) + serialize._AGG_HEADER.size
           + 32 * n_scalars_before + 8 + 2)
    data[off] ^= 1
    back = serialize.aggregate_from_bytes(bytes(data), vk)
    assert not aggregate.verify_aggregate(vk, back, pis)


def test_proof_byte_breakdown_sums_to_total(setup, zk_setup):
    # the per-section report must account for every wire byte exactly
    for c, pk, vk, proof in (setup, zk_setup):
        bd = serialize.proof_byte_breakdown(proof, vk)
        assert bd["total"] == len(serialize.proof_to_bytes(proof, vk))
        assert set(bd["tree_blocks"]) == set(serialize.TREE_ORDER)
        assert len(bd["fri_layer_blocks"]) == len(bd["fri_layer_nodes"])
        assert all(v > 0 for v in bd["tree_nodes"].values())
