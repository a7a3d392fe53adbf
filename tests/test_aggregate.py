"""Aggregated succinct proofs (aggregate.py): one argument for B
same-circuit instances, sharing every Merkle path and the FRI argument.

The reference ships one dusk-plonk proof per instance
(src/strategies/gadget.rs:198-223); aggregation is the batch-serving
extension — the tests pin the capability claims: same VerifyingKey as
single proofs, all-or-nothing rejection, statement binding per instance,
and measured sublinear size in B.
"""

import numpy as np
import pytest

from hades252_tpu import aggregate, fri
from hades252_tpu.gadget import Composer, Constraint
from hades252_tpu.params import P

PARAMS = fri.FriParams(blowup=4, n_queries=6, final_degree=16, pow_bits=2)


def _tiny(a_val: int, b_val: int) -> Composer:
    """a*b allocated, then a + b + pi = 0 with pi = -(a+b): one shared
    structure, per-instance witnesses AND public inputs."""
    c = Composer()
    a = c.append_witness(a_val)
    b = c.append_witness(b_val)
    c.gate_mul(Constraint().mult(1).a(a).b(b))
    c.gate_add(Constraint().left(1).a(a).right(1).b(b)
               .public(-(a_val + b_val)))
    return c


@pytest.fixture(scope="module")
def agg_setup():
    pk, vk = fri.preprocess_succinct(_tiny(3, 5), PARAMS)
    return pk, vk


def _pis(composers):
    return [[g.pi for g in c.gates] for c in composers]


def test_aggregate_roundtrip(agg_setup):
    pk, vk = agg_setup
    cs = [_tiny(3, 5), _tiny(2, 6), _tiny(7, 11)]
    proof = aggregate.prove_aggregate(cs, pk)
    assert aggregate.verify_aggregate(vk, proof, _pis(cs))


def test_aggregate_single_instance_degenerates(agg_setup):
    # B=1: block size 1, no bottom subtree — still a valid argument
    pk, vk = agg_setup
    cs = [_tiny(4, 9)]
    proof = aggregate.prove_aggregate(cs, pk)
    assert proof.n_instances == 1
    assert aggregate.verify_aggregate(vk, proof, _pis(cs))


def test_aggregate_same_vk_verifies_single_proofs(agg_setup):
    # the aggregated argument reuses the single-proof VerifyingKey
    pk, vk = agg_setup
    c = _tiny(3, 5)
    single = fri.prove_succinct(c, pk)
    assert fri.verify_succinct(vk, single, [g.pi for g in c.gates])
    proof = aggregate.prove_aggregate([c, _tiny(2, 6)], pk)
    assert aggregate.verify_aggregate(
        vk, proof, _pis([c, _tiny(2, 6)])
    )


def test_aggregate_rejects_tampered_eval(agg_setup):
    pk, vk = agg_setup
    cs = [_tiny(3, 5), _tiny(2, 6)]
    proof = aggregate.prove_aggregate(cs, pk)
    proof.evals[1]["a"] = (proof.evals[1]["a"] + 1) % P
    assert not aggregate.verify_aggregate(vk, proof, _pis(cs))


def test_aggregate_rejects_wrong_public_inputs(agg_setup):
    # statement binding is per instance: perturbing ONE instance's PI
    # rejects the whole aggregate
    pk, vk = agg_setup
    cs = [_tiny(3, 5), _tiny(2, 6)]
    proof = aggregate.prove_aggregate(cs, pk)
    pis = _pis(cs)
    assert aggregate.verify_aggregate(vk, proof, pis)
    pis[0][-1] = (pis[0][-1] + 1) % P
    assert not aggregate.verify_aggregate(vk, proof, pis)


def test_aggregate_rejects_swapped_instances(agg_setup):
    # the transcript binds instance ORDER: swapping two instances'
    # (distinct) public inputs must not verify
    pk, vk = agg_setup
    cs = [_tiny(3, 5), _tiny(2, 9)]
    proof = aggregate.prove_aggregate(cs, pk)
    pis = _pis(cs)
    assert not aggregate.verify_aggregate(vk, proof, [pis[1], pis[0]])


def test_aggregate_rejects_tampered_opening(agg_setup):
    pk, vk = agg_setup
    cs = [_tiny(3, 5), _tiny(2, 6)]
    proof = aggregate.prove_aggregate(cs, pk)
    blocks = [list(b) for b in proof.open_blocks["z"]]
    blocks[0][1] = (blocks[0][1] + 1) % P
    proof.open_blocks["z"] = blocks
    assert not aggregate.verify_aggregate(vk, proof, _pis(cs))


def test_aggregate_rejects_wrong_instance_count(agg_setup):
    pk, vk = agg_setup
    cs = [_tiny(3, 5), _tiny(2, 6)]
    proof = aggregate.prove_aggregate(cs, pk)
    assert not aggregate.verify_aggregate(vk, proof, _pis(cs)[:1])
    proof.n_instances = 3
    assert not aggregate.verify_aggregate(vk, proof, _pis(cs) + [[0, 0]])


def test_aggregate_mixed_structure_raises(agg_setup):
    pk, _ = agg_setup
    other = Composer()
    w = other.append_witness(2)
    other.gate_mul(Constraint().mult(1).a(w).b(w))
    with pytest.raises(ValueError, match="circuit structure"):
        aggregate.prove_aggregate([_tiny(3, 5), other], pk)


def test_aggregate_empty_raises(agg_setup):
    pk, _ = agg_setup
    with pytest.raises(ValueError, match="at least one"):
        aggregate.prove_aggregate([], pk)


def test_aggregate_unsatisfied_instance_cannot_prove(agg_setup):
    pk, _ = agg_setup
    bad = _tiny(3, 5)
    # extra structure-breaking gate would fail the structure check, so
    # corrupt the witness value behind an existing wire instead
    bad._values[0] = (bad._values[0] + 1) % P
    with pytest.raises(ValueError, match="does not satisfy"):
        aggregate.prove_aggregate([_tiny(2, 6), bad], pk)


def test_aggregate_size_sublinear(agg_setup):
    # the whole point: paths + FRI are paid once, so the per-instance
    # marginal cost is tiny compared to a full proof
    pk, vk = agg_setup
    single = fri.prove_succinct(_tiny(3, 5), pk)
    s1 = fri.proof_size_field_elements(single)
    cs = [_tiny(k + 2, k + 3) for k in range(4)]
    proof = aggregate.prove_aggregate(cs, pk)
    s4 = aggregate.aggregate_size_field_elements(proof)
    a1 = aggregate.aggregate_size_field_elements(
        aggregate.prove_aggregate(cs[:1], pk)
    )
    assert aggregate.verify_aggregate(vk, proof, _pis(cs))
    # 4 aggregated instances cost far less than 4 separate proofs...
    assert s4 < 2 * s1
    # ...and the marginal instance carries no Merkle digests: only
    # evals (7) + its opened block columns (4 wire + z + t, both sides).
    # The two aggregates run different transcripts, so their pruned
    # multiproof node counts differ by a few digests — allow that noise.
    marginal = (s4 - a1) / 3
    assert marginal <= 7 + 12 * PARAMS.n_queries + 16


def test_aggregate_zk_roundtrip():
    params = fri.FriParams(blowup=4, n_queries=6, final_degree=16,
                           zk=True)
    pk, vk = fri.preprocess_succinct(_tiny(3, 5), params)
    cs = [_tiny(3, 5), _tiny(2, 6)]
    proof = aggregate.prove_aggregate(cs, pk,
                                      rng=np.random.default_rng(7))
    assert aggregate.verify_aggregate(vk, proof, _pis(cs))
    # blinded openings from two equal-witness instances still differ
    same = [_tiny(3, 5), _tiny(3, 5)]
    p2 = aggregate.prove_aggregate(same, pk,
                                   rng=np.random.default_rng(8))
    assert aggregate.verify_aggregate(vk, p2, _pis(same))
    # wire a's instance columns are the first two of each side
    lo0 = [b[0] for b in p2.open_blocks["w"]]
    lo1 = [b[1] for b in p2.open_blocks["w"]]
    assert lo0 != lo1


def test_aggregate_security_bits():
    # the union bound over instances only touches the (never-binding)
    # field term: production parameters keep the full query soundness
    prod = fri.FriParams()
    assert aggregate.aggregate_security_bits(prod, 1024, 1) == \
        prod.security_bits(1024)
    assert aggregate.aggregate_security_bits(prod, 1024, 1 << 20) == \
        prod.security_bits(1024)  # still query-bound at B = 1M
    # the field term does decrease by ~log2(B)
    import math

    f1 = math.log2(fri.P / (5 * 1024))
    fB = math.log2(fri.P / (5 * 1024 * 256))
    assert abs((f1 - fB) - 8) < 1e-9
    # the proven figure is reported too, with the same union-bound shape
    assert aggregate.aggregate_security_bits(prod, 1024, 4, proven=True) \
        == prod.proven_security_bits(1024)
