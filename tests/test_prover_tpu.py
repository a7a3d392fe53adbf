"""Batched device prover (prover_tpu.py): proofs bit-identical to
plonk.prove per instance — the contract that lets the TPU path serve
production proving while the host path stays the auditable oracle.
"""

import pytest

from hades252_tpu import plonk, prover_tpu
from hades252_tpu.gadget import Composer, Constraint
from hades252_tpu.params import P


def _instance(v1, v2):
    c = Composer()
    a = c.append_witness(v1)
    b = c.append_witness(v2)
    c.gate_mul(Constraint().mult(1).a(a).b(b))
    c.gate_add(
        Constraint().left(1).a(a).right(1).b(b).public(-((v1 + v2) % P))
    )
    return c


def test_batched_prover_bit_identical(rng):
    composers = [_instance(3, 5), _instance(11, 13), _instance(2**200, 7)]
    key = plonk.preprocess(composers[0])
    proofs = prover_tpu.prove_batched(composers, key)
    for c, pr in zip(composers, proofs):
        host = plonk.prove(c, key)
        assert pr.wires == host.wires
        assert pr.z == host.z
        assert pr.t == host.t
        assert pr.commitments == host.commitments
        assert plonk.verify(key, pr, [g.pi for g in c.gates])


def test_batched_prover_rejects_mixed_circuits():
    c1 = _instance(3, 5)
    c2 = Composer()
    a = c2.append_witness(3)
    c2.gate_mul(Constraint().mult(1).a(a).b(a))  # different structure
    with pytest.raises(ValueError, match="circuit structure"):
        prover_tpu.prove_batched([c1, c2])


def test_batched_prover_empty():
    assert prover_tpu.prove_batched([]) == []
