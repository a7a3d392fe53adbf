"""Device-resident succinct prover (fri_tpu.py): bit-identity with the
host prover in both plain and zk modes — the contract that lets the TPU
serve succinct proving while fri.prove_succinct stays the auditable
oracle."""

import numpy as np
import pytest

from hades252_tpu import fri, fri_tpu
from hades252_tpu.gadget import Composer, Constraint


def _circuit():
    c = Composer()
    a = c.append_witness(3)
    b = c.append_witness(5)
    c.gate_mul(Constraint().mult(1).a(a).b(b))
    c.gate_add(Constraint().left(1).a(a).right(1).b(b).public(-8))
    return c


def _assert_same(p1, p2):
    assert p1.roots == p2.roots
    assert p1.evals == p2.evals
    assert p1.fri.layer_roots == p2.fri.layer_roots
    assert p1.fri.final_coeffs == p2.fri.final_coeffs
    assert p1.fri.layer_values == p2.fri.layer_values
    assert p1.open_values == p2.open_values
    for k in p1.open_sibs:
        assert np.array_equal(p1.open_sibs[k], p2.open_sibs[k]), k
        assert np.array_equal(p1.open_poss[k], p2.open_poss[k]), k
    for a1, a2 in zip(p1.fri.layer_sibs, p2.fri.layer_sibs):
        assert np.array_equal(a1, a2)


@pytest.mark.parametrize("zk", [False, True])
def test_device_prover_bit_identical(zk):
    c = _circuit()
    pi = [g.pi for g in c.gates]
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8, zk=zk)
    pk, vk = fri.preprocess_succinct(c, params)
    host = fri.prove_succinct(c, pk, rng=np.random.default_rng(7))
    dev = fri_tpu.prove_succinct_device(c, pk,
                                        rng=np.random.default_rng(7))
    _assert_same(host, dev)
    assert fri.verify_succinct(vk, dev, pi)
    bad = list(pi)
    bad[-1] = bad[-1] + 1
    assert not fri.verify_succinct(vk, dev, bad)


def test_device_prover_batched(rng):
    # B instances through one device call sequence: each proof must be
    # bit-identical to the host prover's for its own (instance, rng).
    # clear_caches first: this test compiles a fresh batched-shape set on
    # top of the single-instance tests' executables, and XLA:CPU's
    # persistent-cache write segfaults once the live-executable count
    # grows too large (the diagnosed round-2 hazard, CLAUDE.md)
    import jax

    jax.clear_caches()
    cs = []
    for k in range(3):
        c = Composer()
        a = c.append_witness(3 + k)
        b = c.append_witness(5 + k)
        c.gate_mul(Constraint().mult(1).a(a).b(b))
        c.gate_add(Constraint().left(1).a(a).right(1).b(b)
                   .public(-(8 + 2 * k)))
        cs.append(c)
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8, zk=True)
    pk, vk = fri.preprocess_succinct(cs[0], params)
    devs = fri_tpu.prove_succinct_device_batch(
        cs, pk, rngs=[np.random.default_rng(100 + k) for k in range(3)]
    )
    for k, (c, dev) in enumerate(zip(cs, devs)):
        host = fri.prove_succinct(c, pk, rng=np.random.default_rng(100 + k))
        _assert_same(host, dev)
        assert fri.verify_succinct(vk, dev, [g.pi for g in c.gates])


def test_batched_rejects_mixed_circuits():
    c1 = _circuit()
    c2 = Composer()
    a = c2.append_witness(3)
    c2.gate_mul(Constraint().mult(1).a(a).b(a))  # different structure
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8)
    pk, _ = fri.preprocess_succinct(c1, params)
    with pytest.raises(ValueError, match="circuit structure"):
        fri_tpu.prove_succinct_device_batch([c1, c2], pk)
