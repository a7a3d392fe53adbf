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


@pytest.mark.parametrize("zk", [False, True])
def test_device_aggregate_bit_identical(zk):
    # the device aggregate prover must emit the exact AggregateProof the
    # host prover does for the same randomness stream (jax.clear_caches
    # first: fresh shape set on top of earlier executables — the
    # diagnosed XLA:CPU live-executable hazard, CLAUDE.md)
    import jax

    from hades252_tpu import aggregate

    jax.clear_caches()
    cs = []
    for k in range(3):
        c = Composer()
        a = c.append_witness(3 + k)
        b = c.append_witness(5 + 2 * k)
        c.gate_mul(Constraint().mult(1).a(a).b(b))
        c.gate_add(Constraint().left(1).a(a).right(1).b(b)
                   .public(-(8 + 3 * k)))
        cs.append(c)
    pis = [[g.pi for g in c.gates] for c in cs]
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8, zk=zk)
    pk, vk = fri.preprocess_succinct(cs[0], params)
    host = aggregate.prove_aggregate(cs, pk,
                                     rng=np.random.default_rng(21))
    dev = fri_tpu.prove_aggregate_device(cs, pk,
                                         rng=np.random.default_rng(21))
    assert dev.n_instances == host.n_instances
    assert dev.roots == host.roots
    assert dev.evals == host.evals
    assert dev.key_evals == host.key_evals
    assert dev.fri.layer_roots == host.fri.layer_roots
    assert dev.fri.final_coeffs == host.fri.final_coeffs
    assert dev.fri.layer_values == host.fri.layer_values
    assert dev.open_values == host.open_values
    assert dev.key_open_values == host.key_open_values
    for k_ in host.open_sibs:
        assert np.array_equal(dev.open_sibs[k_], host.open_sibs[k_]), k_
        assert np.array_equal(dev.open_poss[k_], host.open_poss[k_]), k_
    for k_ in host.key_open_sibs:
        assert np.array_equal(dev.key_open_sibs[k_],
                              host.key_open_sibs[k_]), k_
    for a1, a2 in zip(dev.fri.layer_sibs, host.fri.layer_sibs):
        assert np.array_equal(a1, a2)
    assert aggregate.verify_aggregate(vk, dev, pis)


def test_device_aggregate_rejects_mixed_circuits():
    c1 = _circuit()
    c2 = Composer()
    w = c2.append_witness(2)
    c2.gate_mul(Constraint().mult(1).a(w).b(w))
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8)
    pk, _ = fri.preprocess_succinct(c1, params)
    with pytest.raises(ValueError, match="circuit structure"):
        fri_tpu.prove_aggregate_device([c1, c2], pk)


# -- fused device internals (round-3 launch-count reduction) ------------------
# Through the axon relay every device call pays a round trip; the tree
# build, the openings, and the claimed evaluations are each ONE executable
# now (PERF.md). These tests pin the internals' bit-identity to the host
# reference paths on CPU (the fused tree body runs with the host perm —
# the same code object the TPU executable traces with permute_pallas).


def test_tree_levels_body_matches_host(rng):
    leaves_int = [int.from_bytes(rng.bytes(40), "little") % fri.P
                  for _ in range(2 * 16)]
    from hades252_tpu.utils.encoding import ints_to_digits

    leaves = ints_to_digits(leaves_int, shape=(2, 16))
    perm = fri.default_pcs_perm()

    def perm_rows(states):
        return np.asarray(perm(np.asarray(states, np.uint32)))

    host = [fri.tree_build_digits(np.asarray(leaves[i]), perm)
            for i in range(2)]
    # pad_to=8 exercises the canonical-block padding (levels with 8 and 2
    # nodes pad to 8); pad_to=1 is the unpadded body — digests identical
    for pad_to in (1, 8):
        fused = fri_tpu._tree_levels_body(np.asarray(leaves), perm_rows,
                                          pad_to=pad_to)
        for i in range(2):
            assert len(fused) == len(host[i])
            for lvl_f, lvl_h in zip(fused, host[i]):
                assert np.array_equal(np.asarray(lvl_f[i]), lvl_h)


def test_open_batched_dev_matches_host(rng):
    from hades252_tpu.utils.encoding import ints_to_digits

    leaves_int = [int.from_bytes(rng.bytes(40), "little") % fri.P
                  for _ in range(2 * 16)]
    leaves = ints_to_digits(leaves_int, shape=(2, 16))
    perm = fri.default_pcs_perm()
    host_levels = [fri.tree_build_digits(np.asarray(leaves[i]), perm)
                   for i in range(2)]
    stacked = [np.stack([host_levels[0][l], host_levels[1][l]])
               for l in range(len(host_levels[0]))]
    idx = np.asarray([[3, 7, 7], [0, 15, 2]])
    sibs, poss = fri_tpu._open_batched_dev(stacked, idx)
    for i in range(2):
        ref_sibs, ref_poss = fri.tree_open_batched(
            host_levels[i], list(idx[i])
        )
        assert np.array_equal(sibs[i], np.asarray(ref_sibs))
        assert np.array_equal(poss[i], np.asarray(ref_poss))


def test_eval_rows_dev_matches_poly_eval(rng):
    from hades252_tpu import plonk
    from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits

    b, r, ln = 2, 3, 13  # odd length exercises the reduction padding
    coeffs = [[[int.from_bytes(rng.bytes(40), "little") % fri.P
                for _ in range(ln)] for _ in range(r)] for _ in range(b)]
    pts = [[int.from_bytes(rng.bytes(40), "little") % fri.P
            for _ in range(r)] for _ in range(b)]
    vals = fri_tpu._eval_rows_dev(
        jnp_asarray(ints_to_digits(coeffs, shape=(b, r, ln))),
        jnp_asarray(ints_to_digits(pts, shape=(b, r))),
    )
    got = digits_to_ints(np.asarray(vals))
    for i in range(b):
        for j in range(r):
            assert int(got[i, j]) == plonk.poly_eval(coeffs[i][j],
                                                     pts[i][j])


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_chain_nodes_body_matches_host_loop(rng):
    """The fused verification chain (fri_tpu._chain_nodes_body) must give
    exactly the per-level host loop's verdicts through
    tree_verify_batched's chain_fn seam: valid openings accepted,
    tampered values rejected, out-of-range positions rejected."""
    leaves = [int.from_bytes(rng.bytes(40), "little") % fri.P
              for _ in range(16)]
    perm = fri.default_pcs_perm()
    levels = fri.tree_build(leaves, perm)
    root = fri.tree_root(levels)
    h = len(levels) - 1
    idx = [3, 7, 12]
    sibs, poss = fri.tree_open_batched(levels, idx)
    values = [leaves[i] for i in idx]

    def perm_rows(states):
        return np.asarray(perm(np.asarray(states, np.uint32)))

    def chain(node, sibs_, poss_):
        # pad_to=8 exercises the canonical-block padding on CPU
        return fri_tpu._chain_nodes_body(
            np.asarray(node), np.asarray(sibs_),
            np.asarray(poss_), perm_rows, pad_to=8)

    ok_loop = fri.tree_verify_batched(root, values, sibs, poss, h, idx,
                                      perm)
    ok_chain = fri.tree_verify_batched(root, values, sibs, poss, h, idx,
                                       perm, chain)
    assert np.array_equal(ok_loop, ok_chain) and bool(np.all(ok_chain))

    bad = list(values)
    bad[1] = (bad[1] + 1) % fri.P
    ok_bad = fri.tree_verify_batched(root, bad, sibs, poss, h, idx,
                                     perm, chain)
    assert list(ok_bad) == [True, False, True]

    poss_bad = np.asarray(poss).copy()
    poss_bad[0, 0] = fri.ARITY  # out of range: clipped in-chain,
    assert not fri.tree_verify_batched(  # rejected by the host range check
        root, values, sibs, poss_bad, h, idx, perm, chain)[0]


def test_verify_succinct_device_batch_cpu_fallback(rng):
    """On non-TPU backends verify_succinct_device_batch IS the host
    pooled path — verdicts identical to verify_succinct per proof."""
    c = _circuit()
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8)
    pk, vk = fri.preprocess_succinct(c, params)
    proof = fri.prove_succinct(c, pk)
    pi = [g.pi for g in c.gates]
    verd = fri_tpu.verify_succinct_device_batch(vk, [proof, proof],
                                                [pi, pi])
    assert bool(np.all(verd))


def test_verify_aggregate_chain_fn_matches_host():
    """verify_aggregate through the chain seam (fused chain body on the
    emulated perm) must match the plain host path, including rejection."""
    from hades252_tpu import aggregate

    cs = []
    for k in range(2):
        c = Composer()
        a = c.append_witness(3 + k)
        b = c.append_witness(5 + k)
        c.gate_mul(Constraint().mult(1).a(a).b(b))
        c.gate_add(Constraint().left(1).a(a).right(1).b(b)
                   .public(-(8 + 2 * k)))
        cs.append(c)
    pis = [[g.pi for g in c.gates] for c in cs]
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8)
    pk, vk = fri.preprocess_succinct(cs[0], params)
    agg = aggregate.prove_aggregate(cs, pk)

    perm = fri.default_pcs_perm()

    def perm_rows(states):
        return np.asarray(perm(np.asarray(states, np.uint32)))

    def chain(node, sibs_, poss_):
        return fri_tpu._chain_nodes_body(
            np.asarray(node), np.asarray(sibs_),
            np.asarray(poss_), perm_rows, pad_to=8)

    assert aggregate.verify_aggregate(vk, agg, pis, chain_fn=chain)
    bad_pis = [list(pis[0]), list(pis[1])]
    bad_pis[0][-1] += 1
    assert not aggregate.verify_aggregate(vk, agg, bad_pis,
                                          chain_fn=chain)
    # CPU fallback entry point is the host path
    assert fri_tpu.verify_aggregate_device(vk, agg, pis)


def test_fri_phase_body_matches_host_chain(rng):
    """The fused FRI commit phase (in-trace transcript + folds + trees,
    fri_tpu._fri_phase_body) must replicate the host chain exactly:
    challenge -> fold_evals -> tree root -> absorb per fold, and the
    returned sponge state must continue the host Transcript stream."""
    import jax.numpy as jnp

    from hades252_tpu import plonk
    from hades252_tpu.fri_tpu import (_fri_phase_body, _scalar_mont,
                                      _xinv_mont)
    from hades252_tpu.params import P
    from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits

    b, m0, n_folds = 2, 32, 3
    evals_int = [[int.from_bytes(rng.bytes(40), "little") % P
                  for _ in range(m0)] for _ in range(b)]

    # host reference: independent transcripts with distinct histories
    trs = [plonk.Transcript() for _ in range(b)]
    for i, tr in enumerate(trs):
        tr.absorb(1000 + i)
    host_states0 = [tr.state for tr in trs]

    perm = fri.default_pcs_perm()
    host_layers, host_roots = [], []
    host_evals = [list(e) for e in evals_int]
    shift = fri.G0
    for k in range(1, n_folds + 1):
        betas = [tr.challenge() for tr in trs]
        host_evals = [fri.fold_evals(e, shift, beta)
                      for e, beta in zip(host_evals, betas)]
        shift = shift * shift % P
        if k < n_folds:
            lvs = [fri.tree_build(e, perm) for e in host_evals]
            roots = [fri.tree_root(lv) for lv in lvs]
            host_layers.append(host_evals)
            host_roots.append(roots)
            for tr, rt in zip(trs, roots):
                tr.absorb(rt)

    # fused body on the emulated perm (pad_to exercises padding)
    def perm_rows(states):
        return np.asarray(perm(np.asarray(states, np.uint32)))

    xinvs, shift2, size = [], fri.G0, m0
    for _ in range(n_folds):
        xinvs.append(_xinv_mont(size, shift2))
        shift2 = shift2 * shift2 % P
        size //= 2
    f0 = jnp.asarray(ints_to_digits(evals_int, shape=(b, m0)))
    tr_state0 = jnp.asarray(ints_to_digits(host_states0, shape=(b, 5)))
    cur, tr_state, layer_evals, layer_levels = _fri_phase_body(
        f0, tr_state0, tuple(xinvs),
        jnp.asarray(_scalar_mont((P + 1) // 2)), perm_rows, pad_to=8,
    )
    got_final = digits_to_ints(np.asarray(cur))
    for i in range(b):
        assert [int(v) for v in got_final[i]] == host_evals[i]
    for k, (ev, lv) in enumerate(zip(layer_evals, layer_levels)):
        got = digits_to_ints(np.asarray(ev))
        for i in range(b):
            assert [int(v) for v in got[i]] == host_layers[k][i]
        got_roots = digits_to_ints(np.asarray(lv[-1][:, 0]))
        assert [int(v) for v in got_roots] == host_roots[k]
    got_states = digits_to_ints(np.asarray(tr_state))
    for i in range(b):
        assert [int(v) for v in got_states[i]] == trs[i].state
        # the synced host transcript continues the stream identically
        resumed = plonk.Transcript()
        resumed.set_state([int(v) for v in got_states[i]])
        assert resumed.challenge() == trs[i].challenge()
