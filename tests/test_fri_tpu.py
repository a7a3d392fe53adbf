"""Device-resident succinct prover (fri_tpu.py): bit-identity with the
host prover in both plain and zk modes — the contract that lets the TPU
serve succinct proving while fri.prove_succinct stays the auditable
oracle. The HSP2 layout adds grinding nonces, pruned multiproof node
sets, and quad-block FRI layers to the identity surface."""

import numpy as np
import pytest

from hades252_tpu import fri, fri_tpu
from hades252_tpu.gadget import Composer, Constraint

#: slow tier (VERDICT r4 next #7): compile-heavy on the 1-core dev
#: host; skip with `-m "not slow"` for fast iteration (CI runs all).
pytestmark = pytest.mark.slow

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
    assert p1.pow_nonce == p2.pow_nonce
    assert p1.fri.layer_roots == p2.fri.layer_roots
    assert p1.fri.final_coeffs == p2.fri.final_coeffs
    assert p1.fri.layer_blocks == p2.fri.layer_blocks
    assert p1.open_blocks == p2.open_blocks
    for k in p1.open_nodes:
        assert np.array_equal(p1.open_nodes[k], p2.open_nodes[k]), k
    for a1, a2 in zip(p1.fri.layer_nodes, p2.fri.layer_nodes):
        assert np.array_equal(a1, a2)


@pytest.mark.parametrize("zk", [False, True])
def test_device_prover_bit_identical(zk):
    c = _circuit()
    pi = [g.pi for g in c.gates]
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8,
                           pow_bits=3, zk=zk)
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
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8,
                           pow_bits=2, zk=True)
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
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8,
                           pow_bits=2, zk=zk)
    pk, vk = fri.preprocess_succinct(cs[0], params)
    host = aggregate.prove_aggregate(cs, pk,
                                     rng=np.random.default_rng(21))
    dev = fri_tpu.prove_aggregate_device(cs, pk,
                                         rng=np.random.default_rng(21))
    assert dev.n_instances == host.n_instances
    assert dev.roots == host.roots
    assert dev.evals == host.evals
    assert dev.key_evals == host.key_evals
    assert dev.r_eval == host.r_eval
    assert dev.pow_nonce == host.pow_nonce
    assert dev.fri.layer_roots == host.fri.layer_roots
    assert dev.fri.final_coeffs == host.fri.final_coeffs
    assert dev.fri.layer_blocks == host.fri.layer_blocks
    assert dev.open_blocks == host.open_blocks
    for k_ in host.open_nodes:
        assert np.array_equal(dev.open_nodes[k_], host.open_nodes[k_]), k_
    for a1, a2 in zip(dev.fri.layer_nodes, host.fri.layer_nodes):
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


# -- fused device internals ----------------------------------------------------
# Through the axon relay every device call pays a round trip; each tree
# build (block sponge + all levels), the FRI phase, the grinding windows,
# and the opening gathers are each ONE executable. These tests pin the
# internals' bit-identity to the host reference paths on CPU (the fused
# bodies run with the host perm — the same code objects the TPU
# executables trace with permute_pallas).


def _perm_rows():
    perm = fri.default_pcs_perm()

    def perm_rows(states):
        return np.asarray(perm(np.asarray(states, np.uint32)))

    return perm, perm_rows


def test_tree_levels_body_matches_host(rng):
    leaves_int = [int.from_bytes(rng.bytes(40), "little") % fri.P
                  for _ in range(2 * 16)]
    from hades252_tpu.utils.encoding import ints_to_digits

    leaves = ints_to_digits(leaves_int, shape=(2, 16))
    perm, perm_rows = _perm_rows()
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


def test_block_tree_body_matches_host(rng):
    # the fused paired-block tree (sponge leaf digests + levels) must
    # equal fri._commit_paired for the same columns
    from hades252_tpu.utils.encoding import ints_to_digits

    perm, perm_rows = _perm_rows()
    m0, n_cols = 32, 3
    cols_int = [[int.from_bytes(rng.bytes(40), "little") % fri.P
                 for _ in range(m0)] for _ in range(n_cols)]
    host_levels = fri._commit_paired(cols_int, perm)
    cols = ints_to_digits(cols_int, shape=(n_cols, m0))[None]
    for pad_to in (1, 8):
        fused = fri_tpu._block_tree_body(
            np.asarray(fri_tpu._paired_blocks_dev(jnp_asarray(cols))),
            perm_rows, pad_to)
        assert len(fused) == len(host_levels)
        for lvl_f, lvl_h in zip(fused, host_levels):
            assert np.array_equal(np.asarray(lvl_f[0]), lvl_h)


def test_open_helpers_match_host(rng):
    # _open_blocks_dev / _open_nodes_dev against fri._open_paired
    from hades252_tpu.utils.encoding import ints_to_digits

    perm, _ = _perm_rows()
    m0, n_cols, q = 64, 2, 5
    cols_int = [[int.from_bytes(rng.bytes(40), "little") % fri.P
                 for _ in range(m0)] for _ in range(n_cols)]
    levels = fri._commit_paired(cols_int, perm)
    s0 = [1, 7, 30]
    host_blocks, host_nodes = fri._open_paired(cols_int, levels, s0)
    cols = ints_to_digits(cols_int, shape=(n_cols, m0))[None]
    dev_blocks = fri_tpu._open_blocks_dev(cols, [s0], q)[0]
    assert dev_blocks == host_blocks
    stacked = [lvl[None] for lvl in levels]
    dev_nodes = fri_tpu._open_nodes_dev(stacked, [s0])[0]
    assert np.array_equal(dev_nodes, host_nodes)


def test_fused_pooled_verifier_matches_host(rng):
    """The fused single-executable verifier phase (_fused_verify_plan +
    _fused_pool_body) must produce verdicts identical to the host pooled
    path (fri.pooled_entries_verify) — on honest proofs AND on tampered
    ones that reach the Merkle phase (pruned-node substitution, swapped
    opened blocks, wrong root)."""
    from dataclasses import replace

    c = _circuit()
    pi = [g.pi for g in c.gates]
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8,
                           pow_bits=2, zk=True)
    pk, vk = fri.preprocess_succinct(c, params)
    good = fri.prove_succinct(c, pk, rng=np.random.default_rng(11))
    good2 = fri.prove_succinct(c, pk, rng=np.random.default_rng(12))

    # pruned-path substitution: corrupt one supplied multiproof digit
    nodes = {k: np.array(v, copy=True) for k, v in good.open_nodes.items()}
    nodes["w"][0, 0] ^= 1
    bad_nodes = replace(good, open_nodes=nodes)
    # swapped opened blocks (same multiset, wrong positions)
    blocks = dict(good.open_blocks)
    w = [list(b) for b in blocks["w"]]
    w[0], w[1] = w[1], w[0]
    blocks["w"] = [tuple(b) for b in w]
    bad_blocks = replace(good, open_blocks=blocks)
    # wrong claimed eval (dies at the zeta identity, before the pool)
    evals = dict(good.evals)
    evals["a"] = (evals["a"] + 1) % fri.P
    bad_eval = replace(good, evals=evals)

    proofs = [good, bad_nodes, good2, bad_blocks, bad_eval]
    pis = [pi] * len(proofs)
    host = fri.verify_succinct_batched(vk, proofs, pis)

    def eager_pool(leaf_blocks, nodes_lvls, sels, root_sels):
        _, perm_rows = _perm_rows()
        return fri_tpu._fused_pool_body(leaf_blocks, nodes_lvls, sels,
                                        root_sels, perm_rows, pad_to=1)

    fused = fri.verify_succinct_batched(
        vk, proofs, pis,
        entries_check=fri_tpu.fused_entries_check(vk, pool_fn=eager_pool),
    )
    assert np.array_equal(host, fused)
    assert list(host) == [True, False, True, False, False]
    # the canonical-block padding path must not change any digest
    def eager_pool_padded(leaf_blocks, nodes_lvls, sels, root_sels):
        _, perm_rows = _perm_rows()
        return fri_tpu._fused_pool_body(leaf_blocks, nodes_lvls, sels,
                                        root_sels, perm_rows, pad_to=8)

    fused_pad = fri.verify_succinct_batched(
        vk, [good, good2], [pi, pi],
        entries_check=fri_tpu.fused_entries_check(
            vk, pool_fn=eager_pool_padded),
    )
    assert list(fused_pad) == [True, True]


def test_deep_dev_chunked_matches_unchunked(rng, monkeypatch):
    """_deep_dev streams m0 > DEEP_CHUNK through lax.map slabs (the v5e
    OOM fix at n=2^14, tools/bench_r4_scaling.log); the composition is
    pointwise along m0 so the chunked output must be bit-identical."""
    import jax.numpy as jnp

    from hades252_tpu.params import P
    from hades252_tpu.utils.encoding import ints_to_digits

    def rand(shape):
        k = int(np.prod(shape))
        vals = [int.from_bytes(rng.bytes(40), "little") % P
                for _ in range(k)]
        return jnp.asarray(ints_to_digits(vals, shape=shape))

    b, t_rows, m0, s = 2, 3, 16, 2
    stack = rand((b, t_rows, m0))
    vs = rand((b, 3))
    gammas = rand((b, 3))
    pows = rand((s, m0))
    inv_a = rand((b, m0))
    inv_b = rand((b, m0))
    spec = ((0, 0, False), (1, 1, True), (2, 0, False))
    full = np.asarray(fri_tpu._deep_terms_chunk(
        stack, vs, gammas, pows, inv_a, inv_b, spec
    ))
    monkeypatch.setattr(fri_tpu, "DEEP_CHUNK", 4)
    chunked = np.asarray(fri_tpu._deep_dev(
        stack, vs, gammas, pows, inv_a, inv_b, spec
    ))
    assert np.array_equal(full, chunked)


def test_fused_plan_shapes_stable_across_query_sets(rng):
    """One executable must serve EVERY query set: _fused_verify_plan's
    output array shapes depend only on (entry count, heights, block
    widths, q_cap) — never on the actual transcript-derived indices.
    A fresh shape through the relay is a fresh server-side compile, so a
    shape that varied with the queries would recompile per proof."""
    c = _circuit()
    pi = [g.pi for g in c.gates]
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8,
                           pow_bits=2, zk=True)
    pk, vk = fri.preprocess_succinct(c, params)

    def plan_shapes(seed):
        proof = fri.prove_succinct(c, pk, rng=np.random.default_rng(seed))
        shapes = {}

        def probe(entries):
            lb, nl, sl, rs, _own = fri_tpu._fused_verify_plan(
                entries, vk.params.n_queries
            )
            shapes["v"] = (
                tuple(b.shape for b in lb),
                tuple(x.shape for x in nl),
                tuple(s.shape for s in sl),
                tuple(r.shape for r in rs),
            )
            return fri.pooled_entries_verify(entries, fri.default_pcs_perm())

        assert fri.verify_succinct_batched(vk, [proof], [pi],
                                           entries_check=probe)[0]
        return shapes["v"]

    # different witnesses/rng -> different roots -> different transcript
    # challenges -> different query indices; shapes must not move
    s1, s2, s3 = plan_shapes(1), plan_shapes(2), plan_shapes(3)
    assert s1 == s2 == s3


def test_fused_pooled_verifier_aggregate(rng):
    """verify_aggregate through the fused backend: same verdict as the
    host pooled path on the honest aggregate and on a tampered node."""
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
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8,
                           pow_bits=2, zk=True)
    pk, vk = fri.preprocess_succinct(cs[0], params)
    agg = aggregate.prove_aggregate(cs, pk, rng=np.random.default_rng(5))

    def eager_pool(leaf_blocks, nodes_lvls, sels, root_sels):
        _, perm_rows = _perm_rows()
        return fri_tpu._fused_pool_body(leaf_blocks, nodes_lvls, sels,
                                        root_sels, perm_rows, pad_to=1)

    check = fri_tpu.fused_entries_check(vk, pool_fn=eager_pool)
    assert aggregate.verify_aggregate(vk, agg, pis)
    assert aggregate.verify_aggregate(vk, agg, pis, entries_check=check)

    from dataclasses import replace

    nodes = {k: np.array(v, copy=True) for k, v in agg.open_nodes.items()}
    nodes["z"][0, 0] ^= 1
    bad = replace(agg, open_nodes=nodes)
    assert not aggregate.verify_aggregate(vk, bad, pis)
    assert not aggregate.verify_aggregate(vk, bad, pis,
                                          entries_check=check)


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


def test_grind_window_dev_matches_host():
    # the device window search must find exactly the host's smallest
    # nonce (fri._grind_search), window by window — the window body runs
    # here on the host perm (the same code object the TPU jit traces)
    from hades252_tpu import plonk

    _, perm_rows = _perm_rows()

    def window(states, nd, pow_bits):
        return fri_tpu._grind_window_body(states, nd, pow_bits,
                                          perm_rows, 8)

    tr = plonk.Transcript()
    tr.absorb(424242)
    host_tr = plonk.Transcript()
    host_tr.absorb(424242)
    pow_bits = 6
    nonces = fri_tpu._grind_batch_dev([tr], pow_bits, window_fn=window)
    host_nonce = fri.grind_transcript(host_tr, pow_bits,
                                      fri.default_pcs_perm(), batch=16)
    assert nonces[0] == host_nonce


def test_chain_nodes_body_matches_host_loop(rng):
    """The fused sibling-opening chain (fri_tpu._chain_nodes_body) must
    give exactly the per-level host loop's verdicts through
    tree_verify_batched's chain_fn seam: valid openings accepted,
    tampered values rejected, out-of-range positions rejected."""
    leaves = [int.from_bytes(rng.bytes(40), "little") % fri.P
              for _ in range(16)]
    perm, perm_rows = _perm_rows()
    levels = fri.tree_build(leaves, perm)
    root = fri.tree_root(levels)
    h = len(levels) - 1
    idx = [3, 7, 12]
    sibs, poss = fri.tree_open_batched(levels, idx)
    values = [leaves[i] for i in idx]

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


def test_verify_device_entry_points_cpu_fallback():
    """On non-TPU backends the device verify entry points ARE the host
    paths — verdicts identical per proof/aggregate."""
    from hades252_tpu import aggregate

    c = _circuit()
    params = fri.FriParams(blowup=4, n_queries=3, final_degree=8,
                           pow_bits=2)
    pk, vk = fri.preprocess_succinct(c, params)
    proof = fri.prove_succinct(c, pk)
    pi = [g.pi for g in c.gates]
    verd = fri_tpu.verify_succinct_device_batch(vk, [proof, proof],
                                                [pi, pi])
    assert bool(np.all(verd))
    agg = aggregate.prove_aggregate([c, _circuit()], pk)
    assert fri_tpu.verify_aggregate_device(vk, agg, [pi, pi])


def test_fri_phase_body_matches_host_chain(rng):
    """The fused FRI commit phase (in-trace transcript + folds + quad
    block trees, fri_tpu._fri_phase_body) must replicate the host chain
    exactly: challenge -> fold_evals -> scheduled block tree root ->
    absorb, and the returned sponge state must continue the host
    Transcript stream."""
    import jax.numpy as jnp

    from hades252_tpu import plonk
    from hades252_tpu.fri_tpu import (_fri_phase_body, _scalar_mont,
                                      _xinv_mont)
    from hades252_tpu.params import P
    from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits

    b, m0, n_folds = 2, 64, 4
    sched = fri.layer_schedule(n_folds)  # [(1, 4), (3, 2)]
    evals_int = [[int.from_bytes(rng.bytes(40), "little") % P
                  for _ in range(m0)] for _ in range(b)]

    # host reference: independent transcripts with distinct histories,
    # driving fri._fri_commit per instance
    trs = [plonk.Transcript() for _ in range(b)]
    for i, tr in enumerate(trs):
        tr.absorb(1000 + i)
    host_states0 = [tr.state for tr in trs]

    perm, perm_rows = _perm_rows()
    host_layers = []   # per instance: [(k, bs, evals, levels)]
    for i in range(b):
        tr = plonk.Transcript()
        tr.set_state(host_states0[i])
        layer_coms, _ = fri._fri_commit(
            tr, list(evals_int[i]), m0, n_folds, m0 >> n_folds,
            sched, perm,
        )
        host_layers.append(layer_coms)
        trs[i] = tr

    xinvs, shift2, size = [], fri.G0, m0
    for _ in range(n_folds):
        xinvs.append(_xinv_mont(size, shift2))
        shift2 = shift2 * shift2 % P
        size //= 2
    f0 = jnp_asarray(ints_to_digits(evals_int, shape=(b, m0)))
    tr_state0 = jnp_asarray(ints_to_digits(host_states0, shape=(b, 5)))
    cur, tr_state, layer_evals, layer_levels = _fri_phase_body(
        f0, tr_state0, tuple(xinvs),
        jnp.asarray(_scalar_mont((P + 1) // 2)), tuple(sched), perm_rows,
        pad_to=8,
    )
    for li in range(len(sched)):
        got = digits_to_ints(np.asarray(layer_evals[li]))
        got_roots = digits_to_ints(
            np.asarray(layer_levels[li][-1][:, 0])
        )
        for i in range(b):
            k, bs, host_evals, host_levels = host_layers[i][li]
            assert [int(v) for v in got[i]] == host_evals
            assert int(got_roots[i]) == fri.tree_root(host_levels)
    got_states = digits_to_ints(np.asarray(tr_state))
    for i in range(b):
        # the host transcript consumed the identical stream: the fused
        # body's final state continues it bit-identically (the host
        # _fri_commit also absorbed the final coefficients, so compare
        # by replaying a challenge from the pre-final-absorb state)
        resumed = plonk.Transcript()
        resumed.set_state([int(v) for v in got_states[i]])
        # re-derive the host state right after the last layer absorb by
        # replaying the fused outputs through a fresh transcript
        replay = plonk.Transcript()
        replay.set_state(host_states0[i])
        cur_i = list(evals_int[i])
        shift = fri.G0
        committed = dict(sched)
        li = 0
        for k in range(1, n_folds + 1):
            beta = replay.challenge()
            cur_i = fri.fold_evals(cur_i, shift, beta)
            shift = shift * shift % P
            if k in committed:
                replay.absorb(int(digits_to_ints(
                    np.asarray(layer_levels[li][-1][:, 0]))[i]))
                li += 1
        assert [int(v) for v in digits_to_ints(np.asarray(cur))[i]] \
            == cur_i
        assert resumed.state == replay.state
