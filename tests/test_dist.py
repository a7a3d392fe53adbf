"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4 test plan item e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hades252_tpu import field
from hades252_tpu.models import merkle, sponge
from hades252_tpu.parallel import dist
from hades252_tpu.params import P
from hades252_tpu.utils.encoding import ints_to_digits

#: slow tier (VERDICT r4 next #7): compile-heavy on the 1-core dev
#: host; skip with `-m "not slow"` for fast iteration (CI runs all).
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return dist.make_mesh(8)


def rand_digits(rng, n):
    vals = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
    return jnp.asarray(ints_to_digits(vals, shape=(n,)))


def test_permute_sharded_matches_single(rng, mesh8):
    from hades252_tpu.ops.perm_ref import permute

    vals = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(5)]
            for _ in range(16)]
    x = jnp.asarray(ints_to_digits(vals, shape=(16, 5)))
    out = dist.permute_sharded(x, mesh8)
    ref = permute(x)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_sponge_sharded_matches_single(rng, mesh8):
    msgs_int = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(4)]
                for _ in range(8)]
    msgs = jnp.asarray(ints_to_digits(msgs_int, shape=(8, 4)))
    out = dist.sponge_hash_sharded(msgs, mesh8)
    ref = sponge.sponge_hash(msgs)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_merkle_sharded_bit_identical_8dev(rng, mesh8):
    # 256 leaves over 8 devices: local height h=2 (32 = 4^2 * 2), gather at
    # the 16-node level, finish replicated
    leaves = rand_digits(rng, 256)
    root_sharded = dist.merkle_root_sharded(leaves, mesh8)
    root_single = merkle.merkle_root(leaves)
    assert np.array_equal(np.asarray(root_sharded), np.asarray(root_single))


def test_merkle_sharded_mesh_shape_invariance(rng):
    # roots must be identical across 1, 2, 4-device meshes (and the 8-dev
    # case above): reduction order is the global tree, not the mesh
    leaves = rand_digits(rng, 64)
    roots = [
        np.asarray(dist.merkle_root_sharded(leaves, dist.make_mesh(n)))
        for n in (1, 2, 4)
    ]
    assert all(np.array_equal(roots[0], r) for r in roots[1:])
    assert np.array_equal(
        roots[0], np.asarray(merkle.merkle_root(leaves))
    )


def test_merkle_sharded_padding_non_pow4(rng, mesh8):
    # 100 leaves -> padded to 256 globally; divisibility by 8 holds
    leaves = rand_digits(rng, 100)
    root_sharded = dist.merkle_root_sharded(leaves, mesh8)
    root_single = merkle.merkle_root(leaves)
    assert np.array_equal(np.asarray(root_sharded), np.asarray(root_single))


def test_batch_divisibility_validation(rng, mesh8):
    x = jnp.zeros((10, 5, 16), jnp.uint32)
    with pytest.raises(ValueError):
        dist.permute_sharded(x, mesh8)


def test_sharded_executable_cached(rng):
    # repeated sharded calls reuse the cached jitted closure when no
    # persistent compile cache is configured (the TPU/production paths);
    # with one configured (this suite) the cache must stay inert — holding
    # sharded executables alive segfaults later persistent-cache reads
    # (see dist._SHARDED_CACHE)
    from hades252_tpu.parallel.dist import _SHARDED_CACHE

    mesh = dist.make_mesh(2)
    x = jnp.asarray(field.np_random_elements((4, 5), rng))
    out0 = dist.permute_sharded(x, mesh)
    assert mesh not in _SHARDED_CACHE  # inert under the persistent cache

    cache_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        out1 = dist.permute_sharded(x, mesh)
        n_entries = len(_SHARDED_CACHE[mesh])
        out2 = dist.permute_sharded(x, mesh)
        assert len(_SHARDED_CACHE[mesh]) == n_entries
        assert np.array_equal(np.asarray(out1), np.asarray(out2))
        assert np.array_equal(np.asarray(out0), np.asarray(out1))
    finally:
        # drop the live executables BEFORE re-enabling the persistent
        # cache, or every later compile in the session may segfault
        dist.clear_sharded_cache()
        jax.config.update("jax_compilation_cache_dir", cache_dir)


def test_cipher_sharded_matches_single(rng, mesh8):
    from hades252_tpu.models import cipher

    b, l = 8, 4
    key = jnp.asarray(field.np_random_elements((b, 2), rng))
    nonce = jnp.asarray(field.np_random_elements((b,), rng))
    msg = jnp.asarray(field.np_random_elements((b, l), rng))
    ct_s, tag_s = dist.cipher_sharded(key, nonce, msg, mesh8)
    ct1, tag1 = cipher.encrypt(key, nonce, msg)
    assert np.array_equal(np.asarray(ct_s), np.asarray(ct1))
    assert np.array_equal(np.asarray(tag_s), np.asarray(tag1))
    pt_s, tag_back = dist.cipher_sharded(key, nonce, ct_s, mesh8,
                                         decrypt=True)
    assert np.array_equal(np.asarray(pt_s), np.asarray(msg))
    assert np.array_equal(np.asarray(tag_back), np.asarray(tag1))


def test_prove_batched_sharded_matches_single(mesh8):
    # data-parallel PLONK proving: the three device phases shard over the
    # instance axis (communication-free); proofs must be bit-identical to
    # the single-device batched prover (itself bit-identical to the host
    # prover, tests/test_prover_tpu.py)
    from hades252_tpu import plonk, prover_tpu
    from hades252_tpu.gadget import Composer, Constraint

    def instance(v1, v2):
        c = Composer()
        a = c.append_witness(v1)
        b = c.append_witness(v2)
        c.gate_mul(Constraint().mult(1).a(a).b(b))
        c.gate_add(
            Constraint().left(1).a(a).right(1).b(b).public(-((v1 + v2) % P))
        )
        return c

    composers = [instance(3 + i, 5 + i) for i in range(8)]
    key = plonk.preprocess(composers[0])
    sharded = prover_tpu.prove_batched(composers, key, mesh=mesh8)
    single = prover_tpu.prove_batched(composers, key)
    for s, u in zip(sharded, single):
        assert s.wires == u.wires and s.z == u.z and s.t == u.t
        assert s.commitments == u.commitments
    with pytest.raises(ValueError, match="not divisible"):
        prover_tpu.prove_batched(composers[:3], key, mesh=mesh8)


def test_succinct_aggregate_sharded_matches_single(mesh8):
    # multi-chip succinct proving: the polynomial phases shard over the
    # instance axis (fri_tpu._select_phases); the aggregate emitted with
    # a mesh must be bit-identical to the unsharded device prover's
    # (itself bit-identical to the host prover, tests/test_fri_tpu.py)
    import jax

    from hades252_tpu import aggregate, fri, fri_tpu
    from hades252_tpu.gadget import Composer, Constraint

    jax.clear_caches()

    def instance(v1, v2):
        c = Composer()
        a = c.append_witness(v1)
        b = c.append_witness(v2)
        c.gate_mul(Constraint().mult(1).a(a).b(b))
        c.gate_add(
            Constraint().left(1).a(a).right(1).b(b).public(-((v1 + v2) % P))
        )
        return c

    composers = [instance(3 + i, 5 + i) for i in range(8)]
    params = fri.FriParams(blowup=4, n_queries=2, final_degree=8)
    pk, vk = fri.preprocess_succinct(composers[0], params)
    sharded = fri_tpu.prove_aggregate_device(composers, pk, mesh=mesh8)
    single = fri_tpu.prove_aggregate_device(composers, pk)
    assert sharded.roots == single.roots
    assert sharded.evals == single.evals
    assert sharded.fri.layer_roots == single.fri.layer_roots
    assert sharded.fri.final_coeffs == single.fri.final_coeffs
    assert sharded.open_blocks == single.open_blocks
    assert sharded.pow_nonce == single.pow_nonce
    pis = [[g.pi for g in c.gates] for c in composers]
    assert aggregate.verify_aggregate(vk, sharded, pis)
    with pytest.raises(ValueError, match="not divisible"):
        fri_tpu.prove_aggregate_device(composers[:3], pk, mesh=mesh8)
    with pytest.raises(ValueError, match="not divisible"):
        fri_tpu.prove_succinct_device_batch(composers[:3], pk, mesh=mesh8)


def test_chain_nodes_sharded_matches_host(rng, mesh8):
    """Mesh-sharded verification chains (dist.chain_nodes_sharded) must
    produce exactly the host per-level loop's root digests — the same
    bit-identity contract as every other sharded path."""
    from hades252_tpu import fri

    leaves = [int.from_bytes(rng.bytes(40), "little") % P
              for _ in range(16)]
    perm = fri.default_pcs_perm()
    levels = fri.tree_build(leaves, perm)
    idx = list(range(8))  # 8 openings -> 1 per device
    sibs, poss = fri.tree_open_batched(levels, idx)
    node = ints_to_digits([leaves[i] for i in idx], shape=(8,))

    # host reference digests: the per-level loop from _tree_verify_nodes
    ref = np.asarray(node)
    tag = np.broadcast_to(fri._tag_digits(), (8, 1, ref.shape[-1]))
    for lvl in range(poss.shape[1]):
        children = fri._insert_at(ref, np.asarray(sibs)[:, lvl],
                                  np.asarray(poss)[:, lvl])
        states = np.concatenate([tag, children], axis=1).astype(np.uint32)
        ref = np.asarray(perm(states))[:, fri.DIGEST_INDEX, :]

    out = dist.chain_nodes_sharded(node, sibs, poss, mesh8)
    assert np.array_equal(np.asarray(out), ref)

    # the fri_tpu mesh chain_fn pads non-divisible pools and slices back
    from hades252_tpu import fri_tpu

    chain = fri_tpu._mesh_chain_fn(mesh8)
    out5 = chain(np.asarray(node)[:5], np.asarray(sibs)[:5],
                 np.asarray(poss)[:5])
    assert np.array_equal(out5, ref[:5])
