"""Multi-chip sharding: data-parallel permutations and sharded Merkle builds.

The reference is single-threaded (SURVEY.md §2.5: no parallelism of any
kind); this layer is where the TPU framework scales out, per the BASELINE
north star. Design:

  * Data parallelism is THE axis (SURVEY.md §2.5 table): the unit of work is
    one width-5 permutation; B independent permutations shard over a 1-D
    device mesh with `shard_map`, each device running the fused kernel on
    its tile. No cross-device traffic.
  * Merkle builds shard the LEAVES contiguously. Each device builds its
    local subtree h levels down with zero communication (children never
    cross device boundaries for contiguous sharding), where
    h = max{h : 4^h | N/n_dev}; then one `all_gather` over the mesh axis
    (ICI) moves the surviving N/4^h nodes to every device and the top
    log4(N/4^h) levels finish replicated. The tree structure is the GLOBAL
    one, so the root is bit-identical to the single-host build regardless
    of mesh shape (SURVEY.md §7 hard part 5).
  * Collectives ride the mesh axis (`jax.lax.all_gather` -> ICI within a
    pod slice, DCN across slices under jax.distributed initialization).
"""

from __future__ import annotations

import weakref

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import field
from ..models.merkle import ARITY, _level_up, _pad_to_pow4, tree_levels
from ..params import N_DIGITS
from ..utils import metrics

AXIS = "data"

#: Jitted shard_map closures cached per live Mesh, so repeated sharded
#: calls hit jax's C++ fastpath with no rebuild/retrace (round-1 rebuilt
#: the closure on every call as a segfault workaround). Root cause
#: narrowed this round: while ANY sharded executable is held alive, a
#: later unrelated PERSISTENT-compile-cache read segfaults inside jax's
#: executable deserialization (_cache_read; deterministic in the CPU test
#: suite, which enables the persistent cache for its scan-heavy compiles).
#: The executables themselves are fine — only the combination
#: {live sharded executable} x {persistent-cache read} crashes. So the
#: cache activates exactly when no persistent compile cache is configured
#: (the TPU/production paths — bench.py, entry(), deployments — which is
#: where the per-call retrace overhead mattered), and falls back to
#: per-call rebuild when one is (the CPU test suite). Entries are
#: immortal while their mesh lives (the closure references the mesh
#: through its shardings); clear_sharded_cache() drops them explicitly.
_SHARDED_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def _caching_safe() -> bool:
    return not jax.config.jax_compilation_cache_dir


def clear_sharded_cache() -> None:
    """Drop every cached sharded executable (frees device memory and the
    mesh references; see _SHARDED_CACHE)."""
    for per_mesh in _SHARDED_CACHE.values():
        for fn in per_mesh.values():
            try:
                fn.clear_cache()
            except AttributeError:
                pass
    _SHARDED_CACHE.clear()


def _cached_jit(mesh: Mesh, key, build):
    if not _caching_safe():
        return jax.jit(build())
    per_mesh = _SHARDED_CACHE.setdefault(mesh, {})
    fn = per_mesh.get(key)
    if fn is None:
        fn = per_mesh[key] = jax.jit(build())
    return fn


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return jax.make_mesh((n_devices,), (AXIS,), devices=devs[:n_devices])


def permute_sharded(x: jnp.ndarray, mesh: Mesh, perm_fn=None) -> jnp.ndarray:
    """Batch-sharded permutation: x (B, WIDTH, N_DIGITS) canonical digits,
    B divisible by the mesh size."""
    if perm_fn is None:
        if jax.default_backend() == "tpu":
            from ..ops.perm_pallas import permute_pallas as perm_fn
        else:
            from ..ops.perm_ref import permute as perm_fn
    if x.shape[0] % mesh.shape[AXIS] != 0:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by mesh size {mesh.shape[AXIS]}"
        )
    jfn = _cached_jit(
        mesh, ("perm", perm_fn),
        lambda: shard_map(
            perm_fn, mesh=mesh, in_specs=P(AXIS, None, None),
            out_specs=P(AXIS, None, None), check_vma=False,
        ),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(AXIS, None, None)))
    return jfn(x)


def sponge_hash_sharded(msgs: jnp.ndarray, mesh: Mesh, perm_mont_fn=None):
    """Stream-sharded sponge: msgs (B, L, N_DIGITS), B divisible by mesh."""
    from ..models.sponge import sponge_hash

    if perm_mont_fn is None:
        from ..ops import default_perm_mont_fn

        perm_mont_fn = default_perm_mont_fn()
    if msgs.shape[0] % mesh.shape[AXIS] != 0:
        raise ValueError(
            f"batch {msgs.shape[0]} not divisible by mesh size {mesh.shape[AXIS]}"
        )
    jfn = _cached_jit(
        mesh, ("sponge", perm_mont_fn),
        lambda: shard_map(
            lambda m: sponge_hash(m, perm_mont_fn),
            mesh=mesh,
            in_specs=P(AXIS, None, None),
            out_specs=P(AXIS, None), check_vma=False,
        ),
    )
    msgs = jax.device_put(msgs, NamedSharding(mesh, P(AXIS, None, None)))
    return jfn(msgs)


def cipher_sharded(key, nonce, data, mesh: Mesh, *, decrypt: bool = False,
                   perm_mont_fn=None):
    """Batch-sharded duplex cipher (models/cipher.py): every array's
    leading batch axis shards over the mesh; rows are independent streams
    so there is no cross-device traffic. Returns (out, tags) with out
    sharded like the input and tags sharded along the batch axis."""
    from ..models import cipher

    if perm_mont_fn is None:
        from ..ops import default_perm_mont_fn

        perm_mont_fn = default_perm_mont_fn()
    key = jnp.asarray(key)
    if key.shape[0] % mesh.shape[AXIS] != 0:
        raise ValueError(
            f"batch {key.shape[0]} not divisible by mesh size {mesh.shape[AXIS]}"
        )
    def run(k, nn, d):
        return cipher._run(k, nn, d, perm_mont_fn, decrypt=decrypt)

    jfn = _cached_jit(
        mesh, ("cipher", perm_mont_fn, decrypt),
        lambda: shard_map(
            run, mesh=mesh,
            in_specs=(P(AXIS, None, None), P(AXIS, None),
                      P(AXIS, None, None)),
            out_specs=(P(AXIS, None, None), P(AXIS, None)),
            check_vma=False,
        ),
    )
    sh3 = NamedSharding(mesh, P(AXIS, None, None))
    sh2 = NamedSharding(mesh, P(AXIS, None))
    return jfn(
        jax.device_put(key, sh3),
        jax.device_put(jnp.asarray(nonce), sh2),
        jax.device_put(jnp.asarray(data), sh3),
    )


def chain_nodes_sharded(node, sibs, poss, mesh: Mesh, perm_fn=None):
    """Mesh-sharded verification chains: the K compact-opening rows of a
    pooled height group shard over the batch axis (rows are independent
    chains — no cross-device traffic) and each device runs its whole
    h-level chain in ONE executable (fri_tpu._chain_nodes_body, the same
    code the single-device fused verifier traces). node (K, N_DIGITS)
    canonical digits, sibs (K, h, 3, N_DIGITS), poss (K, h); K divisible
    by the mesh size. Returns (K, N_DIGITS) root-level digests,
    bit-identical to fri's host per-level loop."""
    from ..fri_tpu import _chain_nodes_body

    pad_to = 1
    if perm_fn is None:
        if jax.default_backend() == "tpu":
            from ..ops.perm_pallas import default_block
            from ..ops.perm_pallas import permute_pallas as perm_fn

            pad_to = default_block()
        else:
            from ..ops.perm_ref import permute as perm_fn
    node = jnp.asarray(node)
    if node.shape[0] % mesh.shape[AXIS] != 0:
        raise ValueError(
            f"openings {node.shape[0]} not divisible by mesh size "
            f"{mesh.shape[AXIS]}"
        )
    jfn = _cached_jit(
        mesh, ("verify.chain", perm_fn, pad_to),
        lambda: shard_map(
            lambda n, s, p: _chain_nodes_body(n, s, p, perm_fn, pad_to),
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None, None, None),
                      P(AXIS, None)),
            out_specs=P(AXIS, None), check_vma=False,
        ),
    )
    sh2 = NamedSharding(mesh, P(AXIS, None))
    sh4 = NamedSharding(mesh, P(AXIS, None, None, None))
    return jfn(
        jax.device_put(node, sh2),
        jax.device_put(jnp.asarray(sibs), sh4),
        jax.device_put(jnp.asarray(poss), sh2),
    )


def sharded_phases(mesh: Mesh):
    """Data-parallel PLONK proving: the three device phases of
    prover_tpu (wire iNTTs, grand product, quotient) wrapped in shard_map
    over the INSTANCE axis. Proof instances are independent, so there is
    no cross-device traffic — proving scales like the permutation batch
    (SURVEY.md §2.5: data parallelism is THE axis). Returns
    (phase1, phase2, phase3) drop-ins; prover_tpu.prove_batched(mesh=...)
    uses them and stays bit-identical to the single-device path."""
    from .. import prover_tpu as pt

    b4 = P(AXIS, None, None, None)
    b3 = P(AXIS, None, None)
    b2 = P(AXIS, None)
    rep = P()  # replicated constant tables (pytree-prefix spec)
    phase1 = _cached_jit(
        mesh, ("prove.phase1",),
        lambda: shard_map(pt._phase1_wires, mesh=mesh, in_specs=b4,
                          out_specs=b4, check_vma=False),
    )
    phase2 = _cached_jit(
        mesh, ("prove.phase2",),
        lambda: shard_map(
            pt._phase2_grand_product, mesh=mesh,
            in_specs=(b4, b2, b2, rep, rep, rep),
            out_specs=b3, check_vma=False,
        ),
    )
    phase3 = _cached_jit(
        mesh, ("prove.phase3",),
        lambda: shard_map(
            pt._phase3_quotient, mesh=mesh,
            in_specs=(b4, b3, b3, b2, b2, b2,
                      rep, rep, rep, rep, rep, rep, rep),
            out_specs=b3, check_vma=False,
        ),
    )
    return phase1, phase2, phase3


def _local_tree_height(n_local: int) -> int:
    h = 0
    while n_local % (ARITY ** (h + 1)) == 0:
        h += 1
    return h


def merkle_root_sharded(leaves: jnp.ndarray, mesh: Mesh, perm_mont_fn=None):
    """Sharded arity-4 Merkle root, bit-identical to models.merkle.merkle_root.

    leaves: (N, N_DIGITS) canonical digits; N is padded to a power of 4
    globally, and the padded count must be divisible by the mesh size.
    """
    if perm_mont_fn is None:
        from ..ops import default_perm_mont_fn

        perm_mont_fn = default_perm_mont_fn()
    if leaves.ndim != 2 or leaves.shape[-1] != N_DIGITS:
        raise ValueError(f"expected (N, {N_DIGITS}), got {leaves.shape}")
    n_dev = mesh.shape[AXIS]
    padded = _pad_to_pow4(leaves)
    n = padded.shape[0]
    if n % n_dev != 0:
        raise ValueError(f"padded leaf count {n} not divisible by mesh {n_dev}")
    h_local = _local_tree_height(n // n_dev)
    total_h = tree_levels(n)

    def build(local_leaves):
        level = field.to_mont(local_leaves)
        for _ in range(h_local):
            level = _level_up(level, perm_mont_fn)
        # one gather over ICI: the global level at height h_local
        level = jax.lax.all_gather(level, AXIS, tiled=True)
        for _ in range(total_h - h_local):
            level = _level_up(level, perm_mont_fn)
        return field.from_mont(level)

    jfn = _cached_jit(
        mesh, ("merkle", perm_mont_fn, h_local, total_h),
        lambda: shard_map(
            build, mesh=mesh, in_specs=P(AXIS, None),
            out_specs=P(None, None), check_vma=False,
        ),
    )
    padded = jax.device_put(padded, NamedSharding(mesh, P(AXIS, None)))
    metrics.count("dist.merkle_builds", 1)
    metrics.count("perms.executed", (n - 1) // (ARITY - 1))
    # bytes each device receives in the one all_gather at height h_local
    gathered = n // ARITY**h_local
    metrics.count(
        "dist.collective_bytes",
        (gathered - gathered // n_dev) * N_DIGITS * 4,
    )
    with metrics.timer("dist.merkle_wall"):
        out = jfn(padded)
        # fetch a scalar reduction rather than block_until_ready: through the
        # axon TPU relay block_until_ready does not actually block, so the
        # timer would under-report (CLAUDE.md); a 4-byte fetch forces
        # completion on every backend.
        int(jnp.sum(out.astype(jnp.uint32)))
    return out[0]
