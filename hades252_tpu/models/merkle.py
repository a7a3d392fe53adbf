"""Arity-4 Merkle tree builder over the Hades252 permutation.

The framework's tree-hash driver per BASELINE.md config 4 (the reference has
no Merkle layer — SURVEY.md §2.5; this is the batched workload that feeds
the fused permutation kernel at full width).

Node rule (our spec, documented + oracle-tested):
    parent = perm([TAG, c0, c1, c2, c3])[DIGEST_INDEX]
where TAG = 4 (the arity, as a field element) occupies the capacity word and
c0..c3 are the four children in index order. Leaves are canonical field
elements; levels with fewer than 4^k leaves are zero-padded on the right.

TPU design: each level is one batched permutation call over all parents in
the level (level sizes 4^k, 4^{k-1}, ...); the level loop is a Python loop
over log4(N) static shapes, so every level compiles to one fused kernel
launch. The whole build stays in the Montgomery domain; only the leaves are
converted in and the root out. Reduction order inside the MDS layer is fixed
(j-ascending) so the root is bit-identical across backends and meshes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import field
from ..params import N_DIGITS
from ..utils import metrics
from ..utils.encoding import ints_to_digits

ARITY = 4
TAG = ARITY  # capacity-word domain tag
DIGEST_INDEX = 1


def _tag_mont():
    return field.to_mont(jnp.asarray(ints_to_digits([TAG])[0]))


def tree_levels(n_leaves: int) -> int:
    levels = 0
    n = 1
    while n < n_leaves:
        n *= ARITY
        levels += 1
    return levels


def _pad_to_pow4(leaves: jnp.ndarray) -> jnp.ndarray:
    n = leaves.shape[0]
    full = ARITY ** tree_levels(n)
    return jnp.pad(leaves, ((0, full - n), (0, 0)))


def _level_up(nodes_mont: jnp.ndarray, perm_mont_fn) -> jnp.ndarray:
    """One tree level: (N, D) Montgomery node values -> (N/4, D) parents."""
    n = nodes_mont.shape[0]
    children = nodes_mont.reshape(n // ARITY, ARITY, N_DIGITS)
    tag = jnp.broadcast_to(_tag_mont(), (n // ARITY, 1, N_DIGITS))
    states = jnp.concatenate([tag, children], axis=1)  # (N/4, WIDTH, D)
    return perm_mont_fn(states)[:, DIGEST_INDEX, :]


def merkle_root(leaves: jnp.ndarray, perm_mont_fn=None) -> jnp.ndarray:
    """Build the arity-4 tree root over canonical leaf digits.

    leaves: (N, N_DIGITS) uint32 canonical digits (N >= 1; zero-padded to a
    power of 4). Returns (N_DIGITS,) canonical root digits.
    """
    if perm_mont_fn is None:
        from ..ops import default_perm_mont_fn

        perm_mont_fn = default_perm_mont_fn()
    if leaves.ndim != 2 or leaves.shape[-1] != N_DIGITS:
        raise ValueError(f"expected (N, {N_DIGITS}), got {leaves.shape}")
    level = field.to_mont(_pad_to_pow4(leaves))
    while level.shape[0] > 1:
        # counters live here, outside any trace (metrics.py caveats)
        metrics.count("merkle.levels", 1)
        metrics.count("perms.executed", level.shape[0] // ARITY)
        level = _level_up(level, perm_mont_fn)
    return field.from_mont(level[0])


def merkle_levels(leaves: jnp.ndarray, perm_mont_fn=None) -> list[jnp.ndarray]:
    """All levels, leaves first (Montgomery domain) — used for proofs and
    for checkpoint/resume of large builds (SURVEY.md §5)."""
    if perm_mont_fn is None:
        from ..ops import default_perm_mont_fn

        perm_mont_fn = default_perm_mont_fn()
    level = field.to_mont(_pad_to_pow4(jnp.asarray(leaves)))
    levels = [level]
    while level.shape[0] > 1:
        metrics.count("merkle.levels", 1)
        metrics.count("perms.executed", level.shape[0] // ARITY)
        level = _level_up(level, perm_mont_fn)
        levels.append(level)
    return levels


# ---------------------------------------------------------------------------
# Merkle openings (inclusion proofs) — capability beyond the reference,
# matching what dusk-poseidon builds downstream of Hades252.
# ---------------------------------------------------------------------------


def merkle_open(levels: list[jnp.ndarray], index: int):
    """Produce the opening path for leaf `index` from `merkle_levels` output.

    Returns a list of (siblings, position) per level, where siblings is the
    (ARITY, N_DIGITS) Montgomery-domain group containing the node and
    position is the node's index within the group.
    """
    if not 0 <= index < levels[0].shape[0]:
        raise ValueError(f"leaf index {index} out of range")
    path = []
    for level in levels[:-1]:
        group = index // ARITY
        sibs = level[group * ARITY : (group + 1) * ARITY]
        path.append((sibs, index % ARITY))
        index = group
    return path


def merkle_open_compact(levels: list[jnp.ndarray], index: int):
    """Compact opening for leaf `index`: per level only the 3 SIBLINGS
    (ARITY-1) plus the node's position — proof size 3*32*height bytes, the
    information-theoretic minimum for an arity-4 path (round-1 shipped the
    full 4-child group, 4/3x larger).

    Returns (siblings, positions): (height, ARITY-1, N_DIGITS) Montgomery
    digits and (height,) int32 positions, ready for merkle_verify_batched.
    """
    if not 0 <= index < levels[0].shape[0]:
        raise ValueError(f"leaf index {index} out of range")
    sibs, poss = [], []
    for level in levels[:-1]:
        group = index // ARITY
        pos = index % ARITY
        g = level[group * ARITY : (group + 1) * ARITY]
        sibs.append(jnp.concatenate([g[:pos], g[pos + 1 :]], axis=0))
        poss.append(pos)
        index = group
    return jnp.stack(sibs), jnp.asarray(poss, jnp.int32)


def merkle_open_batched(levels: list[jnp.ndarray], indices):
    """Compact openings for many leaves: returns (K, height, ARITY-1, D)
    siblings and (K, height) positions."""
    sibs, poss = zip(*(merkle_open_compact(levels, int(i)) for i in indices))
    return jnp.stack(sibs), jnp.stack(poss)


def _insert_at(node, sibs, pos):
    """Rebuild the ARITY-child group: node (K, D) placed at pos (K,) among
    siblings (K, ARITY-1, D)."""
    cols = []
    for j in range(ARITY):
        idx = jnp.clip(jnp.where(j > pos, j - 1, j), 0, ARITY - 2)
        s = jnp.take_along_axis(sibs, idx[:, None, None], axis=1)[:, 0]
        cols.append(jnp.where((pos == j)[:, None], node, s))
    return jnp.stack(cols, axis=1)


def merkle_verify_batched(root, leaves, sibs, poss, height: int,
                          perm_mont_fn=None):
    """Verify K compact openings with ONE batched permutation per level
    (round-1 verified serially, one width-5 perm call per level per proof).

    root: (N_DIGITS,) canonical; leaves: (K, N_DIGITS) canonical;
    sibs: (K, height, ARITY-1, N_DIGITS) Montgomery (from
    merkle_open_batched); poss: (K, height). height is REQUIRED for
    soundness (the node rule is level-uniform, so an unbound path length
    would let an internal node verify as a leaf). Returns (K,) bool.

    Positions are attacker-supplied and MUST be range-checked: for
    pos outside [0, ARITY) `_insert_at` never places the node (the child
    group would be entirely proof-supplied siblings), which on padded
    trees — where duplicate sibling digests exist — would let an
    out-of-range position forge membership for an arbitrary leaf. The
    range check is folded into the returned verdict.
    """
    if perm_mont_fn is None:
        from ..ops import default_perm_mont_fn

        perm_mont_fn = default_perm_mont_fn()
    leaves = jnp.asarray(leaves)
    if sibs.shape[1] != height or poss.shape[1] != height:
        return jnp.zeros((leaves.shape[0],), bool)
    poss = jnp.asarray(poss)
    pos_ok = jnp.all((poss >= 0) & (poss < ARITY), axis=1)
    k = leaves.shape[0]
    node = field.to_mont(leaves)
    tag = jnp.broadcast_to(_tag_mont(), (k, 1, N_DIGITS))
    for lvl in range(height):
        children = _insert_at(node, sibs[:, lvl], poss[:, lvl])
        states = jnp.concatenate([tag, children], axis=1)
        node = perm_mont_fn(states)[:, DIGEST_INDEX, :]
    digest_ok = jnp.all(
        field.from_mont(node) == jnp.asarray(root)[None], axis=-1
    )
    return pos_ok & digest_ok


def merkle_verify(root, leaf, path, height, perm_mont_fn=None) -> bool:
    """Check an opening path (host-side; small fixed work).

    height: the tree height the verifier expects (log4 of the padded leaf
    count). REQUIRED for soundness: the node rule is the same at every
    level, so without binding the path length an internal node would
    verify as a "leaf" with a truncated path.
    """
    if len(path) != height:
        return False
    if perm_mont_fn is None:
        from ..ops import default_perm_mont_fn

        perm_mont_fn = default_perm_mont_fn()
    import numpy as np

    node = field.to_mont(jnp.asarray(leaf))
    for sibs, pos in path:
        if not np.array_equal(np.asarray(sibs[pos]), np.asarray(node)):
            return False
        states = jnp.concatenate(
            [_tag_mont()[None, None], jnp.asarray(sibs)[None]], axis=1
        )
        node = perm_mont_fn(states)[0, DIGEST_INDEX, :]
    return bool(
        jnp.array_equal(field.from_mont(node), jnp.asarray(root)).item()
    )
