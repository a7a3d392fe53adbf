"""Checkpoint/resume for long Merkle builds (SURVEY.md §5).

The reference has no state to checkpoint (pure functions); in the rebuild
the one long-running, restartable job is a large arity-4 Merkle build. The
build is deterministic, so the checkpoint story is simple and exact: after
each tree level is computed, persist that level; on restart, resume from
the highest level on disk. Levels are stored in the canonical 32-byte LE
scalar encoding (reference `BlsScalar::to_bytes`, src/round_constants.rs:
61-62) so checkpoints are portable across backends and hosts, independent
of the in-memory Montgomery domain.

Layout: <dir>/level_<k>.bin (4^(H-k) scalars) + <dir>/meta.json.
"""

from __future__ import annotations

import hashlib
import json
import os

import jax.numpy as jnp
import numpy as np

from .. import field
from ..models.merkle import ARITY, _level_up, _pad_to_pow4, tree_levels
from ..params import N_DIGITS
from .encoding import bytes_to_digits, digits_to_bytes


def _meta_path(d):
    return os.path.join(d, "meta.json")


def _level_path(d, k):
    return os.path.join(d, f"level_{k}.bin")


def save_level(d: str, k: int, level_canonical: np.ndarray) -> None:
    """Persist tree level k (0 = leaves) as canonical LE bytes, atomically."""
    os.makedirs(d, exist_ok=True)
    tmp = _level_path(d, k) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(digits_to_bytes(level_canonical))
    os.replace(tmp, _level_path(d, k))


def load_level(d: str, k: int, n: int) -> np.ndarray:
    """Load level k; raises FileNotFoundError / ValueError on bad data."""
    data = open(_level_path(d, k), "rb").read()
    if len(data) != n * 32:
        raise ValueError(f"level {k}: expected {n * 32} bytes, got {len(data)}")
    return bytes_to_digits(data, (n,))


def highest_saved_level(d: str, height: int, n_leaves_padded: int) -> int | None:
    """Highest level index with a complete, well-sized file (None if none)."""
    for k in range(height, -1, -1):
        path = _level_path(d, k)
        n = n_leaves_padded // ARITY**k
        if os.path.exists(path) and os.path.getsize(path) == n * 32:
            return k
    return None


def merkle_root_checkpointed(leaves, d: str, perm_mont_fn=None,
                             save_leaves: bool = False) -> jnp.ndarray:
    """Arity-4 Merkle root with per-level checkpointing.

    Persists every computed level under `d` and resumes from the highest
    complete level found there, so a killed build restarts with only one
    level of lost work. Bit-identical to models.merkle.merkle_root.

    save_leaves=False skips persisting level 0 (usually the caller already
    durably owns the leaves); resume then starts at level >= 1 if present,
    else recomputes from the passed leaves.
    """
    if perm_mont_fn is None:
        from ..ops import default_perm_mont_fn

        perm_mont_fn = default_perm_mont_fn()

    leaves = jnp.asarray(leaves)
    if leaves.ndim != 2 or leaves.shape[-1] != N_DIGITS:
        raise ValueError(f"expected (N, {N_DIGITS}), got {leaves.shape}")
    padded = _pad_to_pow4(leaves)
    n = padded.shape[0]
    height = tree_levels(n)

    # fingerprint the actual leaves: resuming a dir built from DIFFERENT
    # leaves of the same shape must fail loudly, not return the old root
    fp = hashlib.sha256(np.ascontiguousarray(np.asarray(padded)).tobytes())
    meta = {"n_leaves_padded": int(n), "height": int(height), "arity": ARITY,
            "leaves_sha256": fp.hexdigest()}
    os.makedirs(d, exist_ok=True)
    if os.path.exists(_meta_path(d)):
        prior = json.load(open(_meta_path(d)))
        if prior != meta:
            raise ValueError(
                f"checkpoint dir {d} holds a different build: {prior} != {meta}"
            )
    else:
        with open(_meta_path(d), "w") as f:
            json.dump(meta, f)

    start = highest_saved_level(d, height, n)
    if start is None or (start == 0 and not save_leaves):
        level = field.to_mont(padded)
        start = 0
        if save_leaves:
            save_level(d, 0, np.asarray(padded))
    else:
        level = field.to_mont(
            jnp.asarray(load_level(d, start, n // ARITY**start))
        )

    for k in range(start, height):
        level = _level_up(level, perm_mont_fn)
        save_level(d, k + 1, np.asarray(field.from_mont(level)))
    return field.from_mont(level[0]) if height > 0 else jnp.asarray(padded[0])
