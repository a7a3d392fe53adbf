"""Device-resident succinct (DEEP-FRI) prover: the flagship crypto path
on the TPU end to end, batched over instances — emitting the HSP2 proof
layout (fri.py round 4: paired phase trees, pruned multiproofs, PoW
grinding, quad-block FRI layers).

fri.prove_succinct is host-side Python big-int: coset NTTs over the
blown-up domain, Merkle tree hashing, the DEEP composition, and the FRI
folds all run as int loops. This module re-executes the SAME protocol
with every O(m0)-sized object living on the device as digit arrays, with
a leading INSTANCE axis throughout:

  * wire/z/t polynomials come from prover_tpu's jitted phases (batched
    NTT interpolation, associative-scan grand product, coset quotient);
  * each phase's paired-block commitment tree — leaf-block sponge
    digests plus every tree level — is ONE executable
    (_block_tree_body), with only the roots (32 bytes each) crossing to
    the host transcripts;
  * the ENTIRE FRI commit phase (per-fold challenge draw, fold,
    scheduled quad-block layer tree, root absorb) is ONE executable: the
    Fiat-Shamir sponge runs in-trace as (B, 5, D) digit state and the
    host plonk.Transcript resumes from the returned state bit-
    identically (_fri_phase_body);
  * proof-of-work grinding searches nonce windows as ONE batched
    permutation call per ~2^pow_bits candidates across all instances
    (_grind_window_dev) — the host single-thread engine would pay
    seconds per instance;
  * all claimed evaluations are one device evaluation call
    (_eval_rows_dev); opened blocks and pruned multiproof nodes are
    fixed-shape device gathers (padded to the schema's worst case so
    every batch reuses ONE executable), one call + one fetch per tree.

The prover is therefore ~10 device round trips end to end regardless of
batch size. Batching matters specifically because of the serving
topology: through a relay the latency is round-trip-bound (PERF.md) —
B instances ride the SAME call sequence and amortize every round trip;
on directly-attached chips the same structure minimizes launch count.

Each emitted SuccinctProof is BIT-IDENTICAL to fri.prove_succinct's for
the same (composer, pk, rng) — same transcripts, same grinding nonces,
same roots, same pruned openings (tests/test_fri_tpu.py asserts object
equality) — so fri.verify_succinct accepts them unchanged and the host
prover remains the auditable oracle. Both modes (plain and zk) are
supported; zk blinding and the FRI mask polynomial draw each instance's
randomness stream identically to the host and apply it on device.

On non-TPU backends the tree hashing, grinding, and openings fall back
to the host paths (fri.block_digests / fri.multiproof_open with the
native/emulated permutation) while the polynomial phases still run
through the traced JAX ops — which is what the CPU tests exercise.

Two prover entry shapes: prove_succinct_device_batch emits B independent
SuccinctProofs (per-instance transcripts), prove_aggregate_device emits
ONE AggregateProof for B instances (shared transcript, instance-block
trees, one DEEP-FRI — aggregate.py's argument). Both accept mesh= to
shard the polynomial phases over instances (multi-chip data
parallelism).
"""

from __future__ import annotations

import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from . import field, fri, plonk, prover_tpu
from .fri import (
    ARITY,
    DIGEST_INDEX,
    G0,
    SELECTOR_NAMES,
    SIGMA_NAMES,
    TREE_ORDER,
    FriProof,
    ProvingKey,
    SuccinctProof,
    _tree_height,
    eval_order,
    layer_positions,
    tree_columns,
)
from .params import N_DIGITS, P, R
from .plonk import Transcript, _domain_root, statement_digest
from .utils.encoding import digits_to_ints, ints_to_digits

# ---------------------------------------------------------------------------
# Cached host-side constant tables (Montgomery digit arrays)
# ---------------------------------------------------------------------------


@functools.cache
def _xs_digits(m0: int) -> np.ndarray:
    """(m0, D) canonical digits of the L0 points x_i = G0 * w^i."""
    w = _domain_root(m0)
    xs, x = [], G0
    for _ in range(m0):
        xs.append(x)
        x = x * w % P
    return ints_to_digits(xs, shape=(m0,))


@functools.cache
def _pow_mont(m0: int, s: int) -> np.ndarray:
    """(m0, D) Montgomery digits of x_i^s on L0."""
    w = pow(_domain_root(m0), s, P)
    out, x = [], pow(G0, s, P)
    for _ in range(m0):
        out.append(x * R % P)
        x = x * w % P
    return ints_to_digits(out, shape=(m0,))


@functools.cache
def _xinv_mont(m: int, shift: int) -> np.ndarray:
    """(m/2, D) Montgomery digits of (shift * w_m^i)^-1, i < m/2 — the
    fold's 1/x stream for a layer on the coset shift*H_m."""
    w_inv = pow(_domain_root(m), P - 2, P)
    out, x = [], pow(shift, P - 2, P)
    for _ in range(m // 2):
        out.append(x * R % P)
        x = x * w_inv % P
    return ints_to_digits(out, shape=(m // 2,))


@functools.cache
def _scalar_mont(v: int) -> np.ndarray:
    return ints_to_digits([v % P * R % P], shape=(1,))[0]


#: Per-ProvingKey device tables. ProvingKey is identity-hashed
#: (dataclass(eq=False)), so a WeakKeyDictionary drops each entry the
#: moment the key itself is released — a long-running proving service
#: no longer retains one (10, m0, D) table per circuit ever seen
#: (VERDICT r3 weak #4).
_PK_DEV_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()
_KEY_COEFF_CACHE: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def _pk_key_evals(pk: ProvingKey) -> np.ndarray:
    """(10, m0, D) canonical digits of the preprocessed selector/sigma
    evaluations on L0 (weakly cached per proving key)."""
    cached = _PK_DEV_CACHE.get(pk)
    if cached is not None:
        return cached
    names = SELECTOR_NAMES + SIGMA_NAMES
    rows = [pk.key_evals[name] for name in names]
    m0 = len(rows[0])
    arr = ints_to_digits([v for row in rows for v in row],
                         shape=(len(names), m0))
    _PK_DEV_CACHE[pk] = arr
    return arr


def _key_coeff_digits(pk: ProvingKey) -> np.ndarray:
    """(10, n, D) canonical coefficient digits of the selector + sigma
    polynomials (weakly cached per proving key)."""
    cached = _KEY_COEFF_CACHE.get(pk)
    if cached is not None:
        return cached
    key = pk.key
    rows = [key.selectors[name] for name in SELECTOR_NAMES]
    rows += [key.sigmas[j] for j in range(len(SIGMA_NAMES))]
    out = ints_to_digits(
        [v % P for row in rows for v in row], shape=(len(rows), key.n)
    )
    _KEY_COEFF_CACHE[pk] = out
    return out


# ---------------------------------------------------------------------------
# Device primitives (leading instance axis B everywhere)
# ---------------------------------------------------------------------------


def _coset_eval_dev(coeffs: jnp.ndarray, m0: int) -> jnp.ndarray:
    """(..., L, D) coefficients (L <= m0) -> evaluations on L0."""
    from .ops import ntt

    pad = m0 - coeffs.shape[-2]
    width = [(0, 0)] * (coeffs.ndim - 2) + [(0, pad), (0, 0)]
    return ntt.coset_eval_batched(jnp.pad(coeffs, width), G0)


def _tree_levels_body(level: jnp.ndarray, perm_fn, pad_to: int = 1) -> tuple:
    """All arity-4 tree levels from (B, N, D) padded leaf digests (N a
    power of 4), node rule identical to fri.tree_build_digits: every
    level is one batched permutation over all B rows' nodes. One
    traceable body, so the whole build compiles to ONE device executable
    — through a relay the per-level launch round trips, not the hashing,
    dominated the prover (PERF.md).

    pad_to: pad every level's permutation batch up to a multiple of this
    (padding rows are zeros, sliced off after the perm — digests
    unchanged). The device path passes the kernel's canonical block so
    EVERY call site in every tree executable uses the one (block, shape)
    kernel variant: sub-block levels would otherwise each compile their
    own small-block Mosaic kernel (the slowest compiles on record,
    CLAUDE.md)."""
    levels = [level]
    while level.shape[1] > 1:
        b, n = level.shape[0], level.shape[1]
        k = n // ARITY
        children = level.reshape(b * k, ARITY, N_DIGITS)
        tag = jnp.broadcast_to(jnp.asarray(fri._tag_digits()),
                               (b * k, 1, N_DIGITS))
        states = jnp.concatenate([tag, children], axis=1)
        pad = (-(b * k)) % pad_to
        if pad:
            states = jnp.pad(states, ((0, pad), (0, 0), (0, 0)))
        out = perm_fn(states)[: b * k, DIGEST_INDEX, :]
        level = out.reshape(b, k, N_DIGITS)
        levels.append(level)
    return tuple(levels)


def _perm_padded(states, perm_fn, pad_to: int):
    """Batched canonical permutation padded to the kernel's canonical
    block (zeros sliced off) — same rationale as _tree_levels_body."""
    b = states.shape[0]
    pad = (-b) % pad_to
    if pad:
        states = jnp.pad(states, ((0, pad), (0, 0), (0, 0)))
    return perm_fn(states)[:b]


def _sponge_digests_body(blocks, perm_fn, pad_to: int):
    """(K, bs, D) canonical value blocks -> (K, D) leaf digests — device
    twin of fri.block_digests (width-tagged rate-4 sponge), one batched
    permutation per chunk."""
    k, bs = blocks.shape[0], blocks.shape[1]
    n_chunks = max(1, -(-bs // 4))
    pad = n_chunks * 4 - bs
    if pad:
        blocks = jnp.pad(blocks, ((0, 0), (0, pad), (0, 0)))
    from .params import int_to_digits

    tag = jnp.broadcast_to(
        jnp.asarray(int_to_digits(fri.leaf_tag_int(bs))),
        (k, 1, N_DIGITS),
    )
    state = jnp.concatenate([tag, blocks[:, 0:4]], axis=1)
    state = _perm_padded(state, perm_fn, pad_to)
    for c in range(1, n_chunks):
        word = field.add_mod(state[:, 1:5], blocks[:, 4 * c : 4 * c + 4])
        state = jnp.concatenate([state[:, :1], word], axis=1)
        state = _perm_padded(state, perm_fn, pad_to)
    return state[:, DIGEST_INDEX]


def _block_tree_body(blocks, perm_fn, pad_to: int) -> tuple:
    """(B, npos, bs, D) value blocks -> all digest tree levels
    ((B, n_lvl, D) each) — sponge leaf digests + the arity-4 tree, one
    traceable body (= one device executable per tree shape)."""
    b, npos, bs = blocks.shape[0], blocks.shape[1], blocks.shape[2]
    digs = _sponge_digests_body(
        blocks.reshape(b * npos, bs, N_DIGITS), perm_fn, pad_to
    ).reshape(b, npos, N_DIGITS)
    full = ARITY ** _tree_height(npos)
    if full > npos:
        digs = jnp.pad(digs, ((0, 0), (0, full - npos), (0, 0)))
    return _tree_levels_body(digs, perm_fn, pad_to)


@jax.jit
def _block_tree_dev(blocks: jnp.ndarray) -> tuple:
    from .ops.perm_pallas import default_block, permute_pallas

    return _block_tree_body(blocks, permute_pallas, default_block())


def _paired_blocks_dev(cols: jnp.ndarray) -> jnp.ndarray:
    """(B, C, m0, D) column evaluations -> (B, m0/2, 2C, D) paired
    blocks: position j holds every column at x_j then at x_{j+m0/2}
    (fri._commit_paired's layout)."""
    half = cols.shape[2] // 2
    x = jnp.concatenate([cols[:, :, :half], cols[:, :, half:]], axis=1)
    return jnp.transpose(x, (0, 2, 1, 3))


@jax.jit
def _paired_tree_dev(cols: jnp.ndarray) -> tuple:
    from .ops.perm_pallas import default_block, permute_pallas

    return _block_tree_body(_paired_blocks_dev(cols), permute_pallas,
                            default_block())


def _build_paired_levels(cols) -> list:
    """All digest tree levels for (B, C, m0, D) column evaluations,
    committed as paired blocks. On TPU the whole build (block assembly,
    leaf sponges, every level) is one fused executable; elsewhere the
    host path (native/emulated perm) builds per instance — digests are
    bit-identical either way (KAT gates + test_fri_tpu)."""
    if jax.default_backend() != "tpu":
        perm = fri.default_pcs_perm()
        cols_np = np.asarray(cols)
        b, half = cols_np.shape[0], cols_np.shape[2] // 2
        out = []
        for i in range(b):
            blocks = np.concatenate(
                [cols_np[i, :, :half], cols_np[i, :, half:]], axis=0
            ).transpose(1, 0, 2)
            digs = fri.block_digests(blocks, perm)
            out.append(fri.tree_build_digits(digs, perm))
        return [np.stack([o[lvl] for o in out])
                for lvl in range(len(out[0]))]
    return list(_paired_tree_dev(jnp.asarray(cols)))


def _layer_levels(cur, bs: int) -> list:
    """Digest tree levels for a committed FRI layer: cur (B, m_k, D)
    evaluations, blocks = the fold cosets {b + t*npos}."""
    b, m_k = cur.shape[0], cur.shape[1]
    npos = m_k // bs
    if jax.default_backend() != "tpu":
        perm = fri.default_pcs_perm()
        cur_np = np.asarray(cur)
        out = []
        for i in range(b):
            blocks = cur_np[i].reshape(bs, npos, N_DIGITS).transpose(
                1, 0, 2
            )
            digs = fri.block_digests(blocks, perm)
            out.append(fri.tree_build_digits(digs, perm))
        return [np.stack([o[lvl] for o in out])
                for lvl in range(len(out[0]))]
    blocks = jnp.transpose(
        jnp.reshape(jnp.asarray(cur), (b, bs, npos, N_DIGITS)),
        (0, 2, 1, 3),
    )
    return list(_block_tree_dev(blocks))


def _root_ints(levels) -> list:
    """(B,) root ints from the last (B, 1, D) level."""
    return [int(v) for v in digits_to_ints(np.asarray(levels[-1])[:, 0])]


# ---------------------------------------------------------------------------
# Fixed-shape opening gathers (padded to the schema's worst case so any
# query set reuses one executable — a fresh shape would cost a relay
# compile per proof batch)
# ---------------------------------------------------------------------------


@jax.jit
def _gather_cols_dev(rows: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """rows (B, C, m0, D), idx (B, U) -> (B, C, U, D) values at the
    per-instance positions."""
    b, c_, _, _ = rows.shape
    u = idx.shape[1]
    ix = jnp.broadcast_to(idx[:, None, :, None], (b, c_, u, N_DIGITS))
    return jnp.take_along_axis(rows, ix, axis=2)


@jax.jit
def _gather_levels_dev(levels: tuple, idx: tuple) -> tuple:
    """levels: (B, n_l, D) per level; idx: (B, cap) int32 per level ->
    gathered (B, cap, D) digits per level."""
    out = []
    for lv, ix in zip(levels, idx):
        b, cap = ix.shape
        ixb = jnp.broadcast_to(ix[:, :, None], (b, cap, N_DIGITS))
        out.append(jnp.take_along_axis(lv, ixb, axis=1))
    return tuple(out)


def _open_nodes_dev(levels, s_lists) -> list:
    """Pruned multiproof node sets for every instance from device-
    resident digest levels: levels list of (B, n_l, D); s_lists[i] the
    instance's sorted-unique opened positions. Gathers are padded to
    (ARITY-1) * n_queries-ish worst case per level (cap = the max actual
    count this batch, rounded up to a shared static bound) — one device
    call, one fetch, host slicing. Bit-identical to
    fri.multiproof_open(levels_i, s_lists[i]) per instance."""
    b = levels[0].shape[0]
    height = len(levels) - 1
    plans = [fri.multiproof_plan(s, height) for s in s_lists]
    if height == 0:
        return [np.zeros((0, N_DIGITS), np.uint32) for _ in range(b)]
    cap = max(
        (len(plans[i][lvl]) for i in range(b) for lvl in range(height)),
        default=0,
    )
    cap = max(cap, 1)
    idx = tuple(
        np.stack([
            np.pad(np.asarray(plans[i][lvl], np.int64),
                   (0, cap - len(plans[i][lvl]))).astype(np.int32)
            for i in range(b)
        ])
        for lvl in range(height)
    )
    got = _gather_levels_dev(
        tuple(jnp.asarray(lv) for lv in levels[:height]),
        tuple(jnp.asarray(ix) for ix in idx),
    )
    got_np = [np.asarray(g) for g in got]
    out = []
    for i in range(b):
        parts = [got_np[lvl][i, : len(plans[i][lvl])]
                 for lvl in range(height) if len(plans[i][lvl])]
        out.append(
            np.concatenate(parts).astype(np.uint32)
            if parts else np.zeros((0, N_DIGITS), np.uint32)
        )
    return out


def _open_blocks_dev(cols, s_lists, q: int) -> list:
    """Opened paired blocks for every instance: cols (B, C, m0, D)
    column evaluations; returns per instance (U_i, 2C) int lists —
    fri._open_paired's block layout. Gathers both sides at a fixed
    padded width (n_queries), one call + one fetch."""
    b, c_, m0 = cols.shape[0], cols.shape[1], cols.shape[2]
    half = m0 // 2
    idx = np.zeros((b, 2 * q), np.int32)
    for i, s in enumerate(s_lists):
        arr = np.asarray(list(s) + [0] * (q - len(s)), np.int32)
        idx[i, :q] = arr
        idx[i, q:] = arr + half
    vals = np.asarray(_gather_cols_dev(jnp.asarray(cols),
                                       jnp.asarray(idx)))
    ints = digits_to_ints(vals)  # (B, C, 2q) object
    out = []
    for i, s in enumerate(s_lists):
        u = len(s)
        blocks = [
            [int(ints[i, c, j]) for c in range(c_)]
            + [int(ints[i, c, q + j]) for c in range(c_)]
            for j in range(u)
        ]
        out.append(blocks)
    return out


# ---------------------------------------------------------------------------
# Claimed evaluations (one device call) + blinding
# ---------------------------------------------------------------------------


def _ints_row(arr) -> list:
    return [int(v) for v in digits_to_ints(np.asarray(arr))]


@jax.jit
def _eval_rows_dev(polys: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Evaluate R polynomials per instance at per-row points, on device:
    polys (B, R, L, D) canonical coefficient digits (zero-padded on the
    coefficient axis), pts (B, R, D) canonical points. Returns (B, R, D)
    canonical values — exactly poly_eval(coeffs, point) per row (Montgomery
    ops are exact mod p). Power table by doubling (log L mont_muls), then
    one product + a log-depth modular-add reduction."""
    b, r, ln, _ = polys.shape
    from .params import perm_constants_np

    one = jnp.asarray(perm_constants_np()["one"])
    ptm = field.to_mont(pts)
    pows = field.to_mont(jnp.broadcast_to(one, (b, r, 1, N_DIGITS)))
    while pows.shape[2] < ln:
        m = pows.shape[2]
        xk = field.mont_mul(pows[:, :, m - 1 : m], ptm[:, :, None])
        pows = jnp.concatenate(
            [pows, field.mont_mul(pows, jnp.broadcast_to(xk, pows.shape))],
            axis=2,
        )
    terms = field.mont_mul(pows[:, :, :ln], polys)  # x^i * c_i, canonical
    while terms.shape[2] > 1:
        m = terms.shape[2]
        if m % 2:
            terms = jnp.pad(terms, ((0, 0), (0, 0), (0, 1), (0, 0)))
            m += 1
        terms = field.add_mod(terms[:, :, : m // 2], terms[:, :, m // 2 :])
    return terms[:, :, 0]


def _claimed_eval_ints(wires_dev, z_dev, t_dev, r_dev, pk: ProvingKey,
                       zetas: list, omega: int):
    """All claimed evaluations for B instances in ONE device call + ONE
    small fetch: per instance the rows a, b, o, d, z @ zeta_i, z @
    omega*zeta_i, t @ zeta_i, then the 10 key polynomials @ zeta_i, then
    (zk) the FRI mask r @ zeta_i. Returns an object array (B, 17 or 18)
    of canonical ints, bit-identical to host Horner (plonk.poly_eval).

    On non-TPU backends the host Horner path runs instead (same values;
    the device evaluator's bit-identity is pinned by its own unit test) —
    XLA:CPU's compile of the scan-heavy Montgomery graphs costs far more
    than it saves there, exactly like the tree fallback."""
    b = wires_dev.shape[0]
    n_rows = 17 + (1 if r_dev is not None else 0)
    if jax.default_backend() != "tpu":
        from .plonk import poly_eval

        key = pk.key
        wires_np, z_np, t_np = (np.asarray(wires_dev), np.asarray(z_dev),
                                np.asarray(t_dev))
        out = np.empty((b, n_rows), dtype=object)
        key_cache = {}
        for i in range(b):
            z_ = zetas[i]
            for j in range(4):
                out[i, j] = poly_eval(_ints_row(wires_np[i, j]), z_)
            out[i, 4] = poly_eval(_ints_row(z_np[i]), z_)
            out[i, 5] = poly_eval(_ints_row(z_np[i]), z_ * omega % P)
            out[i, 6] = poly_eval(_ints_row(t_np[i]), z_)
            if z_ not in key_cache:
                key_cache[z_] = (
                    [poly_eval(key.selectors[nm], z_)
                     for nm in SELECTOR_NAMES]
                    + [poly_eval(key.sigmas[j_], z_)
                       for j_ in range(len(SIGMA_NAMES))]
                )
            out[i, 7:17] = key_cache[z_]
            if r_dev is not None:
                out[i, 17] = poly_eval(
                    _ints_row(np.asarray(r_dev)[i]), z_
                )
        return out
    key_tab = jnp.asarray(_key_coeff_digits(pk))
    ln = max(wires_dev.shape[2], z_dev.shape[1], t_dev.shape[1],
             key_tab.shape[1],
             r_dev.shape[1] if r_dev is not None else 0)

    def pad_l(x):
        width = [(0, 0)] * (x.ndim - 2) + [(0, ln - x.shape[-2]), (0, 0)]
        return jnp.pad(x, width)

    parts = [
        pad_l(wires_dev),                       # a b o d @ zeta
        pad_l(z_dev[:, None]),                  # z  @ zeta
        pad_l(z_dev[:, None]),                  # z  @ omega*zeta
        pad_l(t_dev[:, None]),                  # t  @ zeta
        jnp.broadcast_to(
            pad_l(key_tab)[None],
            (b, key_tab.shape[0], ln, N_DIGITS),
        ),
    ]
    if r_dev is not None:
        parts.append(pad_l(r_dev[:, None]))     # r  @ zeta
    rows = jnp.concatenate(parts, axis=1)       # (B, n_rows, ln, D)
    pts_int = [
        [z_] * 5 + [z_ * omega % P] + [z_] * (n_rows - 6)
        for z_ in zetas
    ]
    pts = jnp.asarray(ints_to_digits(pts_int, shape=(b, n_rows)))
    return digits_to_ints(np.asarray(_eval_rows_dev(rows, pts)))


@jax.jit
def _blind_dev(coeffs: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Device twin of fri._blind: (..., n, D) coeffs + (..., k, D) blinding
    digits -> (..., n + k, D) with out[n + j] += r[j], out[j] -= r[j].
    Formulated as two shifted pads of r so overlapping regions (k > n,
    the tiny-circuit case) are handled exactly like the host loop."""
    n = coeffs.shape[-2]
    k = r.shape[-2]
    lead = [(0, 0)] * (coeffs.ndim - 2)
    out = jnp.pad(coeffs, lead + [(0, k), (0, 0)])
    plus = jnp.pad(r, lead + [(n, 0), (0, 0)])
    minus = jnp.pad(r, lead + [(0, n), (0, 0)])
    return field.sub_mod(field.add_mod(out, plus), minus)


#: Largest m0 slab the DEEP composition materializes at once. Each
#: mont_mul over (B, m, D) holds a (B, m, D, D) u32 wide product; with
#: ~17 terms x 3 muls the scheduler keeps several alive, so an unchunked
#: m0 = 2^18 batch blew past the v5e's 15.75G HBM (measured OOM at the
#: n = 2^14 circuit, tools/bench_r4_scaling.log). 2^15 bounds the live
#: wide products to ~64 MB each while keeping the VPU saturated.
DEEP_CHUNK = 1 << 15


def _deep_terms_chunk(stack, vs, gammas, pows, inv_a, inv_b, spec):
    """The DEEP term loop on one m0 slab (shapes as _deep_dev, m0 =
    chunk)."""
    out_shape = (stack.shape[0],) + stack.shape[2:]
    acc = jnp.zeros(out_shape, jnp.uint32)
    for j, (row, s_idx, shifted) in enumerate(spec):
        diff = field.sub_mod(
            stack[:, row], jnp.broadcast_to(vs[:, j, None, :], out_shape)
        )
        term = field.mont_mul(diff, pows[s_idx][None])
        term = field.mont_mul(term, inv_b if shifted else inv_a)
        term = field.mont_mul(
            term, jnp.broadcast_to(gammas[:, j, None, :], out_shape)
        )
        acc = field.add_mod(acc, term)
    return acc


def _deep_dev(stack, vs, gammas, pows, inv_a, inv_b, spec):
    """F on L0 per instance: stack (B, T_rows, m0, D) poly evaluations;
    vs (B, T, D) claimed values; gammas (B, T, D) Montgomery gdeep powers;
    pows (S, m0, D) shared Montgomery x^s tables; inv_a/inv_b (B, m0, D)
    Montgomery 1/(x - zeta_i), 1/(x - omega*zeta_i); spec: static tuple
    of (row, s_index, shifted). Returns (B, m0, D).

    m0 beyond DEEP_CHUNK streams through a lax.map over m0 slabs (the
    composition is pointwise along m0, so chunking is value-identical) —
    HBM stays bounded at any circuit size instead of scaling with
    m0 x D^2 wide-product temporaries."""
    b, m0 = stack.shape[0], stack.shape[2]
    if m0 <= DEEP_CHUNK:
        return _deep_terms_chunk(stack, vs, gammas, pows, inv_a, inv_b,
                                 spec)
    n_chunks = m0 // DEEP_CHUNK
    ck = DEEP_CHUNK
    st = stack.reshape(b, stack.shape[1], n_chunks, ck, N_DIGITS)
    st = jnp.moveaxis(st, 2, 0)               # (n_chunks, B, T_rows, ck, D)
    pw = pows.reshape(pows.shape[0], n_chunks, ck, N_DIGITS)
    pw = jnp.moveaxis(pw, 1, 0)               # (n_chunks, S, ck, D)
    ia = jnp.moveaxis(
        inv_a.reshape(b, n_chunks, ck, N_DIGITS), 1, 0
    )
    ib = jnp.moveaxis(
        inv_b.reshape(b, n_chunks, ck, N_DIGITS), 1, 0
    )

    def one(xs):
        st_c, pw_c, ia_c, ib_c = xs
        return _deep_terms_chunk(st_c, vs, gammas, pw_c, ia_c, ib_c, spec)

    out = jax.lax.map(one, (st, pw, ia, ib))  # (n_chunks, B, ck, D)
    return jnp.moveaxis(out, 0, 1).reshape(b, m0, N_DIGITS)


_deep_dev_jit = jax.jit(_deep_dev, static_argnames=("spec",))


@jax.jit
def _inv_mont_dev(xs: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-form 1/(x_i - point_b) over the L0 point table:
    xs (m0, D), points (B, D) -> (B, m0, D)."""
    diff = field.sub_mod(
        jnp.broadcast_to(xs[None], (points.shape[0],) + xs.shape),
        jnp.broadcast_to(points[:, None, :],
                         (points.shape[0],) + xs.shape),
    )
    return field.to_mont(field.invert(diff))


@jax.jit
def _fold_dev(evals, beta_mont, xinv_mont, inv2_mont):
    """One FRI fold on device, batched: evals (B, m, D), beta_mont (B, D)
    per-instance challenges, xinv_mont (m/2, D) shared table —
    value-identical to fri.fold_evals per instance."""
    half = evals.shape[1] // 2
    a, b = evals[:, :half], evals[:, half:]
    even = field.add_mod(a, b)
    odd = field.mont_mul(field.sub_mod(a, b), xinv_mont[None])
    s = field.add_mod(even, field.mont_mul(
        odd, jnp.broadcast_to(beta_mont[:, None, :], odd.shape)
    ))
    return field.mont_mul(
        s, jnp.broadcast_to(inv2_mont, s.shape)
    )


# -- in-trace Fiat-Shamir transcript (device twin of plonk.Transcript) -------
# State is (B, WIDTH, D) canonical digits, one independent transcript per
# instance; absorb/challenge replicate plonk.Transcript exactly (add into
# rate word, permute; read rate word, permute), so a host Transcript can
# be synchronized to/from it via its state accessors and continue the
# stream bit-identically.


def _tr_absorb1(state, val, perm_fn, pad_to: int):
    """Transcript.absorb with ONE value per instance: state (B, 5, D) and
    val (B, D) canonical — add into rate word 1, permute."""
    word = field.add_mod(state[:, 1], val)
    state = jnp.concatenate(
        [state[:, :1], word[:, None], state[:, 2:]], axis=1
    )
    return _perm_padded(state, perm_fn, pad_to)


def _tr_challenge(state, perm_fn, pad_to: int):
    """Transcript.challenge: returns ((B, D) canonical challenge, new
    state)."""
    return state[:, 1], _perm_padded(state, perm_fn, pad_to)


def _fri_phase_body(f0, tr_state, xinvs, inv2, sched, perm_fn,
                    pad_to: int):
    """The WHOLE FRI commit phase as one traceable body: per fold k draw
    beta_k from the in-trace transcript, fold the (B, m_k, D)
    evaluations, and — on the scheduled layers — build the quad/pair
    block commitment tree and absorb its root: exactly the host
    prover's challenge/fold/absorb sequence (fri._fri_commit), so the
    returned transcript state continues the host stream bit-identically.
    Through a relay this turns ~3 per-layer round trips into ONE
    executable + one fetch (PERF.md).

    f0 (B, m0, D) canonical DEEP-composition evals; tr_state (B, 5, D)
    canonical transcript states; xinvs: tuple of (m_k/2, D) Montgomery
    fold tables (their count = n_folds); sched: the static
    layer_schedule tuple ((k, bs), ...). Returns (final_evals, tr_state,
    layer_evals tuple, layer_levels tuple of level-tuples)."""
    committed = dict(sched)
    cur = f0
    layer_evals, layer_levels = [], []
    for k, xinv in enumerate(xinvs, start=1):
        beta, tr_state = _tr_challenge(tr_state, perm_fn, pad_to)
        cur = _fold_dev(cur, field.to_mont(beta), jnp.asarray(xinv), inv2)
        bs = committed.get(k)
        if bs:
            b, m_k = cur.shape[0], cur.shape[1]
            npos = m_k // bs
            blocks = jnp.transpose(
                jnp.reshape(cur, (b, bs, npos, N_DIGITS)), (0, 2, 1, 3)
            )
            levels = _block_tree_body(blocks, perm_fn, pad_to)
            tr_state = _tr_absorb1(tr_state, levels[-1][:, 0], perm_fn,
                                   pad_to)
            layer_evals.append(cur)
            layer_levels.append(levels)
    return cur, tr_state, tuple(layer_evals), tuple(layer_levels)


@functools.partial(jax.jit, static_argnames=("sched",))
def _fri_phase_dev(f0, tr_state, xinvs, inv2, sched):
    from .ops.perm_pallas import default_block, permute_pallas

    return _fri_phase_body(f0, tr_state, xinvs, inv2, sched,
                           permute_pallas, default_block())


# ---------------------------------------------------------------------------
# Batched proof-of-work grinding
# ---------------------------------------------------------------------------


def _grind_window_body(states, nonce_digits, pow_bits: int, perm_fn,
                       pad_to: int):
    """Try a window of candidate nonces for every instance in ONE
    batched permutation: states (B, 5, D) canonical transcript states,
    nonce_digits (C, D) canonical candidates. Returns ((B,) any-hit,
    (B,) first-hit index) — the window scan preserves the host
    smallest-nonce semantics."""
    b = states.shape[0]
    c = nonce_digits.shape[0]
    word = field.add_mod(
        jnp.broadcast_to(states[:, None, 1], (b, c, N_DIGITS)),
        jnp.broadcast_to(nonce_digits[None], (b, c, N_DIGITS)),
    )
    full = jnp.broadcast_to(states[:, None], (b, c, 5, N_DIGITS))
    full = jnp.concatenate(
        [full[:, :, :1], word[:, :, None], full[:, :, 2:]], axis=2
    ).reshape(b * c, 5, N_DIGITS)
    out = jnp.asarray(_perm_padded(full, perm_fn, pad_to))
    low = out[:, 1, 0] | (out[:, 1, 1] << jnp.uint32(16))
    mask = jnp.uint32((1 << pow_bits) - 1)
    ok = ((low & mask) == 0).reshape(b, c)
    return jnp.any(ok, axis=1), jnp.argmax(ok, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("pow_bits",))
def _grind_window_dev(states, nonce_digits, pow_bits: int):
    from .ops.perm_pallas import default_block, permute_pallas

    return _grind_window_body(states, nonce_digits, pow_bits,
                              permute_pallas, default_block())


def _grind_batch_dev(trs, pow_bits: int, window_fn=None) -> list:
    """Smallest working PoW nonce for every transcript, searched in
    shared device windows (one batched permutation call per ~2 * 2^pow_bits
    candidates across ALL instances — the host single-thread engine
    pays ~5 s per instance at pow_bits=16). window_fn overrides the
    jitted device window (tests pass the body on the host perm)."""
    b = len(trs)
    if pow_bits == 0:
        return [0] * b
    if window_fn is None:
        window_fn = _grind_window_dev
    states = jnp.asarray(ints_to_digits(
        [v for tr in trs for v in tr.state], shape=(b, 5)
    ))
    window = max(4096, min(2 << pow_bits, 1 << 17))
    nonces = [None] * b
    start = 0
    while any(v is None for v in nonces):
        cand = np.arange(start, start + window, dtype=np.int64)
        nd = np.zeros((window, N_DIGITS), np.uint32)
        for i in range(4):
            nd[:, i] = (cand >> (16 * i)) & 0xFFFF
        found, first = window_fn(states, jnp.asarray(nd), pow_bits)
        found = np.asarray(found)
        first = np.asarray(first)
        for i in range(b):
            if nonces[i] is None and bool(found[i]):
                nonces[i] = int(start + first[i])
        start += window
    return nonces


def _apply_grinding(trs, pow_bits: int) -> list:
    """Grind + absorb + consume the check challenge for every
    transcript, bit-identical to fri.grind_transcript on each. Device
    windows on TPU, the host native engine elsewhere."""
    if jax.default_backend() == "tpu":
        nonces = _grind_batch_dev(trs, pow_bits)
        return [
            fri.grind_transcript(tr, pow_bits,
                                 search_fn=lambda _s, v=nv: v)
            for tr, nv in zip(trs, nonces)
        ]
    perm = fri.default_pcs_perm()
    return [fri.grind_transcript(tr, pow_bits, perm) for tr in trs]


# ---------------------------------------------------------------------------
# The device prover (batched over instances)
# ---------------------------------------------------------------------------


def _unshard(x, mesh):
    """Materialize a sharded phase output as an unsharded device array:
    downstream ops (coset-eval scatters, Pallas tree hashing, gathers)
    run single-device semantics; the mesh accelerates only the heavy
    polynomial phases (same split prover_tpu.prove_batched uses)."""
    return x if mesh is None else jnp.asarray(np.asarray(x))


def _select_phases(mesh, n_instances: int):
    """The three polynomial phases, optionally sharded over the instance
    axis of a jax.sharding.Mesh (parallel/dist.sharded_phases — multi-chip
    proving is communication-free data parallelism; bit-identity is
    untouched)."""
    if mesh is None:
        return (prover_tpu._phase1_wires,
                prover_tpu._phase2_grand_product,
                prover_tpu._phase3_quotient)
    from .parallel.dist import AXIS, sharded_phases

    if n_instances % mesh.shape[AXIS] != 0:
        raise ValueError(
            f"batch {n_instances} not divisible by mesh size "
            f"{mesh.shape[AXIS]}"
        )
    return sharded_phases(mesh)


def _run_fri_phase(f_dev, trs, m0: int, n_folds: int, sched):
    """Fold + commit the scheduled layers, in-trace on TPU (one
    executable; host transcripts resume from the returned sponge
    states), via per-fold device calls + host trees elsewhere. Returns
    (final evals (B, m_final, D) np, layer_data [(evals, levels)],
    layer_roots_all per instance)."""
    b = len(trs)
    inv2_mont = jnp.asarray(_scalar_mont((P + 1) // 2))
    xinvs, shift, size = [], G0, m0
    for _ in range(n_folds):
        xinvs.append(_xinv_mont(size, shift))
        shift = shift * shift % P
        size //= 2
    layer_data = []
    layer_roots_all = [[] for _ in range(b)]
    if jax.default_backend() == "tpu":
        tr_state = jnp.asarray(ints_to_digits(
            [v for tr in trs for v in tr.state], shape=(b, 5)
        ))
        cur, tr_state, layer_evals, layer_levels = _fri_phase_dev(
            f_dev, tr_state, tuple(jnp.asarray(x) for x in xinvs),
            inv2_mont, tuple(sched),
        )
        layer_data = [(ev, list(lv))
                      for ev, lv in zip(layer_evals, layer_levels)]
        if layer_levels:
            roots_np = digits_to_ints(np.asarray(jnp.stack(
                [lv[-1][:, 0] for lv in layer_levels], axis=1
            )))  # (B, n_layers) — ONE fetch for every layer root
            for i in range(b):
                layer_roots_all[i] = [int(v) for v in roots_np[i]]
        state_ints = digits_to_ints(np.asarray(tr_state))
        for i in range(b):
            trs[i].set_state([int(v) for v in state_ints[i]])
    else:
        committed = dict(sched)
        cur = f_dev
        for k_fold in range(1, n_folds + 1):
            beta_ks = [tr.challenge() for tr in trs]
            bm = jnp.asarray(ints_to_digits(
                [v * R % P for v in beta_ks], shape=(b,)
            ))
            cur = _fold_dev(cur, bm, jnp.asarray(xinvs[k_fold - 1]),
                            inv2_mont)
            bs = committed.get(k_fold)
            if bs:
                lv = _layer_levels(cur, bs)
                rts = _root_ints(lv)
                layer_data.append((cur, lv))
                for i in range(b):
                    layer_roots_all[i].append(rts[i])
                    trs[i].absorb(rts[i])
    return np.asarray(cur), layer_data, layer_roots_all


def prove_succinct_device_batch(composers, pk: ProvingKey,
                                rngs=None, mesh=None) -> list:
    """Batch-prove B instances of one circuit with the succinct argument,
    device-resident (see module docstring). rngs: optional list of one
    np.random.Generator per instance (zk determinism for tests). mesh:
    optional jax.sharding.Mesh — the polynomial phases then shard over
    instances (B must divide by the mesh size). Each returned proof is
    bit-identical to fri.prove_succinct(composers[i], pk, rng=rngs[i])."""
    if not composers:
        return []
    phase1, phase2, phase3 = _select_phases(mesh, len(composers))
    key, params = pk.key, pk.params
    n, omega = key.n, key.omega
    b = len(composers)
    schema = fri.proof_schema(n, params)
    bounds = schema["bounds"]
    d_bound = bounds["D"]
    m0, half0 = schema["m0"], schema["half0"]
    final_degree, n_folds = schema["final_degree"], schema["n_folds"]
    sched = schema["sched"]
    cols_spec = tree_columns(params.zk)
    if rngs is None:
        rngs = [None] * b
    rand_fields = [fri._rand_field_fn(r) for r in rngs]

    ref_idx = plonk._wire_indices(composers[0])
    for c in composers[1:]:
        if plonk._wire_indices(c) != ref_idx:
            raise ValueError(
                "batched proving requires all composers to share one "
                "circuit structure"
            )

    # --- witness polynomials via the batched phases -----------------------
    wire_int = [
        [
            [c._values[idx] % P for idx in col] + [0] * (n - key.n_gates)
            for col in plonk._wire_indices(c)
        ]
        for c in composers
    ]
    wire_evals_dev = jnp.asarray(ints_to_digits(wire_int, shape=(b, 4, n)))
    pi_cols = [
        [v % P for v in plonk._public_input_column(c, n)]
        for c in composers
    ]

    tables_n = prover_tpu._key_tables(key)  # phase-2 tables (m = 4n)
    tables_m = prover_tpu._key_tables(key, m=d_bound, d_z=bounds["d_z"])

    wires_dev = _unshard(phase1(wire_evals_dev), mesh)  # (B, 4, n, D)
    if params.zk:
        # per instance, the identical randomness stream to the host
        # prover: wires a..d (zkw draws each), later z (zkz), then the
        # FRI mask r (D draws)
        r_w = ints_to_digits(
            [rand_fields[i]() for i in range(b)
             for _ in range(4 * bounds["zkw"])],
            shape=(b, 4, bounds["zkw"]),
        )
        wires_dev = _blind_dev(wires_dev, jnp.asarray(r_w))

    trs = []
    for i in range(b):
        tr = Transcript()
        tr.absorb(statement_digest(pk.digest, pi_cols[i]))
        trs.append(tr)

    wires_l0 = _coset_eval_dev(wires_dev, m0)             # (B, 4, m0, D)
    levels = {"w": _build_paired_levels(wires_l0)}
    roots = {"w": _root_ints(levels["w"])}
    for i in range(b):
        trs[i].absorb(roots["w"][i])
    betas = [tr.challenge() for tr in trs]
    gammas_fs = [tr.challenge() for tr in trs]

    bd = jnp.asarray(ints_to_digits(betas, shape=(b,)))
    gd = jnp.asarray(ints_to_digits(gammas_fs, shape=(b,)))
    z_dev = phase2(
        wire_evals_dev, bd, gd,
        jnp.asarray(tables_n["ids_mont"]),
        jnp.asarray(tables_n["sigma_n_mont"]),
        jnp.asarray(tables_n["one_mont"]),
    )  # (B, n, D)
    z_dev = _unshard(z_dev, mesh)
    if params.zk:
        r_z = ints_to_digits(
            [rand_fields[i]() for i in range(b)
             for _ in range(bounds["zkz"])],
            shape=(b, bounds["zkz"]),
        )
        z_dev = _blind_dev(z_dev, jnp.asarray(r_z))
    z_l0 = _coset_eval_dev(z_dev, m0)                     # (B, m0, D)
    levels["z"] = _build_paired_levels(z_l0[:, None])
    roots["z"] = _root_ints(levels["z"])
    for i in range(b):
        trs[i].absorb(roots["z"][i])
    alphas = [tr.challenge() for tr in trs]

    ad = jnp.asarray(ints_to_digits(alphas, shape=(b,)))
    pi_dev = jnp.asarray(ints_to_digits(pi_cols, shape=(b, n)))
    t_dev = phase3(
        wires_dev, z_dev, pi_dev, bd, gd, ad,
        jnp.asarray(tables_m["kx_mont"]),
        jnp.asarray(tables_m["sigma_m_mont"]),
        {k_: jnp.asarray(v) for k_, v in tables_m["q_mont"].items()},
        jnp.asarray(tables_m["zh_inv_mont"]),
        jnp.asarray(tables_m["l1_mont"]),
        jnp.asarray(tables_m["omega_mont"]),
        jnp.asarray(tables_n["one_mont"]),
    )  # (B, d_bound, D)
    t_dev = _unshard(t_dev, mesh)
    t_l0 = _coset_eval_dev(t_dev, m0)
    r_dev = r_l0 = None
    if params.zk:
        r_coeffs = ints_to_digits(
            [rand_fields[i]() for i in range(b) for _ in range(d_bound)],
            shape=(b, d_bound),
        )
        r_dev = jnp.asarray(r_coeffs)
        r_l0 = _coset_eval_dev(r_dev, m0)
        t_cols = jnp.concatenate([t_l0[:, None], r_l0[:, None]], axis=1)
    else:
        t_cols = t_l0[:, None]
    levels["t"] = _build_paired_levels(t_cols)
    roots["t"] = _root_ints(levels["t"])
    for i in range(b):
        trs[i].absorb(roots["t"][i])
    zetas = [tr.challenge() for tr in trs]

    # --- claimed evaluations: one device call + one small fetch -----------
    row_names = (["a", "b", "o", "d", "z", "zw", "t"]
                 + list(SELECTOR_NAMES) + list(SIGMA_NAMES)
                 + (["r"] if params.zk else []))
    vals = _claimed_eval_ints(wires_dev, z_dev, t_dev, r_dev, pk, zetas,
                              omega)
    evals_all = []
    for i in range(b):
        ev = {name: int(vals[i, j]) for j, name in enumerate(row_names)}
        trs[i].absorb(*[ev[name] for name in eval_order(params.zk)])
        evals_all.append(ev)
    gdeeps = [tr.challenge() for tr in trs]

    # --- DEEP composition on device ---------------------------------------
    key_rows = jnp.asarray(_pk_key_evals(pk))             # (10, m0, D)
    stack_parts = [
        wires_l0, z_l0[:, None], t_l0[:, None],
        jnp.broadcast_to(key_rows[None], (b,) + key_rows.shape),
    ]
    row_of = {"a": 0, "b": 1, "o": 2, "d": 3, "z": 4, "t": 5}
    for j, name in enumerate(SELECTOR_NAMES + SIGMA_NAMES):
        row_of[name] = 6 + j
    if params.zk:
        stack_parts.append(r_l0[:, None])
        row_of["r"] = 16
    stack = jnp.concatenate(stack_parts, axis=1)
    terms = fri._terms(bounds)
    s_values = sorted({d_bound + 1 - dj for (_, _, _, dj) in terms})
    pows = jnp.asarray(np.stack([_pow_mont(m0, s) for s in s_values]))
    spec = tuple(
        (row_of[pname], s_values.index(d_bound + 1 - dj), shifted)
        for (pname, ename, shifted, dj) in terms
    )
    vs = jnp.asarray(ints_to_digits(
        [evals_all[i][ename] for i in range(b)
         for (_, ename, _, _) in terms],
        shape=(b, len(terms)),
    ))
    gpow_int = []
    for i in range(b):
        g_acc = 1
        for _ in terms:
            gpow_int.append(g_acc * R % P)
            g_acc = g_acc * gdeeps[i] % P
    gammas = jnp.asarray(ints_to_digits(gpow_int, shape=(b, len(terms))))
    xs = jnp.asarray(_xs_digits(m0))
    zeta_d = jnp.asarray(ints_to_digits(zetas, shape=(b,)))
    wz_d = jnp.asarray(ints_to_digits(
        [z_ * omega % P for z_ in zetas], shape=(b,)
    ))
    inv_a = _inv_mont_dev(xs, zeta_d)
    inv_b = _inv_mont_dev(xs, wz_d)
    f_dev = _deep_dev_jit(stack, vs, gammas, pows, inv_a, inv_b, spec)

    # --- FRI commit phase (one executable on TPU) --------------------------
    final_np, layer_data, layer_roots_all = _run_fri_phase(
        f_dev, trs, m0, n_folds, sched
    )
    final_coeffs_all = []
    shift_final = pow(G0, 1 << n_folds, P)
    for i in range(b):
        fc = fri._coset_interp(_ints_row(final_np[i]), shift_final)
        if any(c_ % P for c_ in fc[final_degree:]):
            raise ValueError(
                "FRI final layer exceeds its degree bound — the witness "
                "does not satisfy the circuit (instance %d)" % i
            )
        fc = fc[:final_degree]
        final_coeffs_all.append(fc)
        trs[i].absorb(*fc)

    # --- grinding + queries -------------------------------------------------
    nonces = _apply_grinding(trs, params.pow_bits)
    queries_all = [
        [tr.challenge() % half0 for _ in range(params.n_queries)]
        for tr in trs
    ]
    s0_all = [sorted(set(qs)) for qs in queries_all]

    # --- openings: fixed-shape gathers, one call + one fetch per tree ------
    tree_cols_dev = {"w": wires_l0, "z": z_l0[:, None], "t": t_cols}
    open_blocks = {}
    open_nodes = {}
    for tname in ("w", "z", "t"):
        open_blocks[tname] = _open_blocks_dev(
            tree_cols_dev[tname], s0_all, params.n_queries
        )
        open_nodes[tname] = _open_nodes_dev(levels[tname], s0_all)
    # key tree: host numpy levels shared across instances
    k_lists = [pk.key_evals[c] for c in cols_spec["k"]]
    open_blocks["k"] = []
    open_nodes["k"] = []
    for i in range(b):
        blk, nod = fri._open_paired(k_lists, pk.key_levels, s0_all[i])
        open_blocks["k"].append(blk)
        open_nodes["k"].append(nod)

    pos_chains_all = [
        [layer_positions(q, m0, sched) for q in queries_all[i]]
        for i in range(b)
    ]
    layer_blocks_all = [[] for _ in range(b)]
    layer_nodes_all = [[] for _ in range(b)]
    for li, (k_fold, bs) in enumerate(sched):
        npos = (m0 >> k_fold) // bs
        s_k_all = [
            sorted({pc[li] for pc in pos_chains_all[i]}) for i in range(b)
        ]
        cur_k, lv = layer_data[li]
        # (B, bs, npos, D): column t = positions t*npos..(t+1)*npos
        cols_k = jnp.reshape(jnp.asarray(cur_k), (b, bs, npos, N_DIGITS))
        idx = np.zeros((b, params.n_queries), np.int32)
        for i, s in enumerate(s_k_all):
            idx[i, : len(s)] = np.asarray(s, np.int32)
        vals = np.asarray(_gather_cols_dev(cols_k, jnp.asarray(idx)))
        ints = digits_to_ints(vals)  # (B, bs, q)
        nodes = _open_nodes_dev(lv, s_k_all)
        for i in range(b):
            u = len(s_k_all[i])
            layer_blocks_all[i].append([
                [int(ints[i, t, j]) for t in range(bs)] for j in range(u)
            ])
            layer_nodes_all[i].append(nodes[i])

    proofs = []
    for i in range(b):
        fri_proof = FriProof(
            layer_roots=layer_roots_all[i],
            final_coeffs=final_coeffs_all[i],
            layer_blocks=layer_blocks_all[i],
            layer_nodes=layer_nodes_all[i],
        )
        proofs.append(SuccinctProof(
            roots={name: roots[name][i] for name in roots},
            evals=evals_all[i],
            pow_nonce=nonces[i],
            fri=fri_proof,
            open_blocks={n_: open_blocks[n_][i] for n_ in TREE_ORDER},
            open_nodes={n_: open_nodes[n_][i] for n_ in TREE_ORDER},
        ))
    return proofs


def prove_succinct_device(composer, pk: ProvingKey,
                          rng=None) -> SuccinctProof:
    """Single-instance wrapper over prove_succinct_device_batch."""
    return prove_succinct_device_batch(
        [composer], pk, rngs=None if rng is None else [rng]
    )[0]


# ---------------------------------------------------------------------------
# Device-resident AGGREGATE prover (aggregate.py's argument, on the TPU)
# ---------------------------------------------------------------------------


def prove_aggregate_device(composers, pk: ProvingKey, rng=None,
                           mesh=None):
    """Device twin of aggregate.prove_aggregate: ONE succinct argument
    for B same-circuit instances, with the polynomial phases, paired
    instance-block tree hashing, DEEP composition, FRI folds, and
    grinding on the device. Output is BIT-IDENTICAL to
    aggregate.prove_aggregate(composers, pk, rng=rng) for the same
    randomness stream (tests/test_fri_tpu.py), so
    aggregate.verify_aggregate accepts it unchanged and the host
    aggregate prover remains the auditable oracle.

    vs prove_succinct_device_batch: challenges are SHARED (one
    transcript, block commitments binding every instance before each
    draw), the w/z/t trees hold instance-expanded blocks, and one
    DEEP-FRI covers all B*7 wire claims + the 10 key claims (+ the
    shared zk mask)."""
    from .aggregate import (
        AggregateProof,
        KEY_EVAL_ORDER,
        WIRE_EVAL_ORDER,
        _absorb_statement,
        _agg_terms,
        agg_tree_specs,
    )

    if not composers:
        raise ValueError("at least one composer required")
    phase1, phase2, phase3 = _select_phases(mesh, len(composers))
    key, params = pk.key, pk.params
    n, omega = key.n, key.omega
    b = len(composers)
    schema = fri.proof_schema(n, params)
    bounds = schema["bounds"]
    d_bound = bounds["D"]
    m0, half0 = schema["m0"], schema["half0"]
    final_degree, n_folds = schema["final_degree"], schema["n_folds"]
    sched = schema["sched"]
    rand_field = fri._rand_field_fn(rng)

    ref_idx = plonk._wire_indices(composers[0])
    for c in composers[1:]:
        if plonk._wire_indices(c) != ref_idx:
            raise ValueError(
                "prove_aggregate requires all composers to share one "
                "circuit structure"
            )

    # --- witness polynomials (batched phases, shared challenges) ----------
    wire_int = [
        [
            [c._values[idx] % P for idx in col] + [0] * (n - key.n_gates)
            for col in plonk._wire_indices(c)
        ]
        for c in composers
    ]
    wire_evals_dev = jnp.asarray(ints_to_digits(wire_int, shape=(b, 4, n)))
    pi_cols = [
        [v % P for v in plonk._public_input_column(c, n)]
        for c in composers
    ]

    tables_n = prover_tpu._key_tables(key)
    tables_m = prover_tpu._key_tables(key, m=d_bound, d_z=bounds["d_z"])

    wires_dev = _unshard(phase1(wire_evals_dev), mesh)  # (B, 4, n, D)
    if params.zk:
        # the host aggregate prover draws instance-major: per composer,
        # 4 wires x zkw coefficients from ONE shared stream
        r_w = ints_to_digits(
            [rand_field() for _ in range(b * 4 * bounds["zkw"])],
            shape=(b, 4, bounds["zkw"]),
        )
        wires_dev = _blind_dev(wires_dev, jnp.asarray(r_w))

    tr = Transcript()
    _absorb_statement(tr, pk.digest, n, key.n_gates, pi_cols)

    wires_l0 = _coset_eval_dev(wires_dev, m0)             # (B, 4, m0, D)
    # w-tree columns: poly-major then instance (a_0..a_{B-1}, b_0.., ...)
    w_cols = jnp.transpose(wires_l0, (1, 0, 2, 3)).reshape(
        1, 4 * b, m0, N_DIGITS
    )
    levels = {"w": _build_paired_levels(w_cols)}
    roots = {"w": _root_ints(levels["w"])[0]}
    tr.absorb(roots["w"])
    beta = tr.challenge()
    gamma = tr.challenge()

    ones = lambda v: jnp.asarray(ints_to_digits([v] * b, shape=(b,)))
    z_dev = phase2(
        wire_evals_dev, ones(beta), ones(gamma),
        jnp.asarray(tables_n["ids_mont"]),
        jnp.asarray(tables_n["sigma_n_mont"]),
        jnp.asarray(tables_n["one_mont"]),
    )  # (B, n, D)
    z_dev = _unshard(z_dev, mesh)
    if params.zk:
        r_z = ints_to_digits(
            [rand_field() for _ in range(b * bounds["zkz"])],
            shape=(b, bounds["zkz"]),
        )
        z_dev = _blind_dev(z_dev, jnp.asarray(r_z))
    z_l0 = _coset_eval_dev(z_dev, m0)                     # (B, m0, D)
    z_cols = z_l0[None].reshape(1, b, m0, N_DIGITS)
    levels["z"] = _build_paired_levels(z_cols)
    roots["z"] = _root_ints(levels["z"])[0]
    tr.absorb(roots["z"])
    alpha = tr.challenge()

    pi_dev = jnp.asarray(ints_to_digits(pi_cols, shape=(b, n)))
    t_dev = phase3(
        wires_dev, z_dev, pi_dev, ones(beta), ones(gamma), ones(alpha),
        jnp.asarray(tables_m["kx_mont"]),
        jnp.asarray(tables_m["sigma_m_mont"]),
        {k_: jnp.asarray(v) for k_, v in tables_m["q_mont"].items()},
        jnp.asarray(tables_m["zh_inv_mont"]),
        jnp.asarray(tables_m["l1_mont"]),
        jnp.asarray(tables_m["omega_mont"]),
        jnp.asarray(tables_n["one_mont"]),
    )  # (B, d_bound, D)
    t_dev = _unshard(t_dev, mesh)
    t_l0 = _coset_eval_dev(t_dev, m0)
    r_dev = None
    t_cols = t_l0[None].reshape(1, b, m0, N_DIGITS)
    if params.zk:
        # ONE shared mask polynomial, drawn after all instances' z blinds
        r_coeffs = ints_to_digits(
            [rand_field() for _ in range(d_bound)], shape=(1, d_bound)
        )
        r_dev = jnp.asarray(r_coeffs)
        r_l0 = _coset_eval_dev(r_dev, m0)                 # (1, m0, D)
        t_cols = jnp.concatenate([t_cols, r_l0[:, None]], axis=1)
    levels["t"] = _build_paired_levels(t_cols)
    roots["t"] = _root_ints(levels["t"])[0]
    tr.absorb(roots["t"])
    zeta = tr.challenge()

    # --- claimed evaluations: one device call + one small fetch -----------
    vals = _claimed_eval_ints(
        wires_dev, z_dev, t_dev,
        jnp.broadcast_to(r_dev, (b,) + r_dev.shape[1:])
        if r_dev is not None else None,
        pk, [zeta] * b, omega,
    )
    wire_rows = ["a", "b", "o", "d", "z", "zw", "t"]
    evals = [
        {name: int(vals[i, j]) for j, name in enumerate(wire_rows)}
        for i in range(b)
    ]
    key_evals = {
        name: int(vals[0, len(wire_rows) + j])
        for j, name in enumerate(SELECTOR_NAMES + SIGMA_NAMES)
    }
    r_eval = int(vals[0, 17]) if params.zk else None
    for e in evals:
        tr.absorb(*[e[name] for name in WIRE_EVAL_ORDER])
    tr.absorb(*[key_evals[name] for name in KEY_EVAL_ORDER])
    if params.zk:
        tr.absorb(r_eval)
    gdeep = tr.challenge()

    # --- one DEEP composition over all B*7 + 10 (+1) claims ----------------
    key_rows = jnp.asarray(_pk_key_evals(pk))             # (10, m0, D)
    inst_rows = jnp.concatenate(
        [wires_l0, z_l0[:, None], t_l0[:, None]], axis=1
    )  # (B, 6, m0, D)
    stack_parts = [inst_rows.reshape(b * 6, m0, N_DIGITS), key_rows]
    if params.zk:
        stack_parts.append(r_l0)
    stack = jnp.concatenate(stack_parts, axis=0)[None]
    wire_row = {"a": 0, "b": 1, "o": 2, "d": 3, "z": 4, "t": 5}
    key_row = {name: 6 * b + j
               for j, name in enumerate(SELECTOR_NAMES + SIGMA_NAMES)}
    agg_terms = _agg_terms(bounds, b)
    s_values = sorted({d_bound + 1 - dj for (_, _, _, _, dj) in agg_terms})
    pows = jnp.asarray(np.stack([_pow_mont(m0, s) for s in s_values]))

    def term_row(j, pname):
        if pname == "r":
            return 6 * b + 10
        if j is None:
            return key_row[pname]
        return 6 * j + wire_row[pname]

    spec = tuple(
        (term_row(j, pname), s_values.index(d_bound + 1 - dj), shifted)
        for (j, pname, ename, shifted, dj) in agg_terms
    )
    vs_int = [
        (r_eval if pname == "r"
         else key_evals[ename] if j is None else evals[j][ename])
        for (j, pname, ename, shifted, dj) in agg_terms
    ]
    vs = jnp.asarray(ints_to_digits(vs_int, shape=(1, len(agg_terms))))
    gpow_int, g_acc = [], 1
    for _ in agg_terms:
        gpow_int.append(g_acc * R % P)
        g_acc = g_acc * gdeep % P
    gammas = jnp.asarray(ints_to_digits(gpow_int,
                                        shape=(1, len(agg_terms))))
    xs = jnp.asarray(_xs_digits(m0))
    inv_a = _inv_mont_dev(xs, jnp.asarray(ints_to_digits([zeta],
                                                         shape=(1,))))
    inv_b = _inv_mont_dev(xs, jnp.asarray(ints_to_digits(
        [zeta * omega % P], shape=(1,))))
    f_dev = _deep_dev_jit(stack, vs, gammas, pows, inv_a, inv_b, spec)

    # --- one FRI commit phase + grinding ------------------------------------
    final_np, layer_data, layer_roots_all = _run_fri_phase(
        f_dev, [tr], m0, n_folds, sched
    )
    final_coeffs = fri._coset_interp(_ints_row(final_np[0]),
                                     pow(G0, 1 << n_folds, P))
    if any(c_ % P for c_ in final_coeffs[final_degree:]):
        raise ValueError(
            "FRI final layer exceeds its degree bound — some witness "
            "does not satisfy the circuit"
        )
    final_coeffs = final_coeffs[:final_degree]
    tr.absorb(*final_coeffs)
    pow_nonce = _apply_grinding([tr], params.pow_bits)[0]

    queries = [tr.challenge() % half0 for _ in range(params.n_queries)]
    s0 = sorted(set(queries))
    pos_chains = [layer_positions(q, m0, sched) for q in queries]

    # --- openings ---------------------------------------------------------
    specs = agg_tree_specs(params.zk, b)
    tree_cols_dev = {"w": w_cols, "z": z_cols, "t": t_cols}
    open_blocks, open_nodes = {}, {}
    for tname in ("w", "z", "t"):
        open_blocks[tname] = _open_blocks_dev(
            tree_cols_dev[tname], [s0], params.n_queries
        )[0]
        assert len(open_blocks[tname][0]) == specs[tname]
        open_nodes[tname] = _open_nodes_dev(levels[tname], [s0])[0]
    k_lists = [pk.key_evals[c] for c in SELECTOR_NAMES + SIGMA_NAMES]
    open_blocks["k"], open_nodes["k"] = fri._open_paired(
        k_lists, pk.key_levels, s0
    )

    layer_blocks, layer_nodes = [], []
    for li, (k_fold, bs) in enumerate(sched):
        npos = (m0 >> k_fold) // bs
        s_k = sorted({pc[li] for pc in pos_chains})
        cur_k, lv = layer_data[li]
        cols_k = jnp.reshape(jnp.asarray(cur_k), (1, bs, npos, N_DIGITS))
        idx = np.zeros((1, params.n_queries), np.int32)
        idx[0, : len(s_k)] = np.asarray(s_k, np.int32)
        vals_k = np.asarray(_gather_cols_dev(cols_k, jnp.asarray(idx)))
        ints = digits_to_ints(vals_k)
        layer_blocks.append([
            [int(ints[0, t, j]) for t in range(bs)]
            for j in range(len(s_k))
        ])
        layer_nodes.append(_open_nodes_dev(lv, [s_k])[0])

    return AggregateProof(
        n_instances=b,
        roots=roots,
        evals=evals,
        key_evals=key_evals,
        r_eval=r_eval,
        pow_nonce=pow_nonce,
        fri=FriProof(
            layer_roots=layer_roots_all[0],
            final_coeffs=final_coeffs,
            layer_blocks=layer_blocks,
            layer_nodes=layer_nodes,
        ),
        open_blocks=open_blocks,
        open_nodes=open_nodes,
    )


# ---------------------------------------------------------------------------
# Device-resident batched VERIFICATION
# ---------------------------------------------------------------------------


def _chain_nodes_body(node, sibs, poss, perm_fn, pad_to: int = 1):
    """Recompute the root-level digests of K compact openings in one
    traceable chain: node (K, D) canonical digits of the starting
    entries, sibs (K, h, 3, D), poss (K, h). Per level the node is
    re-inserted among its siblings (identical semantics to
    fri._insert_at, out-of-range positions clipped — the host-side
    range check rejects those rows) and the whole K-batch is hashed with
    one permutation. Used by the generic Merkle chain seam
    (parallel/dist.chain_nodes_sharded) and kept as the fused per-path
    verification primitive for classic sibling openings
    (fri.tree_verify_batched's chain_fn)."""
    k, h = poss.shape
    tag = jnp.broadcast_to(jnp.asarray(fri._tag_digits()),
                           (k, 1, N_DIGITS))
    for lvl in range(h):
        pos = poss[:, lvl]
        sl = sibs[:, lvl]
        cols = []
        for j in range(ARITY):
            idx = jnp.clip(jnp.where(j > pos, j - 1, j), 0, ARITY - 2)
            s = jnp.take_along_axis(sl, idx[:, None, None], axis=1)[:, 0]
            cols.append(jnp.where((pos == j)[:, None], node, s))
        children = jnp.stack(cols, axis=1)
        states = jnp.concatenate([tag, children], axis=1)
        pad = (-k) % pad_to
        if pad:
            states = jnp.pad(states, ((0, pad), (0, 0), (0, 0)))
        node = perm_fn(states)[:k, DIGEST_INDEX, :]
    return node


@jax.jit
def _chain_nodes_dev(node: jnp.ndarray, sibs: jnp.ndarray,
                     poss: jnp.ndarray) -> jnp.ndarray:
    from .ops.perm_pallas import default_block, permute_pallas

    return _chain_nodes_body(node, sibs, poss, permute_pallas,
                             pad_to=default_block())


def device_chain_fn(node, sibs, poss):
    """fri chain_fn running a whole sibling-opening chain on the TPU: one
    executable + one digest fetch per pooled height group."""
    return np.asarray(_chain_nodes_dev(
        jnp.asarray(np.asarray(node, np.uint32)),
        jnp.asarray(np.asarray(sibs, np.uint32)),
        jnp.asarray(np.asarray(poss, np.int32)),
    ))


def _mesh_chain_fn(mesh):
    """chain_fn sharding each pooled chain group over a device mesh
    (parallel/dist.chain_nodes_sharded); rows padded to the mesh size
    with zero chains, sliced off (their garbage digests never reach a
    verdict)."""
    from .parallel import dist

    n_dev = mesh.shape[dist.AXIS]

    def chain(node, sibs, poss):
        node = np.asarray(node, np.uint32)
        k = node.shape[0]
        pad = (-k) % n_dev
        if pad:
            node = np.pad(node, ((0, pad), (0, 0)))
            sibs = np.pad(np.asarray(sibs, np.uint32),
                          ((0, pad), (0, 0), (0, 0), (0, 0)))
            poss = np.pad(np.asarray(poss, np.int32), ((0, pad), (0, 0)))
        out = dist.chain_nodes_sharded(node, sibs, poss, mesh)
        return np.asarray(out)[:k]

    return chain


def _device_pool_perm():
    """Batched canonical permutation for the pooled verifier paths,
    running the fused kernel at a fixed padded row count (one executable
    for every pooled batch shape)."""
    from .ops.perm_pallas import default_block, permute_pallas

    block = default_block()

    def perm(states):
        states = np.asarray(states, np.uint32)
        k = states.shape[0]
        pad = (-k) % block
        if pad:
            states = np.concatenate(
                [states,
                 np.zeros((pad,) + states.shape[1:], np.uint32)]
            )
        return np.asarray(permute_pallas(jnp.asarray(states)))[:k]

    return perm


def _fused_verify_plan(entries, q_cap: int):
    """Host index bookkeeping for the fused pooled verifier: mirror
    fri.multiproof_verify_many's per-level merge EXACTLY, but emit it as
    static-shape gather programs the device executes blind. Shapes
    depend only on (entry count, heights, block widths, q_cap) — all
    schema facts — so ONE executable serves every query set (a fresh
    shape through the relay is a fresh server-side compile, CLAUDE.md).

    Per level l the digest buffer is [pool | supplied nodes | zero row]:
    pool rows are the previous level's permutation outputs (level 0: the
    leaf sponges, every entry padded to q_cap rows), node rows are the
    proof's pruned digits padded to 3x the group cap, and every padding
    group gathers the zero row (garbage digests no root extraction ever
    reads). Entry e's level-l group cap is min(q_cap, 4^(h_e-l-1)):
    groups never exceed the surviving known-index count (<= q_cap) nor
    the node count of the next level.

    Returns (leaf_blocks per gid, nodes per level, sels per level,
    root_sels indexed by levels-climbed (0 = the leaf pool, for
    single-leaf trees), root_owner per slot). Entries must satisfy the
    structural invariants fri._check_opening enforces (sorted unique
    in-range indices, exact node counts, <= q_cap openings); violations
    raise — verify_succinct_batched pre-validates every proof before
    entries are built."""
    n_entries = len(entries)
    heights = [int(e[5]) for e in entries]
    max_h = max(heights) if heights else 0
    bs_of_gid = {}
    gid_rows = {}
    last_gid = None
    for e_i, e in enumerate(entries):
        gid, _root, blocks, idx, nodes, height = e
        if gid != last_gid and gid in gid_rows:
            raise ValueError("entries must be grouped by gid")
        last_gid = gid
        bs = e[2].shape[1]
        if bs_of_gid.setdefault(gid, bs) != bs:
            raise ValueError("one block width per gid required")
        gid_rows.setdefault(gid, []).append(e_i)
        idx = [int(i) for i in idx]
        if (not idx or sorted(set(idx)) != idx or len(idx) > q_cap
                or min(idx) < 0 or max(idx) >= ARITY ** int(height)
                or blocks.shape[0] != len(idx)
                or np.asarray(nodes).reshape(-1, N_DIGITS).shape[0]
                != fri.multiproof_nodes_total(idx, int(height))):
            raise ValueError(
                "malformed pooled entry (the batched verifier validates "
                "proofs before building entries)"
            )
        # Digits ride the wire as uint16 (halves the fused phase's relay
        # upload); guard the narrowing so a non-canonical digit can never
        # silently wrap — every backend's digit contract is 16-bit.
        if ((np.asarray(blocks, np.uint32) >> 16).any()
                or (np.asarray(nodes, np.uint32) >> 16).any()):
            raise ValueError("non-canonical (>16-bit) digit in pooled entry")

    def g_cap(h, lvl):
        return min(q_cap, ARITY ** (h - lvl - 1)) if lvl < h else 0

    # leaf sponge inputs: per gid, entries padded to q_cap rows each
    leaf_blocks = []
    for gid, idxs in gid_rows.items():
        bs = bs_of_gid[gid]
        blk = np.zeros((len(idxs) * q_cap, bs, N_DIGITS), np.uint16)
        for k, e_i in enumerate(idxs):
            rows = entries[e_i][2]
            blk[k * q_cap : k * q_cap + rows.shape[0]] = rows
        leaf_blocks.append(blk)

    # static per-level geometry
    off_out, off_nd, g_tot, n_tot = [], [], [], []
    for lvl in range(max_h):
        oo, on = [], []
        go = no = 0
        for h in heights:
            oo.append(go)
            on.append(no)
            g = g_cap(h, lvl)
            go += g
            no += 3 * g
        off_out.append(oo)
        off_nd.append(on)
        g_tot.append(go)
        n_tot.append(no)

    pool_rows = [n_entries * q_cap] + g_tot[:-1]
    nodes_lvls = [np.zeros((n_tot[lvl], N_DIGITS), np.uint16)
                  for lvl in range(max_h)]
    sels = [np.full((g_tot[lvl], ARITY),
                    pool_rows[lvl] + n_tot[lvl], np.int32)
            for lvl in range(max_h)]
    root_sels = [[] for _ in range(max_h + 1)]
    root_owner = [[] for _ in range(max_h + 1)]

    for e_i, (gid, root, blocks, idx, nodes, height) in enumerate(entries):
        plan = fri.multiproof_plan(idx, height)
        nodes = np.asarray(nodes, np.uint32).reshape(-1, N_DIGITS)
        # per-level merge of known rows with supplied nodes, vectorized:
        # known indices and node indices are disjoint and each level's
        # survivor count is a multiple of ARITY, so one argsort of the
        # concatenated keys reproduces multiproof_verify_many's sorted
        # merge and the group rows are a reshape (the dict-per-element
        # form cost ~50-100 ms at B=16 production shape).
        keys = np.asarray(idx, np.int64)
        vals = e_i * q_cap + np.arange(len(idx), dtype=np.int64)
        off = 0
        for lvl in range(height):
            need = np.asarray(plan[lvl], np.int64).reshape(-1)
            base = off_nd[lvl][e_i]
            k = len(need)
            nodes_lvls[lvl][base : base + k] = nodes[off : off + k]
            off += k
            all_keys = np.concatenate([keys, need])
            all_vals = np.concatenate(
                [vals,
                 pool_rows[lvl] + base + np.arange(k, dtype=np.int64)]
            )
            order = np.argsort(all_keys)  # keys are disjoint, so unique
            out0 = off_out[lvl][e_i]
            g = len(all_keys) // ARITY
            sels[lvl][out0 : out0 + g] = all_vals[order].reshape(g, ARITY)
            keys = all_keys[order][::ARITY] >> 2
            vals = out0 + np.arange(g, dtype=np.int64)
        # root row: the entry's single level-(h-1) group output, or its
        # lone leaf digest for a single-leaf tree (height 0)
        row = (off_out[height - 1][e_i] if height
               else e_i * q_cap)
        root_sels[height].append(row)
        root_owner[height].append(e_i)

    return (leaf_blocks, nodes_lvls, sels,
            [np.asarray(r, np.int32) for r in root_sels], root_owner)


def _fused_pool_body(leaf_blocks, nodes_lvls, sels, root_sels, perm_fn,
                     pad_to: int):
    """One traceable body for the verifier's whole pooled Merkle phase:
    every entry's leaf sponges, then one batched permutation per tree
    level over a gather program (_fused_verify_plan). Returns the
    extracted root digests per level.

    Digit buffers arrive uint16 (the plan narrows them — canonical
    digits are 16-bit, guarded there) and widen to the kernel's uint32
    lanes here, on device: the host->device upload is the fused phase's
    dominant byte cost through the relay, and u16 halves it."""
    digs = [
        _sponge_digests_body(jnp.asarray(blk).astype(jnp.uint32),
                             perm_fn, pad_to)
        for blk in leaf_blocks
    ]
    pool = jnp.concatenate(digs, axis=0)
    tag_row = jnp.asarray(fri._tag_digits())
    zero = jnp.zeros((1, N_DIGITS), jnp.uint32)
    roots = [pool[root_sels[0]]]  # single-leaf trees: root = leaf digest
    for lvl in range(len(sels)):
        nodes = jnp.asarray(nodes_lvls[lvl]).astype(jnp.uint32)
        buf = jnp.concatenate([pool, nodes, zero], axis=0)
        children = buf[sels[lvl]]               # (G, ARITY, D)
        g = children.shape[0]
        tag = jnp.broadcast_to(tag_row, (g, 1, N_DIGITS))
        states = jnp.concatenate([tag, children], axis=1)
        pool = _perm_padded(states, perm_fn, pad_to)[:, DIGEST_INDEX]
        roots.append(pool[root_sels[lvl + 1]])
    return tuple(roots)


@jax.jit
def _fused_pool_dev(leaf_blocks, nodes_lvls, sels, root_sels):
    from .ops.perm_pallas import default_block, permute_pallas

    return _fused_pool_body(
        tuple(leaf_blocks), tuple(nodes_lvls), tuple(sels),
        tuple(root_sels), permute_pallas, default_block(),
    )


def fused_entries_check(vk, pool_fn=None):
    """entries_check backend for fri.verify_succinct_batched running the
    WHOLE pooled sponge+multiproof phase as one device executable + one
    root fetch (the host pooled path costs one relay round trip per
    sponge chunk and per tree level — the single-proof latency floor,
    VERDICT r3 #4). Verdicts are identical to fri.pooled_entries_verify:
    the gather program replays multiproof_verify_many's merge order
    exactly, and the roots are compared host-side. pool_fn overrides the
    jitted kernel executable (tests run _fused_pool_body eagerly with
    the host permutation)."""
    q_cap = vk.params.n_queries

    def check(entries):
        ok = np.zeros(len(entries), bool)
        if not entries:
            return ok
        leaf_blocks, nodes_lvls, sels, root_sels, root_owner = (
            _fused_verify_plan(entries, q_cap)
        )
        run = pool_fn if pool_fn is not None else _fused_pool_dev
        roots = run(
            tuple(jnp.asarray(b) for b in leaf_blocks),
            tuple(jnp.asarray(x) for x in nodes_lvls),
            tuple(jnp.asarray(s) for s in sels),
            tuple(jnp.asarray(r) for r in root_sels),
        )
        for slot, owners in enumerate(root_owner):
            if not owners:
                continue
            got = np.asarray(roots[slot], np.uint32)
            for k, e_i in enumerate(owners):
                root = entries[e_i][1]
                want = (
                    ints_to_digits([int(root)], shape=(1,))[0]
                    if isinstance(root, (int, np.integer))
                    else np.asarray(root, np.uint32)
                )
                ok[e_i] = bool(np.array_equal(got[k], want))
        return ok

    return check


def verify_succinct_device_batch(vk, proofs, public_inputs_list,
                                 mesh=None, fused: bool = True
                                 ) -> np.ndarray:
    """Device twin of fri.verify_succinct_batched: identical verdicts
    (the transcript replay, PoW gate, and fold algebra are the same host
    code), with the WHOLE pooled leaf-sponge + multiproof phase fused
    into one device executable and one root fetch (fused_entries_check)
    — the host pooled path's per-level relay round trips were the
    single-proof latency floor. On non-TPU backends this is exactly the
    host pooled path. mesh is accepted for API symmetry; the fused phase
    is already one batched executable.

    fused=False keeps the per-level pooled path on the standard kernel
    executable (always warm once anything has permuted at the canonical
    block) — the right call for ONE verification at a batch shape this
    process hasn't compiled: the fused executable pays a fresh relay
    compile per (batch, schema) shape."""
    del mesh  # pooled multiproof hashing is already level-batched
    if jax.default_backend() != "tpu":
        return fri.verify_succinct_batched(vk, proofs, public_inputs_list)
    if not fused:
        return fri.verify_succinct_batched(vk, proofs, public_inputs_list,
                                           perm_fn=_device_pool_perm())
    return fri.verify_succinct_batched(vk, proofs, public_inputs_list,
                                       entries_check=fused_entries_check(vk))


def verify_aggregate_device(vk, proof, public_inputs_list,
                            mesh=None) -> bool:
    """Device twin of aggregate.verify_aggregate: identical verdict, with
    the WHOLE pooled sponge+multiproof phase as one device executable
    (fused_entries_check). On non-TPU backends this is exactly the host
    path."""
    from . import aggregate

    del mesh
    if jax.default_backend() != "tpu":
        return aggregate.verify_aggregate(vk, proof, public_inputs_list)
    return aggregate.verify_aggregate(vk, proof, public_inputs_list,
                                      entries_check=fused_entries_check(vk))
