"""Device-resident succinct (DEEP-FRI) prover: the flagship crypto path
on the TPU end to end, batched over instances.

fri.prove_succinct is host-side Python big-int: coset NTTs over the
blown-up domain, Merkle tree hashing, the DEEP composition, and the FRI
folds all run as int loops. This module re-executes the SAME protocol
with every O(m0)-sized object living on the device as digit arrays, with
a leading INSTANCE axis throughout:

  * wire/z/t polynomials come from prover_tpu's jitted phases (batched
    NTT interpolation, associative-scan grand product, coset quotient);
  * commitments evaluate each polynomial on L0 with ops/ntt's batched
    coset NTT and hash commitment trees with the fused Pallas
    permutation — each tree's EVERY level in one executable
    (_tree_levels_body), the four wire trees sharing one build — with
    only the roots (32 bytes each) crossing to the host transcripts;
  * the ENTIRE FRI commit phase (per-fold challenge draw, fold, layer
    tree, root absorb) is ONE executable: the Fiat-Shamir sponge runs
    in-trace as (B, 5, D) digit state and the host plonk.Transcript
    resumes from the returned state bit-identically (_fri_phase_body);
  * all claimed evaluations are one device evaluation call
    (_eval_rows_dev); openings are in-trace gather+pack, one call and
    one fetch per tree (_open_all_dev).

The prover is therefore ~8 device round trips end to end regardless of
batch size. Batching matters specifically because of the serving
topology: through a relay the latency is round-trip-bound (PERF.md) —
B instances ride the SAME call sequence and amortize every round trip;
on directly-attached chips the same structure minimizes launch count.

Each emitted SuccinctProof is BIT-IDENTICAL to fri.prove_succinct's for
the same (composer, pk, rng) — same transcripts, same roots, same
openings (tests/test_fri_tpu.py asserts object equality) — so
fri.verify_succinct accepts them unchanged and the host prover remains
the auditable oracle. Both modes (plain and zk) are supported; zk
blinding draws each instance's randomness stream identically to the host
and applies it on device.

On non-TPU backends the tree hashing falls back to the host path
(fri.tree_build_digits with the native/emulated permutation) while the
polynomial phases still run through the traced JAX ops — which is what
the CPU tests exercise.

Two prover entry shapes: prove_succinct_device_batch emits B independent
SuccinctProofs (per-instance transcripts), prove_aggregate_device emits
ONE AggregateProof for B instances (shared transcript, block trees, one
DEEP-FRI — aggregate.py's argument). Both accept mesh= to shard the
polynomial phases over instances (multi-chip data parallelism).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import field, fri, plonk, prover_tpu
from .fri import (
    ARITY,
    DIGEST_INDEX,
    EVAL_ORDER,
    G0,
    SELECTOR_NAMES,
    SIGMA_NAMES,
    FriProof,
    ProvingKey,
    SuccinctProof,
    _bounds,
    _tree_height,
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


_PK_DEV_CACHE: dict = {}


def _pk_key_evals(pk: ProvingKey) -> np.ndarray:
    """(10, m0, D) canonical digits of the preprocessed selector/sigma
    evaluations on L0 (cached per proving key)."""
    cached = _PK_DEV_CACHE.get(id(pk))
    if cached is not None and cached[0] is pk:
        return cached[1]
    names = SELECTOR_NAMES + SIGMA_NAMES
    rows = [pk.key_coms[name].evals for name in names]
    m0 = len(rows[0])
    arr = ints_to_digits([v for row in rows for v in row],
                         shape=(len(names), m0))
    _PK_DEV_CACHE[id(pk)] = (pk, arr)
    return arr


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
    """All arity-4 tree levels from (B, N, D) padded leaves (N a power of
    4), node rule identical to fri.tree_build: every level is one batched
    permutation over all B rows' nodes. One traceable body, so the whole
    build compiles to ONE device executable — through a relay the
    per-level launch round trips, not the hashing, dominated the prover
    (PERF.md); they also shrink the launch count on directly-attached
    chips.

    pad_to: pad every level's permutation batch up to a multiple of this
    (padding rows are zeros, sliced off after the perm — digests
    unchanged). The device path passes the kernel's canonical block so
    EVERY call site in every tree executable uses the one (block, shape)
    kernel variant: sub-block levels would otherwise each compile their
    own small-block Mosaic kernel (the slowest compiles on record,
    CLAUDE.md) per tree shape, since fusing levels into one executable
    forfeits the cross-tree executable sharing the per-level path had.
    The padded hashing itself is microseconds per level."""
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


@jax.jit
def _tree_levels_dev(level: jnp.ndarray) -> tuple:
    from .ops.perm_pallas import default_block, permute_pallas

    return _tree_levels_body(level, permute_pallas,
                             pad_to=default_block())


def _build_levels(leaves) -> list:
    """All tree levels for a (B, N, D) digit leaf batch. On TPU the
    levels stay device-resident and the whole build is a single fused
    executable (_tree_levels_dev); elsewhere the host path (native/
    emulated perm) builds them per instance — digests are bit-identical
    either way (KAT gates)."""
    if jax.default_backend() != "tpu":
        host = [
            fri.tree_build_digits(np.asarray(leaves[i]),
                                  fri.default_pcs_perm())
            for i in range(leaves.shape[0])
        ]
        return [np.stack([host[i][lvl] for i in range(len(host))])
                for lvl in range(len(host[0]))]
    b, n = leaves.shape[0], leaves.shape[1]
    full = ARITY ** _tree_height(n)
    level = jnp.pad(jnp.asarray(leaves), ((0, 0), (0, full - n), (0, 0)))
    return list(_tree_levels_dev(level))


def _root_ints(levels) -> list:
    """(B,) root ints from the last (B, 1, D) level."""
    return [int(v) for v in digits_to_ints(np.asarray(levels[-1])[:, 0])]


@jax.jit
def _open_all_dev(levels: tuple, idx: jnp.ndarray):
    """Compact batched openings for every instance, entirely in-trace:
    levels a tuple of (B, N_lvl, D) arrays, idx (B, K) int32. Returns
    (sibs (B, K, h, 3, D), poss (B, K, h)) — per instance bit-identical
    to fri.tree_open_batched. ONE executable + one fetch per tree instead
    of a gather launch per level plus a host sibling-packing loop."""
    b, k = idx.shape
    sibs_lvls, poss_lvls = [], []
    cur = idx
    for lvl in range(len(levels) - 1):
        g = cur // ARITY
        pos = cur % ARITY
        grouped = levels[lvl].reshape(b, -1, ARITY, N_DIGITS)
        groups = jnp.take_along_axis(
            grouped, g[:, :, None, None], axis=1
        )  # (B, K, 4, D)
        cols = []
        for j in range(ARITY - 1):
            # sibling slot j holds group child j, skipping the node's pos
            src = jnp.where(j >= pos, j + 1, j)  # (B, K)
            cols.append(jnp.take_along_axis(
                groups, src[:, :, None, None], axis=2
            )[:, :, 0])
        sibs_lvls.append(jnp.stack(cols, axis=2))  # (B, K, 3, D)
        poss_lvls.append(pos)
        cur = g
    return (jnp.stack(sibs_lvls, axis=2),
            jnp.stack(poss_lvls, axis=2).astype(jnp.int32))


def _open_batched_dev(levels, indices_b: np.ndarray):
    """Compact batched openings for every instance — per instance
    bit-identical to fri.tree_open_batched. indices_b: (B, K). Returns
    host (sibs (B, K, h, 3, D), poss (B, K, h)) from one device call."""
    idx = np.asarray(indices_b, np.int32)
    if len(levels) == 1:  # height-0 tree: nothing to open
        b, k = idx.shape
        return (np.empty((b, k, 0, ARITY - 1, N_DIGITS), np.uint32),
                np.empty((b, k, 0), np.int32))
    sibs, poss = _open_all_dev(
        tuple(jnp.asarray(lv) for lv in levels), jnp.asarray(idx)
    )
    return np.asarray(sibs), np.asarray(poss)


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


def _key_coeff_digits(pk: ProvingKey) -> np.ndarray:
    """(10, n, D) canonical coefficient digits of the selector + sigma
    polynomials, cached per circuit digest."""
    cached = _KEY_COEFF_CACHE.get(pk.digest)
    if cached is not None:
        return cached
    key = pk.key
    rows = [key.selectors[name] for name in SELECTOR_NAMES]
    rows += [key.sigmas[j] for j in range(len(SIGMA_NAMES))]
    out = ints_to_digits(
        [v % P for row in rows for v in row], shape=(len(rows), key.n)
    )
    _KEY_COEFF_CACHE[pk.digest] = out
    return out


_KEY_COEFF_CACHE: dict = {}


def _claimed_eval_ints(wires_dev, z_dev, t_dev, pk: ProvingKey,
                       zetas: list, omega: int):
    """All claimed evaluations for B instances in ONE device call + ONE
    small fetch: per instance the rows a, b, o, d, z @ zeta_i, z @
    omega*zeta_i, t @ zeta_i, then the 10 key polynomials @ zeta_i.
    Returns an object array (B, 17) of canonical ints, bit-identical to
    host Horner (plonk.poly_eval) per entry. Replaces fetching the full
    coefficient arrays (the ~0.6 MB slow-path transfer, PERF.md) plus
    B x 17 host big-int Horner passes.

    On non-TPU backends the host Horner path runs instead (same values;
    the device evaluator's bit-identity is pinned by its own unit test) —
    XLA:CPU's compile of the scan-heavy Montgomery graphs costs far more
    than it saves there, exactly like the _build_levels tree fallback."""
    b = wires_dev.shape[0]
    if jax.default_backend() != "tpu":
        from .plonk import poly_eval

        key = pk.key
        wires_np, z_np, t_np = (np.asarray(wires_dev), np.asarray(z_dev),
                                np.asarray(t_dev))
        out = np.empty((b, 17), dtype=object)
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
            out[i, 7:] = key_cache[z_]
        return out
    key_tab = jnp.asarray(_key_coeff_digits(pk))
    ln = max(wires_dev.shape[2], z_dev.shape[1], t_dev.shape[1],
             key_tab.shape[1])

    def pad_l(x):
        width = [(0, 0)] * (x.ndim - 2) + [(0, ln - x.shape[-2]), (0, 0)]
        return jnp.pad(x, width)

    rows = jnp.concatenate(
        [
            pad_l(wires_dev),                       # a b o d @ zeta
            pad_l(z_dev[:, None]),                  # z  @ zeta
            pad_l(z_dev[:, None]),                  # z  @ omega*zeta
            pad_l(t_dev[:, None]),                  # t  @ zeta
            jnp.broadcast_to(
                pad_l(key_tab)[None],
                (b, key_tab.shape[0], ln, N_DIGITS),
            ),
        ],
        axis=1,
    )  # (B, 17, ln, D)
    pts_int = [
        [z_] * 5 + [z_ * omega % P] + [z_] * 11 for z_ in zetas
    ]
    pts = jnp.asarray(ints_to_digits(pts_int, shape=(b, rows.shape[1])))
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


def _deep_dev(stack, vs, gammas, pows, inv_a, inv_b, spec):
    """F on L0 per instance: stack (B, T_rows, m0, D) poly evaluations;
    vs (B, T, D) claimed values; gammas (B, T, D) Montgomery gdeep powers;
    pows (S, m0, D) shared Montgomery x^s tables; inv_a/inv_b (B, m0, D)
    Montgomery 1/(x - zeta_i), 1/(x - omega*zeta_i); spec: static tuple
    of (row, s_index, shifted). Returns (B, m0, D)."""
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


def _perm_padded(states, perm_fn, pad_to: int):
    """Batched canonical permutation padded to the kernel's canonical
    block (zeros sliced off) — same rationale as _tree_levels_body."""
    b = states.shape[0]
    pad = (-b) % pad_to
    if pad:
        states = jnp.pad(states, ((0, pad), (0, 0), (0, 0)))
    return perm_fn(states)[:b]


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


def _fri_phase_body(f0, tr_state, xinvs, inv2, perm_fn, pad_to: int):
    """The WHOLE FRI commit phase as one traceable body: per fold k draw
    beta_k from the in-trace transcript, fold the (B, m_k, D) evaluations,
    and (below the final layer) build the commitment tree and absorb its
    root — exactly the host prover's challenge/fold/absorb sequence, so
    the returned transcript state continues the host stream bit-
    identically. Through a relay this turns ~3(n_folds-1) round trips
    (fold exec + tree exec + root fetch per layer) into ONE executable +
    one fetch (PERF.md).

    f0 (B, m0, D) canonical DEEP-composition evals; tr_state (B, 5, D)
    canonical transcript states; xinvs: tuple of (m_k/2, D) Montgomery
    fold tables (their count = n_folds); inv2 Montgomery 1/2. Returns
    (final_evals, tr_state, layer_evals tuple, layer_levels tuple of
    level-tuples)."""
    cur = f0
    layer_evals, layer_levels = [], []
    n_folds = len(xinvs)
    for k, xinv in enumerate(xinvs, start=1):
        beta, tr_state = _tr_challenge(tr_state, perm_fn, pad_to)
        cur = _fold_dev(cur, field.to_mont(beta), jnp.asarray(xinv), inv2)
        if k < n_folds:
            # zero-pad the leaf count to a power of 4 exactly like
            # fri.tree_build / _build_levels before hashing
            n = cur.shape[1]
            full = ARITY ** _tree_height(n)
            lvl0 = (jnp.pad(cur, ((0, 0), (0, full - n), (0, 0)))
                    if full > n else cur)
            levels = _tree_levels_body(lvl0, perm_fn, pad_to)
            tr_state = _tr_absorb1(tr_state, levels[-1][:, 0], perm_fn,
                                   pad_to)
            layer_evals.append(cur)
            layer_levels.append(levels)
    return cur, tr_state, tuple(layer_evals), tuple(layer_levels)


@jax.jit
def _fri_phase_dev(f0, tr_state, xinvs, inv2):
    from .ops.perm_pallas import default_block, permute_pallas

    return _fri_phase_body(f0, tr_state, xinvs, inv2, permute_pallas,
                           default_block())


# ---------------------------------------------------------------------------
# The device prover (batched over instances)
# ---------------------------------------------------------------------------


def _ints_row(arr) -> list:
    return [int(v) for v in digits_to_ints(np.asarray(arr))]


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
    bounds = _bounds(n, params)
    d_bound = bounds["D"]
    m0 = params.blowup * d_bound
    final_degree = min(params.final_degree, d_bound // 2)
    n_folds = (d_bound // final_degree).bit_length() - 1
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
        # prover: wires a..d (zkw draws each), later z (zkz draws)
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
    # one fused build + ONE root fetch for all four wire trees: rows are
    # name-major ((4, B, m0, D) flattened) so each name is a contiguous
    # slice of every level
    abod_rows = jnp.transpose(wires_l0, (1, 0, 2, 3)).reshape(
        4 * b, m0, N_DIGITS
    )
    abod_levels = _build_levels(abod_rows)
    abod_roots = _root_ints(abod_levels)
    levels = {}
    roots = {}
    for j, name in enumerate("abod"):
        levels[name] = [lv[j * b : (j + 1) * b] for lv in abod_levels]
        roots[name] = abod_roots[j * b : (j + 1) * b]
        for i in range(b):
            trs[i].absorb(roots[name][i])
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
    levels["z"] = _build_levels(z_l0)
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
    levels["t"] = _build_levels(t_l0)
    roots["t"] = _root_ints(levels["t"])
    for i in range(b):
        trs[i].absorb(roots["t"][i])
    zetas = [tr.challenge() for tr in trs]

    # --- claimed evaluations: one device call + one small fetch -----------
    row_names = (["a", "b", "o", "d", "z", "zw", "t"]
                 + list(SELECTOR_NAMES) + list(SIGMA_NAMES))
    vals = _claimed_eval_ints(wires_dev, z_dev, t_dev, pk, zetas, omega)
    evals_all = []
    for i in range(b):
        ev = {name: int(vals[i, j]) for j, name in enumerate(row_names)}
        trs[i].absorb(*[ev[name] for name in EVAL_ORDER])
        evals_all.append(ev)
    gdeeps = [tr.challenge() for tr in trs]

    # --- DEEP composition on device ---------------------------------------
    key_rows = jnp.asarray(_pk_key_evals(pk))             # (10, m0, D)
    stack = jnp.concatenate(
        [wires_l0, z_l0[:, None], t_l0[:, None],
         jnp.broadcast_to(key_rows[None], (b,) + key_rows.shape)],
        axis=1,
    )  # (B, 16, m0, D): a b o d z t q_m..q_c s0..s3
    row_of = {"a": 0, "b": 1, "o": 2, "d": 3, "z": 4, "t": 5}
    for j, name in enumerate(SELECTOR_NAMES + SIGMA_NAMES):
        row_of[name] = 6 + j
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

    # --- FRI commit phase on device ---------------------------------------
    inv2_mont = jnp.asarray(_scalar_mont((P + 1) // 2))
    xinvs, shift, size = [], G0, m0
    for _ in range(n_folds):
        xinvs.append(_xinv_mont(size, shift))
        shift = shift * shift % P
        size //= 2
    layer_data = []  # (evals (B, m_k, D), levels)
    layer_roots_all = [[] for _ in range(b)]
    if jax.default_backend() == "tpu":
        # the whole phase — per-fold challenge draw, fold, tree build,
        # root absorb — runs as ONE executable with the in-trace
        # transcript (_fri_phase_dev); the host transcripts sync to the
        # post-phase sponge states and continue the stream
        tr_state = jnp.asarray(ints_to_digits(
            [v for tr in trs for v in tr.state], shape=(b, 5)
        ))
        cur, tr_state, layer_evals, layer_levels = _fri_phase_dev(
            f_dev, tr_state, tuple(jnp.asarray(x) for x in xinvs),
            inv2_mont,
        )
        layer_data = [(ev, list(lv))
                      for ev, lv in zip(layer_evals, layer_levels)]
        if layer_levels:
            roots_np = digits_to_ints(np.asarray(jnp.stack(
                [lv[-1][:, 0] for lv in layer_levels], axis=1
            )))  # (B, n_folds-1) — ONE fetch for every layer root
            for i in range(b):
                layer_roots_all[i] = [int(v) for v in roots_np[i]]
        state_ints = digits_to_ints(np.asarray(tr_state))
        for i in range(b):
            trs[i].set_state([int(v) for v in state_ints[i]])
    else:
        cur = f_dev
        for k_fold in range(1, n_folds + 1):
            beta_ks = [tr.challenge() for tr in trs]
            bm = jnp.asarray(ints_to_digits(
                [v * R % P for v in beta_ks], shape=(b,)
            ))
            cur = _fold_dev(cur, bm, jnp.asarray(xinvs[k_fold - 1]),
                            inv2_mont)
            if k_fold < n_folds:
                lv = _build_levels(cur)
                rts = _root_ints(lv)
                layer_data.append((cur, lv))
                for i in range(b):
                    layer_roots_all[i].append(rts[i])
                    trs[i].absorb(rts[i])
    final_np = np.asarray(cur)
    final_coeffs_all = []
    for i in range(b):
        fc = fri._coset_interp(_ints_row(final_np[i]), shift)
        if any(c_ % P for c_ in fc[final_degree:]):
            raise ValueError(
                "FRI final layer exceeds its degree bound — the witness "
                "does not satisfy the circuit (instance %d)" % i
            )
        fc = fc[:final_degree]
        final_coeffs_all.append(fc)
        trs[i].absorb(*fc)

    half0 = m0 // 2
    queries_all = [
        [tr.challenge() % half0 for _ in range(params.n_queries)]
        for tr in trs
    ]

    # --- openings (batched device gathers, small fetches) -----------------
    idx0 = np.asarray([
        [v for q in queries_all[i] for v in (q, q + half0)]
        for i in range(b)
    ])  # (B, 2Q)
    l0_rows = {"a": wires_l0[:, 0], "b": wires_l0[:, 1],
               "o": wires_l0[:, 2], "d": wires_l0[:, 3],
               "z": z_l0, "t": t_l0}
    for j, name in enumerate(SELECTOR_NAMES + SIGMA_NAMES):
        l0_rows[name] = jnp.broadcast_to(
            key_rows[j][None], (b,) + key_rows[j].shape
        )
    all_names = list("abod") + ["z", "t"] + list(
        SELECTOR_NAMES + SIGMA_NAMES
    )
    open_values = {n_: [] for n_ in all_names}
    open_sibs = {n_: [] for n_ in all_names}
    open_poss = {n_: [] for n_ in all_names}
    for name in all_names:
        rows = l0_rows[name]
        vals = np.asarray(jnp.take_along_axis(
            jnp.asarray(rows), jnp.asarray(idx0)[:, :, None], axis=1
        ))  # (B, 2Q, D)
        ints = digits_to_ints(vals)
        for i in range(b):
            open_values[name].append([
                [int(ints[i, 2 * qi]), int(ints[i, 2 * qi + 1])]
                for qi in range(params.n_queries)
            ])
        if name in levels:
            sibs, poss = _open_batched_dev(levels[name], idx0)
            for i in range(b):
                open_sibs[name].append(sibs[i])
                open_poss[name].append(poss[i])
        else:
            # key-polynomial trees live in the proving key (host numpy),
            # shared across instances; open per instance
            for i in range(b):
                s_, p_ = fri.tree_open_batched(
                    pk.key_coms[name].levels, idx0[i]
                )
                open_sibs[name].append(s_)
                open_poss[name].append(p_)

    layer_values_all = [[] for _ in range(b)]
    layer_sibs_all = [[] for _ in range(b)]
    layer_poss_all = [[] for _ in range(b)]
    for k_fold in range(1, n_folds):
        m_k = m0 >> k_fold
        half_k = m_k // 2
        idx = np.asarray([
            [v for q in queries_all[i]
             for v in ((q % m_k) % half_k, (q % m_k) % half_k + half_k)]
            for i in range(b)
        ])
        cur_k, lv = layer_data[k_fold - 1]
        vals = np.asarray(jnp.take_along_axis(
            jnp.asarray(cur_k), jnp.asarray(idx)[:, :, None], axis=1
        ))
        ints = digits_to_ints(vals)
        sibs, poss = _open_batched_dev(lv, idx)
        for i in range(b):
            layer_values_all[i].append([
                [int(ints[i, 2 * qi]), int(ints[i, 2 * qi + 1])]
                for qi in range(params.n_queries)
            ])
            layer_sibs_all[i].append(sibs[i])
            layer_poss_all[i].append(poss[i])

    proofs = []
    for i in range(b):
        fri_proof = FriProof(
            layer_roots=layer_roots_all[i],
            final_coeffs=final_coeffs_all[i],
            layer_values=layer_values_all[i],
            layer_sibs=layer_sibs_all[i],
            layer_poss=layer_poss_all[i],
        )
        proofs.append(SuccinctProof(
            roots={name: roots[name][i] for name in roots},
            evals=evals_all[i],
            fri=fri_proof,
            open_values={n_: open_values[n_][i] for n_ in all_names},
            open_sibs={n_: open_sibs[n_][i] for n_ in all_names},
            open_poss={n_: open_poss[n_][i] for n_ in all_names},
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
    for B same-circuit instances, with the polynomial phases, block-tree
    hashing, DEEP composition, and FRI folds on the device. Output is
    BIT-IDENTICAL to aggregate.prove_aggregate(composers, pk, rng=rng)
    for the same randomness stream (tests/test_fri_tpu.py), so
    aggregate.verify_aggregate accepts it unchanged and the host
    aggregate prover remains the auditable oracle.

    vs prove_succinct_device_batch: challenges are SHARED (one
    transcript, block commitments binding every instance before each
    draw), the 6 wire-family trees hold B-value leaf blocks, and one
    DEEP-FRI covers all B*7 wire claims + the 10 key claims."""
    from .aggregate import (
        AggregateProof,
        KEY_EVAL_ORDER,
        WIRE_EVAL_ORDER,
        WIRE_NAMES,
        _absorb_statement,
        _agg_terms,
    )

    if not composers:
        raise ValueError("at least one composer required")
    phase1, phase2, phase3 = _select_phases(mesh, len(composers))
    key, params = pk.key, pk.params
    n, omega = key.n, key.omega
    b = len(composers)
    bounds = _bounds(n, params)
    d_bound = bounds["D"]
    m0 = params.blowup * d_bound
    final_degree = min(params.final_degree, d_bound // 2)
    n_folds = (d_bound // final_degree).bit_length() - 1
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

    pad = ARITY ** fri.block_levels_for(b)
    bl = fri.block_levels_for(b)

    def block_leaves(evals_rows: jnp.ndarray) -> jnp.ndarray:
        """(F, B, m0, D) family evaluations -> (F, m0*pad, D) block-leaf
        vectors (position-major, instance within block, zero-padded) —
        the device layout of fri.tree_build_blocks' flat vector."""
        f_ = evals_rows.shape[0]
        x = jnp.transpose(evals_rows, (0, 2, 1, 3))  # (F, m0, B, D)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad - b), (0, 0)))
        return x.reshape(f_, m0 * pad, N_DIGITS)

    wires_l0 = _coset_eval_dev(wires_dev, m0)             # (B, 4, m0, D)
    abod_rows = jnp.transpose(wires_l0, (1, 0, 2, 3))     # (4, B, m0, D)
    abod_levels = _build_levels(block_leaves(abod_rows))
    abod_roots = _root_ints(abod_levels)
    levels = {}
    roots = {}
    for j, name in enumerate("abod"):
        levels[name] = [lv[j] for lv in abod_levels]
        roots[name] = abod_roots[j]
        tr.absorb(roots[name])
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
    z_levels = _build_levels(block_leaves(z_l0[None]))
    levels["z"] = [lv[0] for lv in z_levels]
    roots["z"] = _root_ints(z_levels)[0]
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
    t_levels = _build_levels(block_leaves(t_l0[None]))
    levels["t"] = [lv[0] for lv in t_levels]
    roots["t"] = _root_ints(t_levels)[0]
    tr.absorb(roots["t"])
    zeta = tr.challenge()

    # --- claimed evaluations: one device call + one small fetch -----------
    # same 17-row executable as the batch prover (key rows shared, read
    # once from instance 0)
    vals = _claimed_eval_ints(wires_dev, z_dev, t_dev, pk,
                              [zeta] * b, omega)
    wire_rows = ["a", "b", "o", "d", "z", "zw", "t"]
    evals = [
        {name: int(vals[i, j]) for j, name in enumerate(wire_rows)}
        for i in range(b)
    ]
    key_evals = {
        name: int(vals[0, len(wire_rows) + j])
        for j, name in enumerate(SELECTOR_NAMES + SIGMA_NAMES)
    }
    for e in evals:
        tr.absorb(*[e[name] for name in WIRE_EVAL_ORDER])
    tr.absorb(*[key_evals[name] for name in KEY_EVAL_ORDER])
    gdeep = tr.challenge()

    # --- one DEEP composition over all B*7 + 10 claims --------------------
    key_rows = jnp.asarray(_pk_key_evals(pk))             # (10, m0, D)
    inst_rows = jnp.concatenate(
        [wires_l0, z_l0[:, None], t_l0[:, None]], axis=1
    )  # (B, 6, m0, D)
    stack = jnp.concatenate(
        [inst_rows.reshape(b * 6, m0, N_DIGITS), key_rows], axis=0
    )[None]  # (1, 6B+10, m0, D)
    wire_row = {"a": 0, "b": 1, "o": 2, "d": 3, "z": 4, "t": 5}
    key_row = {name: 6 * b + j
               for j, name in enumerate(SELECTOR_NAMES + SIGMA_NAMES)}
    agg_terms = _agg_terms(bounds, b)
    s_values = sorted({d_bound + 1 - dj for (_, _, _, _, dj) in agg_terms})
    pows = jnp.asarray(np.stack([_pow_mont(m0, s) for s in s_values]))
    spec = tuple(
        ((key_row[pname] if j is None else 6 * j + wire_row[pname]),
         s_values.index(d_bound + 1 - dj), shifted)
        for (j, pname, ename, shifted, dj) in agg_terms
    )
    vs_int = [
        (key_evals[ename] if j is None else evals[j][ename])
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

    # --- one FRI commit phase ---------------------------------------------
    inv2_mont = jnp.asarray(_scalar_mont((P + 1) // 2))
    xinvs, shift, size = [], G0, m0
    for _ in range(n_folds):
        xinvs.append(_xinv_mont(size, shift))
        shift = shift * shift % P
        size //= 2
    layer_data = []
    layer_roots = []
    if jax.default_backend() == "tpu":
        # one executable for the whole phase, shared transcript in-trace
        # (see _fri_phase_body); the host transcript resumes afterwards
        tr_state = jnp.asarray(ints_to_digits(tr.state, shape=(1, 5)))
        cur, tr_state, layer_evals, layer_levels = _fri_phase_dev(
            f_dev, tr_state, tuple(jnp.asarray(x) for x in xinvs),
            inv2_mont,
        )
        layer_data = [(ev, list(lv))
                      for ev, lv in zip(layer_evals, layer_levels)]
        if layer_levels:
            roots_np = digits_to_ints(np.asarray(jnp.stack(
                [lv[-1][:, 0] for lv in layer_levels], axis=1
            )))
            layer_roots = [int(v) for v in roots_np[0]]
        tr.set_state([int(v) for v in digits_to_ints(
            np.asarray(tr_state))[0]])
    else:
        cur = f_dev
        for k_fold in range(1, n_folds + 1):
            beta_k = tr.challenge()
            bm = jnp.asarray(ints_to_digits([beta_k * R % P], shape=(1,)))
            cur = _fold_dev(cur, bm, jnp.asarray(xinvs[k_fold - 1]),
                            inv2_mont)
            if k_fold < n_folds:
                lv = _build_levels(cur)
                rt = _root_ints(lv)[0]
                layer_data.append((cur, lv))
                layer_roots.append(rt)
                tr.absorb(rt)
    final_coeffs = fri._coset_interp(_ints_row(np.asarray(cur)[0]), shift)
    if any(c_ % P for c_ in final_coeffs[final_degree:]):
        raise ValueError(
            "FRI final layer exceeds its degree bound — some witness "
            "does not satisfy the circuit"
        )
    final_coeffs = final_coeffs[:final_degree]
    tr.absorb(*final_coeffs)

    half0 = m0 // 2
    queries = [tr.challenge() % half0 for _ in range(params.n_queries)]
    idx0 = np.asarray([v for q in queries for v in (q, q + half0)])

    # --- openings ---------------------------------------------------------
    l0_rows = {"a": wires_l0[:, 0], "b": wires_l0[:, 1],
               "o": wires_l0[:, 2], "d": wires_l0[:, 3],
               "z": z_l0, "t": t_l0}
    open_values, open_sibs, open_poss = {}, {}, {}
    for name in WIRE_NAMES:
        vals = np.asarray(jnp.take_along_axis(
            jnp.asarray(l0_rows[name]),
            jnp.asarray(idx0)[None, :, None], axis=1
        ))  # (B, 2Q, D)
        ints = digits_to_ints(vals)
        open_values[name] = [
            [[int(ints[i, 2 * qi]) for i in range(b)],
             [int(ints[i, 2 * qi + 1]) for i in range(b)]]
            for qi in range(params.n_queries)
        ]
        upper = [lv[None] for lv in levels[name][bl:]]
        sibs, poss = _open_batched_dev(upper, idx0[None])
        open_sibs[name] = sibs[0]
        open_poss[name] = poss[0]
    key_open_values, key_open_sibs, key_open_poss = {}, {}, {}
    for name, com in pk.key_coms.items():
        key_open_values[name] = [
            [com.evals[q], com.evals[q + half0]] for q in queries
        ]
        key_open_sibs[name], key_open_poss[name] = fri.tree_open_batched(
            com.levels, idx0
        )

    layer_values, layer_sibs, layer_poss = [], [], []
    for k_fold in range(1, n_folds):
        m_k = m0 >> k_fold
        half_k = m_k // 2
        idx = np.asarray([
            v for q in queries
            for v in ((q % m_k) % half_k, (q % m_k) % half_k + half_k)
        ])
        cur_k, lv = layer_data[k_fold - 1]
        vals = np.asarray(jnp.take_along_axis(
            jnp.asarray(cur_k), jnp.asarray(idx)[None, :, None], axis=1
        ))
        ints = digits_to_ints(vals)[0]
        sibs, poss = _open_batched_dev(lv, idx[None])
        layer_values.append([
            [int(ints[2 * qi]), int(ints[2 * qi + 1])]
            for qi in range(params.n_queries)
        ])
        layer_sibs.append(sibs[0])
        layer_poss.append(poss[0])

    return AggregateProof(
        n_instances=b,
        roots=roots,
        evals=evals,
        key_evals=key_evals,
        fri=FriProof(
            layer_roots=layer_roots,
            final_coeffs=final_coeffs,
            layer_values=layer_values,
            layer_sibs=layer_sibs,
            layer_poss=layer_poss,
        ),
        open_values=open_values,
        open_sibs=open_sibs,
        open_poss=open_poss,
        key_open_values=key_open_values,
        key_open_sibs=key_open_sibs,
        key_open_poss=key_open_poss,
    )


# ---------------------------------------------------------------------------
# Device-resident batched VERIFICATION (fused opening chains)
# ---------------------------------------------------------------------------


def _chain_nodes_body(node, sibs, poss, perm_fn, pad_to: int = 1):
    """Recompute the root-level digests of K compact openings in one
    traceable chain: node (K, D) canonical digits of the starting
    entries, sibs (K, h, 3, D), poss (K, h). Per level the node is
    re-inserted among its siblings (identical semantics to
    fri._insert_at, out-of-range positions clipped — the host-side
    range check rejects those rows) and the whole K-batch is hashed with
    one permutation. One traceable body, so a pooled height group's
    entire h-level chain compiles to ONE device executable — the pooled
    verifier otherwise pays one round trip per level (PERF.md).

    pad_to: pad the permutation batch to the kernel's canonical block,
    same rationale as _tree_levels_body."""
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
    """fri chain_fn running the whole opening chain on the TPU: one
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


def verify_succinct_device_batch(vk, proofs, public_inputs_list,
                                 mesh=None) -> np.ndarray:
    """Device twin of fri.verify_succinct_batched: identical verdicts
    (the transcript replay, range/index checks, and fold algebra are the
    same host code), but every pooled Merkle opening chain runs as ONE
    fused-kernel executable on the TPU instead of one permutation call
    per level. mesh= shards the chains over a device mesh (verification
    rows are independent — communication-free data parallelism). On
    non-TPU backends without a mesh this is exactly the host-pooled path.

    Reference anchor: the verification half of the prove/verify cycle
    the reference exercises through dusk-plonk
    (/root/reference/src/strategies/gadget.rs:198-223)."""
    if mesh is not None:
        return fri.verify_succinct_batched(vk, proofs, public_inputs_list,
                                           chain_fn=_mesh_chain_fn(mesh))
    if jax.default_backend() != "tpu":
        return fri.verify_succinct_batched(vk, proofs, public_inputs_list)
    return fri.verify_succinct_batched(vk, proofs, public_inputs_list,
                                       chain_fn=device_chain_fn)


def verify_aggregate_device(vk, proof, public_inputs_list,
                            mesh=None) -> bool:
    """Device twin of aggregate.verify_aggregate: identical verdict, with
    every opening-path chain (wire block trees, key trees, FRI layers)
    fused into one device executable per call via the chain seam; mesh=
    shards the chains over a device mesh. The block-subtree collapse and
    all transcript/fold algebra stay host-side (they are small). On
    non-TPU backends without a mesh this is exactly the host path."""
    from . import aggregate

    if mesh is not None:
        return aggregate.verify_aggregate(vk, proof, public_inputs_list,
                                          chain_fn=_mesh_chain_fn(mesh))
    if jax.default_backend() != "tpu":
        return aggregate.verify_aggregate(vk, proof, public_inputs_list)
    return aggregate.verify_aggregate(vk, proof, public_inputs_list,
                                      chain_fn=device_chain_fn)
