"""Device-resident succinct (DEEP-FRI) prover: the flagship crypto path
on the TPU end to end.

fri.prove_succinct is host-side Python big-int: coset NTTs over the
blown-up domain, Merkle tree hashing, the DEEP composition, and the FRI
folds all run as int loops. This module re-executes the SAME protocol
with every O(m0)-sized object living on the device as digit arrays:

  * wire/z/t polynomials come from prover_tpu's jitted phases (batched
    NTT interpolation, associative-scan grand product, coset quotient);
  * commitments evaluate each polynomial on L0 with ops/ntt's batched
    coset NTT and hash the arity-4 tree levels with the fused Pallas
    permutation, level by level, entirely on device (roots — 32 bytes —
    are all that crosses to the host transcript);
  * the DEEP composition and every FRI fold are batched field ops
    (Montgomery-form constant tables precomputed host-side, cached);
  * only transcript scalars, the small final-layer coefficients, and the
    query openings (device gathers) are ever fetched.

The emitted SuccinctProof is BIT-IDENTICAL to fri.prove_succinct's for
the same (composer, pk, rng) — same transcripts, same roots, same
openings (tests/test_fri_tpu.py asserts object equality) — so
fri.verify_succinct accepts it unchanged and the host prover remains the
auditable oracle. Both modes (plain and zk) are supported; zk blinding
draws the identical randomness stream and applies it on device.

On non-TPU backends the tree hashing falls back to the host path
(fri.tree_build_digits with the native/emulated permutation) while the
polynomial phases still run through the traced JAX ops — which is what
the CPU tests exercise.
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
from .plonk import Transcript, _domain_root, poly_eval, statement_digest
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
# Device primitives
# ---------------------------------------------------------------------------


def _coset_eval_dev(coeffs: jnp.ndarray, m0: int) -> jnp.ndarray:
    """(..., L, D) coefficients (L <= m0) -> evaluations on L0."""
    from .ops import ntt

    pad = m0 - coeffs.shape[-2]
    width = [(0, 0)] * (coeffs.ndim - 2) + [(0, pad), (0, 0)]
    return ntt.coset_eval_batched(jnp.pad(coeffs, width), G0)


@jax.jit
def _level_up_dev(level: jnp.ndarray) -> jnp.ndarray:
    """One PCS-tree level on device: (N, D) -> (N/4, D) parent digests
    via the fused kernel (node rule identical to fri.tree_build)."""
    from .ops.perm_pallas import permute_pallas

    k = level.shape[0] // ARITY
    children = level.reshape(k, ARITY, N_DIGITS)
    tag = jnp.broadcast_to(jnp.asarray(fri._tag_digits()),
                           (k, 1, N_DIGITS))
    states = jnp.concatenate([tag, children], axis=1)
    return permute_pallas(states)[:, DIGEST_INDEX, :]


def _build_levels(leaves) -> list:
    """All tree levels for a (N, D) digit leaf vector. On TPU the levels
    stay device-resident; elsewhere the host path (native/emulated perm)
    builds them — digests are bit-identical either way (KAT gates)."""
    if jax.default_backend() != "tpu":
        return fri.tree_build_digits(np.asarray(leaves),
                                     fri.default_pcs_perm())
    n = leaves.shape[0]
    full = ARITY ** _tree_height(n)
    level = jnp.pad(jnp.asarray(leaves), ((0, full - n), (0, 0)))
    levels = [level]
    while level.shape[0] > 1:
        level = _level_up_dev(level)
        levels.append(level)
    return levels


def _root_int(levels) -> int:
    return int(digits_to_ints(np.asarray(levels[-1])[0:1])[0])


def _open_batched_dev(levels, indices):
    """Compact batched openings from (device or host) levels —
    bit-identical to fri.tree_open_batched. Only the needed (K, 4, D)
    groups per level are fetched."""
    idx = np.asarray(list(indices), np.int64)
    k = idx.shape[0]
    h = len(levels) - 1
    sibs = np.empty((k, h, ARITY - 1, N_DIGITS), np.uint32)
    poss = np.empty((k, h), np.int32)
    cur = idx.copy()
    for lvl in range(h):
        g = cur // ARITY
        pos = cur % ARITY
        grouped = jnp.asarray(levels[lvl]).reshape(-1, ARITY, N_DIGITS)
        groups = np.asarray(jnp.take(grouped, jnp.asarray(g), axis=0))
        for i in range(k):
            p = int(pos[i])
            sibs[i, lvl] = np.concatenate(
                [groups[i, :p], groups[i, p + 1 :]], axis=0
            )
        poss[:, lvl] = pos
        cur = g
    return sibs, poss


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
    """F on L0: stack (T_rows, m0, D) poly evaluations; vs (T, D) claimed
    values; gammas (T, D) Montgomery gdeep powers; pows (S, m0, D)
    Montgomery x^s tables; inv_a/inv_b (m0, D) Montgomery 1/(x - zeta),
    1/(x - omega*zeta); spec: static tuple of (row, s_index, shifted)."""
    acc = jnp.zeros(stack.shape[1:], jnp.uint32)
    for j, (row, s_idx, shifted) in enumerate(spec):
        diff = field.sub_mod(stack[row], jnp.broadcast_to(
            vs[j], stack.shape[1:]
        ))
        term = field.mont_mul(diff, pows[s_idx])
        term = field.mont_mul(term, inv_b if shifted else inv_a)
        term = field.mont_mul(term, jnp.broadcast_to(
            gammas[j], term.shape
        ))
        acc = field.add_mod(acc, term)
    return acc


_deep_dev_jit = jax.jit(_deep_dev, static_argnames=("spec",))


@jax.jit
def _inv_mont_dev(xs: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-form 1/(x_i - point) over the L0 point table."""
    diff = field.sub_mod(xs, jnp.broadcast_to(point, xs.shape))
    return field.to_mont(field.invert(diff))


@jax.jit
def _fold_dev(evals, beta_mont, xinv_mont, inv2_mont):
    """One FRI fold on device — value-identical to fri.fold_evals."""
    half = evals.shape[0] // 2
    a, b = evals[:half], evals[half:]
    even = field.add_mod(a, b)
    odd = field.mont_mul(field.sub_mod(a, b), xinv_mont)
    s = field.add_mod(even, field.mont_mul(
        odd, jnp.broadcast_to(beta_mont, odd.shape)
    ))
    return field.mont_mul(s, jnp.broadcast_to(inv2_mont, s.shape))


# ---------------------------------------------------------------------------
# The device prover
# ---------------------------------------------------------------------------


def _ints_row(arr) -> list:
    return [int(v) for v in digits_to_ints(np.asarray(arr))]


def prove_succinct_device(composer, pk: ProvingKey,
                          rng=None) -> SuccinctProof:
    """fri.prove_succinct with the polynomial/tree/FRI work on the
    device. Bit-identical output for the same (composer, pk, rng)."""
    key, params = pk.key, pk.params
    n, omega = key.n, key.omega
    bounds = _bounds(n, params)
    d_bound = bounds["D"]
    m0 = params.blowup * d_bound
    final_degree = min(params.final_degree, d_bound // 2)
    n_folds = (d_bound // final_degree).bit_length() - 1
    rand_field = fri._rand_field_fn(rng)

    # --- witness polynomials via the batched phases (B = 1) ---------------
    wire_int = [
        [composer._values[idx] % P for idx in col]
        + [0] * (n - key.n_gates)
        for col in plonk._wire_indices(composer)
    ]
    wire_evals_dev = jnp.asarray(ints_to_digits(wire_int, shape=(1, 4, n)))
    pi_col = [v % P for v in plonk._public_input_column(composer, n)]

    tables_n = prover_tpu._key_tables(key)  # phase-2 tables (m = 4n)
    tables_m = prover_tpu._key_tables(key, m=d_bound, d_z=bounds["d_z"])

    wires_dev = prover_tpu._phase1_wires(wire_evals_dev)  # (1, 4, n, D)
    if params.zk:
        # identical randomness stream to the host prover: wires a..d then z
        r_w = ints_to_digits(
            [rand_field() for _ in range(4 * bounds["zkw"])],
            shape=(1, 4, bounds["zkw"]),
        )
        wires_dev = _blind_dev(wires_dev, jnp.asarray(r_w))

    tr = Transcript()
    tr.absorb(statement_digest(pk.digest, pi_col))

    wires_l0 = _coset_eval_dev(wires_dev[0], m0)          # (4, m0, D)
    levels = {}
    roots = {}
    for j, name in enumerate("abod"):
        levels[name] = _build_levels(wires_l0[j])
        roots[name] = _root_int(levels[name])
        tr.absorb(roots[name])
    beta = tr.challenge()
    gamma = tr.challenge()

    bd = jnp.asarray(ints_to_digits([beta], shape=(1,)))
    gd = jnp.asarray(ints_to_digits([gamma], shape=(1,)))
    z_dev = prover_tpu._phase2_grand_product(
        wire_evals_dev, bd, gd,
        jnp.asarray(tables_n["ids_mont"]),
        jnp.asarray(tables_n["sigma_n_mont"]),
        jnp.asarray(tables_n["one_mont"]),
    )  # (1, n, D)
    if params.zk:
        r_z = ints_to_digits(
            [rand_field() for _ in range(bounds["zkz"])],
            shape=(1, bounds["zkz"]),
        )
        z_dev = _blind_dev(z_dev, jnp.asarray(r_z))
    z_l0 = _coset_eval_dev(z_dev[0][None], m0)[0]
    levels["z"] = _build_levels(z_l0)
    roots["z"] = _root_int(levels["z"])
    tr.absorb(roots["z"])
    alpha = tr.challenge()

    ad = jnp.asarray(ints_to_digits([alpha], shape=(1,)))
    pi_dev = jnp.asarray(ints_to_digits(pi_col, shape=(1, n)))
    t_dev = prover_tpu._phase3_quotient(
        wires_dev, z_dev, pi_dev, bd, gd, ad,
        jnp.asarray(tables_m["kx_mont"]),
        jnp.asarray(tables_m["sigma_m_mont"]),
        {k_: jnp.asarray(v) for k_, v in tables_m["q_mont"].items()},
        jnp.asarray(tables_m["zh_inv_mont"]),
        jnp.asarray(tables_m["l1_mont"]),
        jnp.asarray(tables_m["omega_mont"]),
        jnp.asarray(tables_n["one_mont"]),
    )  # (1, d_bound, D)
    t_l0 = _coset_eval_dev(t_dev[0][None], m0)[0]
    levels["t"] = _build_levels(t_l0)
    roots["t"] = _root_int(levels["t"])
    tr.absorb(roots["t"])
    zeta = tr.challenge()

    # --- claimed evaluations (small fetches + host Horner) ----------------
    wires_int = [_ints_row(np.asarray(wires_dev)[0, j]) for j in range(4)]
    z_int = _ints_row(np.asarray(z_dev)[0])
    t_int = _ints_row(np.asarray(t_dev)[0])
    evals = {
        "a": poly_eval(wires_int[0], zeta),
        "b": poly_eval(wires_int[1], zeta),
        "o": poly_eval(wires_int[2], zeta),
        "d": poly_eval(wires_int[3], zeta),
        "z": poly_eval(z_int, zeta),
        "zw": poly_eval(z_int, zeta * omega % P),
        "t": poly_eval(t_int, zeta),
    }
    for name in SELECTOR_NAMES:
        evals[name] = poly_eval(key.selectors[name], zeta)
    for i, name in enumerate(SIGMA_NAMES):
        evals[name] = poly_eval(key.sigmas[i], zeta)
    tr.absorb(*[evals[name] for name in EVAL_ORDER])
    gdeep = tr.challenge()

    # --- DEEP composition on device ---------------------------------------
    key_rows = jnp.asarray(_pk_key_evals(pk))              # (10, m0, D)
    stack = jnp.concatenate(
        [wires_l0, z_l0[None], t_l0[None], key_rows], axis=0
    )  # rows: a b o d z t q_m..q_c s0..s3
    row_of = {"a": 0, "b": 1, "o": 2, "d": 3, "z": 4, "t": 5}
    for i, name in enumerate(SELECTOR_NAMES + SIGMA_NAMES):
        row_of[name] = 6 + i
    terms = fri._terms(bounds)
    s_values = sorted({d_bound + 1 - dj for (_, _, _, dj) in terms})
    pows = jnp.asarray(np.stack([_pow_mont(m0, s) for s in s_values]))
    spec = tuple(
        (row_of[pname], s_values.index(d_bound + 1 - dj), shifted)
        for (pname, ename, shifted, dj) in terms
    )
    vs = jnp.asarray(ints_to_digits(
        [evals[ename] for (_, ename, _, _) in terms],
        shape=(len(terms),),
    ))
    gpows = []
    g_acc = 1
    for _ in terms:
        gpows.append(g_acc * R % P)
        g_acc = g_acc * gdeep % P
    gammas = jnp.asarray(ints_to_digits(gpows, shape=(len(terms),)))
    xs = jnp.asarray(_xs_digits(m0))
    zeta_d = jnp.asarray(ints_to_digits([zeta], shape=(1,))[0])
    wz_d = jnp.asarray(
        ints_to_digits([zeta * omega % P], shape=(1,))[0]
    )
    inv_a = _inv_mont_dev(xs, zeta_d)
    inv_b = _inv_mont_dev(xs, wz_d)
    f_dev = _deep_dev_jit(stack, vs, gammas, pows, inv_a, inv_b, spec)

    # --- FRI commit phase on device ---------------------------------------
    inv2_mont = jnp.asarray(_scalar_mont((P + 1) // 2))
    layer_levels = []
    layer_roots = []
    cur = f_dev
    shift = G0
    size = m0
    for k_fold in range(1, n_folds + 1):
        beta_k = tr.challenge()
        bm = jnp.asarray(ints_to_digits([beta_k * R % P], shape=(1,))[0])
        cur = _fold_dev(cur, bm, jnp.asarray(_xinv_mont(size, shift)),
                        inv2_mont)
        shift = shift * shift % P
        size //= 2
        if k_fold < n_folds:
            lv = _build_levels(cur)
            layer_levels.append((cur, lv))
            layer_roots.append(_root_int(lv))
            tr.absorb(layer_roots[-1])
    final_evals = _ints_row(np.asarray(cur))
    final_coeffs = fri._coset_interp(final_evals, shift)
    if any(c % P for c in final_coeffs[final_degree:]):
        raise ValueError(
            "FRI final layer exceeds its degree bound — the witness does "
            "not satisfy the circuit (the quotient is not a polynomial)"
        )
    final_coeffs = final_coeffs[:final_degree]
    tr.absorb(*final_coeffs)

    half0 = m0 // 2
    queries = [tr.challenge() % half0 for _ in range(params.n_queries)]

    # --- openings (device gathers, small fetches) -------------------------
    idx0 = [i for q in queries for i in (q, q + half0)]
    l0_rows = {"a": wires_l0[0], "b": wires_l0[1], "o": wires_l0[2],
               "d": wires_l0[3], "z": z_l0, "t": t_l0}
    for i, name in enumerate(SELECTOR_NAMES + SIGMA_NAMES):
        l0_rows[name] = key_rows[i]
    open_values, open_sibs, open_poss = {}, {}, {}
    all_names = list("abod") + ["z", "t"] + list(
        SELECTOR_NAMES + SIGMA_NAMES
    )
    for name in all_names:
        row = l0_rows[name]
        vals = np.asarray(jnp.take(jnp.asarray(row),
                                   jnp.asarray(idx0), axis=0))
        ints = digits_to_ints(vals)
        open_values[name] = [
            [int(ints[2 * qi]), int(ints[2 * qi + 1])]
            for qi in range(len(queries))
        ]
        # key-polynomial trees are part of the proving key (shared across
        # proofs), witness trees were just built on device
        lv = levels.get(name) or pk.key_coms[name].levels
        open_sibs[name], open_poss[name] = _open_batched_dev(lv, idx0)

    layer_values, layer_sibs, layer_poss = [], [], []
    for k_fold in range(1, n_folds):
        m_k = m0 >> k_fold
        half_k = m_k // 2
        idx = []
        for q in queries:
            j = (q % m_k) % half_k
            idx.extend((j, j + half_k))
        cur_k, lv = layer_levels[k_fold - 1]
        vals = np.asarray(jnp.take(jnp.asarray(cur_k),
                                   jnp.asarray(idx), axis=0))
        ints = digits_to_ints(vals)
        layer_values.append([
            [int(ints[2 * qi]), int(ints[2 * qi + 1])]
            for qi in range(len(queries))
        ])
        s_, p_ = _open_batched_dev(lv, idx)
        layer_sibs.append(s_)
        layer_poss.append(p_)

    fri_proof = FriProof(
        layer_roots=layer_roots,
        final_coeffs=final_coeffs,
        layer_values=layer_values,
        layer_sibs=layer_sibs,
        layer_poss=layer_poss,
    )
    return SuccinctProof(
        roots=roots,
        evals=evals,
        fri=fri_proof,
        open_values=open_values,
        open_sibs=open_sibs,
        open_poss=open_poss,
    )
