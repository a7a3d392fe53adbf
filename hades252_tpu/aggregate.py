"""Aggregated succinct proofs: ONE proof for B instances of the same
circuit.

The reference's prove/verify cycle (dusk-plonk KZG, reference
src/strategies/gadget.rs:198-223) emits one proof per circuit instance;
a server proving B preimages ships B full proofs. This module is the
batch-serving extension on top of the self-hosted PCS (fri.py): all B
instances share every Merkle PATH and the entire FRI low-degree
argument, so the per-instance marginal proof cost is just the claimed
evaluations and the opened leaf values — the paths and FRI layers, which
dominate a single succinct proof, are paid once.

Construction (same soundness model as fri.py, documented there):

  * **Block commitments.** For each wire-family polynomial (a, b, o, d,
    z, t) build ONE Merkle tree over the blown-up coset L0 whose leaf
    block at position i holds the B instances' evaluations
    [p_0(x_i), ..., p_{B-1}(x_i)] as an aligned bottom subtree
    (fri.tree_build_blocks). Opening position i ships B values and ONE
    path. The preprocessed selector/sigma trees are shared by all
    instances unchanged — the same VerifyingKey verifies single and
    aggregated proofs.
  * **Shared challenges.** beta/gamma/alpha/zeta are drawn once, after
    the block roots (which bind every instance's wires) are absorbed;
    each instance keeps its own grand product z_j and quotient t_j, and
    its own PLONK zeta identity is checked by the verifier. Sharing
    challenges across independently-committed instances is the standard
    batching argument: each identity holds with the usual
    Schwartz-Zippel error, union-bounded over B.
  * **One DEEP-FRI.** All B*7 wire claims plus the 10 shared key claims
    are batched into a single DEEP composition with consecutive powers
    of one post-evaluation challenge gdeep (the same batching fri.py
    already does across its 17 claims), then folded by one FRI argument
    with one set of query openings.

Size: a single succinct proof opens 16 trees (6 wire + 10 key) plus the
FRI layers per query; an aggregate of B opens the same 16 trees and the
same FRI layers ONCE, and the per-instance increment is only claimed
evaluations and opened leaf values — no Merkle digests at all (tests
assert the measured sublinearity).

Zero knowledge: FriParams(zk=True) blinds each instance's wires and
grand product exactly as fri.prove_succinct does; the leak accounting
(fri._bounds) is per polynomial and unchanged — each committed
polynomial still reveals only the 2Q query evaluations plus its zeta
evaluation(s), regardless of how many instances share the tree.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .params import N_DIGITS, P
from .plonk import (
    Transcript,
    _coset_eval,
    _grand_product,
    _public_input_column,
    _quotient,
    _wire_indices,
    _wire_polys,
    poly_eval,
    statement_digest,
)
from .fri import (
    ARITY,
    EVAL_ORDER,
    G0,
    SELECTOR_NAMES,
    SIGMA_NAMES,
    FriProof,
    ProvingKey,
    VerifyingKey,
    _blind,
    _bounds,
    _deep_compose_terms,
    _deep_eval_terms,
    _fold_check,
    _fri_commit,
    _fri_proof,
    _rand_field_fn,
    _terms,
    _tree_height,
    _zeta_identity_ok,
    default_pcs_perm,
    tree_build_blocks,
    tree_open_batched,
    tree_open_blocks,
    tree_root,
    tree_verify_batched,
    tree_verify_blocks,
)

#: Per-instance claimed evaluations (the key evaluations are shared).
WIRE_EVAL_ORDER = ("a", "b", "o", "d", "z", "zw", "t")
KEY_EVAL_ORDER = tuple(n for n in EVAL_ORDER if n not in WIRE_EVAL_ORDER)
WIRE_NAMES = ("a", "b", "o", "d", "z", "t")


@dataclass
class AggregateProof:
    """One succinct argument for n_instances same-circuit witnesses."""

    n_instances: int
    roots: dict        # wire name -> block-tree root int
    evals: list        # per instance: dict over WIRE_EVAL_ORDER
    key_evals: dict    # selector/sigma name -> shared evaluation at zeta
    fri: FriProof      # single shared FRI argument
    open_values: dict  # wire name -> (Q, 2, B) ints at (q, q+half0)
    open_sibs: dict    # wire name -> (2Q, h_pos, 3, N_DIGITS) block paths
    open_poss: dict    # wire name -> (2Q, h_pos)
    key_open_values: dict  # key name -> (Q, 2) ints (single-value trees)
    key_open_sibs: dict    # key name -> (2Q, h0, 3, N_DIGITS)
    key_open_poss: dict    # key name -> (2Q, h0)


def aggregate_security_bits(params, n: int = 1024,
                            n_instances: int = 1) -> float:
    """Conservative soundness estimate for an aggregate of n_instances.

    The FRI query soundness is UNCHANGED from a single proof (one
    composition, the same spot checks): n_queries * log2(blowup) bits.
    What aggregation costs is the Schwartz-Zippel union bound: the B
    instances' zeta identities (and the B*7+10-term DEEP batching) share
    one challenge draw, so the field-side error grows linearly in B —
    i.e. the ~240-bit field term loses log2(B) bits. For every practical
    B the minimum is still the query term, so
    aggregate_security_bits == FriParams.security_bits; the function
    exists to make that argument checkable rather than implicit."""
    import math

    query_bits = params.n_queries * math.log2(params.blowup)
    field_bits = math.log2(
        P / (5 * max(n, 2) * max(n_instances, 1))
    )
    return min(query_bits, field_bits)


def aggregate_size_field_elements(proof: AggregateProof) -> int:
    """Proof size in field elements, same accounting rules as
    fri.proof_size_field_elements."""
    total = len(proof.roots) + len(proof.key_evals)
    total += sum(len(e) for e in proof.evals)
    total += len(proof.fri.layer_roots) + len(proof.fri.final_coeffs)
    for vals in proof.open_values.values():
        total += sum(len(v) for pair in vals for v in pair)
    for vals in proof.key_open_values.values():
        total += sum(len(v) for v in vals)
    for s in list(proof.open_sibs.values()) + list(
        proof.key_open_sibs.values()
    ):
        a = np.asarray(s)
        total += int(a.shape[0] * a.shape[1] * (ARITY - 1))
    for vals, s in zip(proof.fri.layer_values, proof.fri.layer_sibs):
        total += sum(len(v) for v in vals)
        a = np.asarray(s)
        total += int(a.shape[0] * a.shape[1] * (ARITY - 1))
    return total


def _agg_terms(bounds: dict, n_instances: int):
    """DEEP term schedule: every instance's 7 wire claims (instance-major,
    fri._terms order), then the 10 shared key claims. The enumeration
    order fixes each claim's gdeep power on both sides."""
    wire_terms = _terms(bounds)[: len(WIRE_EVAL_ORDER)]
    key_terms = _terms(bounds)[len(WIRE_EVAL_ORDER):]
    out = []
    for j in range(n_instances):
        out += [(j, pname, ename, shifted, dj)
                for pname, ename, shifted, dj in wire_terms]
    out += [(None, pname, ename, shifted, dj)
            for pname, ename, shifted, dj in key_terms]
    return out


def _absorb_statement(tr: Transcript, digest: int, n: int, n_gates: int,
                      pi_cols):
    """Bind the aggregate statement: the instance count and every
    instance's (circuit digest, public inputs) in order, before any
    challenge is drawn."""
    tr.absorb(len(pi_cols))
    for pi in pi_cols:
        col = [int(v) % P for v in pi][:n_gates]
        tr.absorb(statement_digest(digest, col + [0] * (n - len(col))))


def prove_aggregate(composers, pk: ProvingKey, perm_fn=None,
                    rng=None) -> AggregateProof:
    """Prove all composers' witnesses (same circuit structure as pk) in
    one aggregated succinct argument. With pk.params.zk each instance's
    witness polynomials are Z_H-blinded first."""
    if not composers:
        raise ValueError("at least one composer required")
    if perm_fn is None:
        perm_fn = default_pcs_perm()
    key, params = pk.key, pk.params
    n, omega = key.n, key.omega
    bounds = _bounds(n, params)
    d_bound = bounds["D"]
    m0 = params.blowup * d_bound
    final_degree = min(params.final_degree, d_bound // 2)
    n_folds = (d_bound // final_degree).bit_length() - 1
    n_inst = len(composers)

    ref_idx = _wire_indices(composers[0])
    for c in composers[1:]:
        if _wire_indices(c) != ref_idx:
            raise ValueError(
                "prove_aggregate requires all composers to share one "
                "circuit structure"
            )

    rand_field = _rand_field_fn(rng)
    inst = []
    for c in composers:
        wire_evals, wires = _wire_polys(c, key)
        if params.zk:
            wires = tuple(_blind(w, n, bounds["zkw"], rand_field)
                          for w in wires)
        inst.append({"wire_evals": wire_evals, "wires": wires,
                     "pi": _public_input_column(c, n)})

    tr = Transcript()
    _absorb_statement(tr, pk.digest, n, key.n_gates,
                      [i["pi"] for i in inst])

    def commit_blocks(per_inst_evals):
        """per_inst_evals: n_inst lists of m0 values -> block tree."""
        blocks = list(zip(*per_inst_evals))
        levels = tree_build_blocks(blocks, perm_fn)
        return {"evals": per_inst_evals, "levels": levels,
                "root": tree_root(levels)}

    coms = {}
    for w_i, name in enumerate("abod"):
        coms[name] = commit_blocks(
            [_coset_eval(list(i["wires"][w_i]), m0, G0) for i in inst]
        )
        tr.absorb(coms[name]["root"])
    beta = tr.challenge()
    gamma = tr.challenge()

    for i in inst:
        z = _grand_product(i["wire_evals"], key, beta, gamma)
        if params.zk:
            z = _blind(z, n, bounds["zkz"], rand_field)
        i["z"] = z
    coms["z"] = commit_blocks(
        [_coset_eval(list(i["z"]), m0, G0) for i in inst]
    )
    tr.absorb(coms["z"]["root"])
    alpha = tr.challenge()

    for i in inst:
        i["t"] = _quotient(key, i["wires"], i["z"], i["pi"], beta, gamma,
                           alpha, m=d_bound)
    coms["t"] = commit_blocks(
        [_coset_eval(list(i["t"]), m0, G0) for i in inst]
    )
    tr.absorb(coms["t"]["root"])
    zeta = tr.challenge()

    evals = []
    for i in inst:
        evals.append({
            "a": poly_eval(i["wires"][0], zeta),
            "b": poly_eval(i["wires"][1], zeta),
            "o": poly_eval(i["wires"][2], zeta),
            "d": poly_eval(i["wires"][3], zeta),
            "z": poly_eval(i["z"], zeta),
            "zw": poly_eval(i["z"], zeta * omega % P),
            "t": poly_eval(i["t"], zeta),
        })
    key_evals = {}
    for name in SELECTOR_NAMES:
        key_evals[name] = poly_eval(key.selectors[name], zeta)
    for i, name in enumerate(SIGMA_NAMES):
        key_evals[name] = poly_eval(key.sigmas[i], zeta)
    for e in evals:
        tr.absorb(*[e[name] for name in WIRE_EVAL_ORDER])
    tr.absorb(*[key_evals[name] for name in KEY_EVAL_ORDER])
    gdeep = tr.challenge()

    term_list = []
    for j, pname, ename, shifted, dj in _agg_terms(bounds, n_inst):
        if j is None:
            term_list.append((pk.key_coms[pname].evals, key_evals[ename],
                              shifted, dj))
        else:
            term_list.append((coms[pname]["evals"][j], evals[j][ename],
                              shifted, dj))
    f = _deep_compose_terms(m0, d_bound, term_list, zeta, omega, gdeep)

    layer_coms, final_coeffs = _fri_commit(tr, f, m0, n_folds,
                                           final_degree, perm_fn)
    half0 = m0 // 2
    queries = [tr.challenge() % half0 for _ in range(params.n_queries)]
    idx0 = [i for q in queries for i in (q, q + half0)]

    open_values, open_sibs, open_poss = {}, {}, {}
    for name in WIRE_NAMES:
        com = coms[name]
        open_values[name] = [
            [[com["evals"][j][q] for j in range(n_inst)],
             [com["evals"][j][q + half0] for j in range(n_inst)]]
            for q in queries
        ]
        open_sibs[name], open_poss[name] = tree_open_blocks(
            com["levels"], n_inst, idx0
        )
    key_open_values, key_open_sibs, key_open_poss = {}, {}, {}
    for name, com in pk.key_coms.items():
        key_open_values[name] = [
            [com.evals[q], com.evals[q + half0]] for q in queries
        ]
        key_open_sibs[name], key_open_poss[name] = tree_open_batched(
            com.levels, idx0
        )

    fri_pf = _fri_proof(layer_coms, final_coeffs, queries, m0)
    return AggregateProof(
        n_instances=n_inst,
        roots={name: coms[name]["root"] for name in WIRE_NAMES},
        evals=evals,
        key_evals=key_evals,
        fri=fri_pf,
        open_values=open_values,
        open_sibs=open_sibs,
        open_poss=open_poss,
        key_open_values=key_open_values,
        key_open_sibs=key_open_sibs,
        key_open_poss=key_open_poss,
    )


def verify_aggregate(vk: VerifyingKey, proof: AggregateProof,
                     public_inputs_list, perm_fn=None,
                     chain_fn=None) -> bool:
    """Check the aggregated argument against the SAME VerifyingKey that
    verifies single succinct proofs. All-or-nothing: every instance's
    zeta identity, every pooled Merkle opening, and the shared fold
    checks must hold. chain_fn fuses every opening chain into one call
    (see fri._tree_verify_nodes; fri_tpu.verify_aggregate_device passes
    the fused device chain)."""
    if perm_fn is None:
        perm_fn = default_pcs_perm()
    n, omega, params = vk.n, vk.omega, vk.params
    bounds = _bounds(n, params)
    d_bound = bounds["D"]
    m0 = params.blowup * d_bound
    final_degree = min(params.final_degree, d_bound // 2)
    n_folds = (d_bound // final_degree).bit_length() - 1
    q_n = params.n_queries
    n_inst = proof.n_instances
    if n_inst < 1 or len(public_inputs_list) != n_inst:
        return False
    if len(proof.evals) != n_inst:
        return False
    if any(sorted(e) != sorted(WIRE_EVAL_ORDER) for e in proof.evals):
        return False
    if sorted(proof.key_evals) != sorted(KEY_EVAL_ORDER):
        return False
    if sorted(proof.roots) != sorted(WIRE_NAMES):
        return False
    if len(proof.fri.final_coeffs) > final_degree:
        return False
    if any(
        len(part) != n_folds - 1
        for part in (proof.fri.layer_roots, proof.fri.layer_values,
                     proof.fri.layer_sibs, proof.fri.layer_poss)
    ):
        return False

    # structural shape checks (block paths start above the block subtree)
    h_pos = _tree_height(m0)
    h0 = h_pos  # key trees have single-value leaves over the same m0
    for name in WIRE_NAMES:
        if (name not in proof.open_values or name not in proof.open_sibs
                or name not in proof.open_poss):
            return False
        vals = proof.open_values[name]
        if len(vals) != q_n or any(
            len(pair) != 2 or any(len(v) != n_inst for v in pair)
            for pair in vals
        ):
            return False
        if np.asarray(proof.open_sibs[name]).shape != (
            2 * q_n, h_pos, ARITY - 1, N_DIGITS,
        ) or np.asarray(proof.open_poss[name]).shape != (2 * q_n, h_pos):
            return False
    for name in vk.roots:
        if (name not in proof.key_open_values
                or name not in proof.key_open_sibs
                or name not in proof.key_open_poss):
            return False
        vals = proof.key_open_values[name]
        if len(vals) != q_n or any(len(v) != 2 for v in vals):
            return False
        if np.asarray(proof.key_open_sibs[name]).shape != (
            2 * q_n, h0, ARITY - 1, N_DIGITS,
        ) or np.asarray(proof.key_open_poss[name]).shape != (2 * q_n, h0):
            return False
    layer_heights = [_tree_height(m0 >> k) for k in range(1, n_folds)]
    for k in range(1, n_folds):
        vals = proof.fri.layer_values[k - 1]
        if len(vals) != q_n or any(len(v) != 2 for v in vals):
            return False
        if np.asarray(proof.fri.layer_sibs[k - 1]).shape != (
            2 * q_n, layer_heights[k - 1], ARITY - 1, N_DIGITS,
        ) or np.asarray(proof.fri.layer_poss[k - 1]).shape != (
            2 * q_n, layer_heights[k - 1],
        ):
            return False

    # 1. replay the transcript
    pis = [[int(v) % P for v in pi][:vk.n_gates]
           for pi in public_inputs_list]
    tr = Transcript()
    _absorb_statement(tr, vk.digest, n, vk.n_gates, pis)
    for name in "abod":
        tr.absorb(proof.roots[name])
    beta = tr.challenge()
    gamma = tr.challenge()
    tr.absorb(proof.roots["z"])
    alpha = tr.challenge()
    tr.absorb(proof.roots["t"])
    zeta = tr.challenge()
    evals = [{name: e[name] % P for name in WIRE_EVAL_ORDER}
             for e in proof.evals]
    key_evals = {name: proof.key_evals[name] % P for name in KEY_EVAL_ORDER}
    for e in evals:
        tr.absorb(*[e[name] for name in WIRE_EVAL_ORDER])
    tr.absorb(*[key_evals[name] for name in KEY_EVAL_ORDER])
    gdeep = tr.challenge()
    betas = []
    for k in range(1, n_folds + 1):
        betas.append(tr.challenge())
        if k < n_folds:
            tr.absorb(proof.fri.layer_roots[k - 1])
    tr.absorb(*proof.fri.final_coeffs)
    half0 = m0 // 2
    queries = [tr.challenge() % half0 for _ in range(q_n)]
    idx0 = [i for q in queries for i in (q, q + half0)]

    # 2. every instance's PLONK identity at zeta (shared key evals)
    for e, pi in zip(evals, pis):
        ev = dict(e)
        ev.update(key_evals)
        if not _zeta_identity_ok(vk, ev, pi, zeta, beta, gamma, alpha):
            return False

    # 3. Merkle: wire block trees, key trees, FRI layer trees
    for name in WIRE_NAMES:
        blocks = [[int(v) % P for v in pair[h]]
                  for pair in proof.open_values[name] for h in range(2)]
        ok = tree_verify_blocks(
            proof.roots[name], blocks, proof.open_sibs[name],
            proof.open_poss[name], h_pos, idx0, perm_fn, chain_fn,
        )
        if not bool(np.all(ok)):
            return False
    for name, root in vk.roots.items():
        flat = [int(v) % P for pair in proof.key_open_values[name]
                for v in pair]
        ok = tree_verify_batched(
            root, flat, proof.key_open_sibs[name],
            proof.key_open_poss[name], h0, idx0, perm_fn, chain_fn,
        )
        if not bool(np.all(ok)):
            return False
    layer_flat = []
    for k in range(1, n_folds):
        m_k = m0 >> k
        half_k = m_k // 2
        idx = []
        for q in queries:
            j = (q % m_k) % half_k
            idx.extend((j, j + half_k))
        flat = [int(v) % P for pair in proof.fri.layer_values[k - 1]
                for v in pair]
        ok = tree_verify_batched(
            proof.fri.layer_roots[k - 1], flat,
            proof.fri.layer_sibs[k - 1], proof.fri.layer_poss[k - 1],
            layer_heights[k - 1], idx, perm_fn, chain_fn,
        )
        if not bool(np.all(ok)):
            return False
        layer_flat.append(flat)

    # 4. fold each query through the shared layers
    agg_terms = _agg_terms(bounds, n_inst)

    def deep_pair(qi, x):
        lo_terms, hi_terms = [], []
        for j, pname, ename, shifted, dj in agg_terms:
            if j is None:
                pair = proof.key_open_values[pname][qi]
                lo_v, hi_v = int(pair[0]) % P, int(pair[1]) % P
                v = key_evals[ename]
            else:
                pair = proof.open_values[pname][qi]
                lo_v = int(pair[0][j]) % P
                hi_v = int(pair[1][j]) % P
                v = evals[j][ename]
            lo_terms.append((lo_v, v, shifted, dj))
            hi_terms.append((hi_v, v, shifted, dj))
        f_lo = _deep_eval_terms(x, d_bound, lo_terms, zeta, omega, gdeep)
        f_hi = _deep_eval_terms((P - x) % P, d_bound, hi_terms, zeta,
                                omega, gdeep)
        return f_lo, f_hi

    return _fold_check(queries, betas, m0, n_folds, layer_flat,
                       proof.fri.final_coeffs, deep_pair)
