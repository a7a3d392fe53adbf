"""Byte wire format for the succinct proof system (proofs + verifier keys).

Reference parity: the reference's prove/verify cycle runs through
dusk-plonk, whose `Proof` and verifier data implement
`to_bytes`/`from_bytes` (dusk-plonk's `Serializable`; the cycle the
reference exercises at src/strategies/gadget.rs:198-223) — a user of the
reference can move proofs and keys across processes/network as bytes.
This module gives the self-hosted DEEP-FRI argument (`fri.py`) the same
capability with a deterministic, strictly-validated layout.

Conventions (all little-endian):
  * field elements: canonical 32-byte LE (`BlsScalar::to_bytes` format,
    reference src/lib.rs:33-44) — non-canonical (>= p) encodings are
    REJECTED on read, mirroring `BlsScalar::from_bytes` returning None;
  * Merkle digests: the digest's canonical field-element encoding;
  * Merkle positions: one byte each, range-checked < ARITY on read;
  * every size/shape is derived from the `VerifyingKey`'s (n, FriParams)
    schema — a proof that deserializes is structurally well-formed, and
    trailing bytes, truncation, or a header that disagrees with the key
    are hard `ValueError`s, never silent acceptance.

The layout is versioned by magic tags (HSP1 = Hades Succinct Proof v1,
HVK1 = Hades Verifying Key v1).
"""

from __future__ import annotations

import struct

import numpy as np

from .fri import (
    ARITY,
    EVAL_ORDER,
    FriParams,
    FriProof,
    SELECTOR_NAMES,
    SIGMA_NAMES,
    SuccinctProof,
    VerifyingKey,
    _bounds,
    _tree_height,
)
from .params import N_DIGITS
from .utils.encoding import (
    bytes_to_digits,
    digits_to_bytes,
    scalar_from_bytes,
    scalar_to_bytes,
)

MAGIC_PROOF = b"HSP1"
MAGIC_VK = b"HVK1"
MAGIC_AGG = b"HAP1"

#: Wire order of the proof's own commitment roots.
ROOT_NAMES = ("a", "b", "o", "d", "z", "t")
#: Wire order of the per-polynomial layer-0 opening blocks.
OPEN_ORDER = ROOT_NAMES + SELECTOR_NAMES + SIGMA_NAMES

_PROOF_HEADER = struct.Struct("<IIIIBH")  # n, blowup, q, final_degree, zk, n_final
_VK_HEADER = struct.Struct("<IIIIIB")  # n, n_gates, blowup, q, final_degree, zk
# n, blowup, q, final_degree, zk, n_final, n_instances
_AGG_HEADER = struct.Struct("<IIIIBHI")
#: Wire order of the shared key opening blocks (10 preprocessed trees).
KEY_ORDER = SELECTOR_NAMES + SIGMA_NAMES


def _schema(n: int, params: FriParams):
    """Derived shape facts shared by prover/verifier/serializer: the L0
    size m0, effective final degree, fold count, and tree heights."""
    d_bound = _bounds(n, params)["D"]
    m0 = params.blowup * d_bound
    final_degree = min(params.final_degree, d_bound // 2)
    n_folds = (d_bound // final_degree).bit_length() - 1
    h0 = _tree_height(m0)
    heights = [_tree_height(m0 >> k) for k in range(1, n_folds)]
    return m0, final_degree, n_folds, h0, heights


def expected_proof_size(n: int, params: FriParams,
                        n_final: int | None = None) -> int:
    """Exact serialized size in bytes (header included). `n_final` is the
    final-layer coefficient count; the honest prover always emits the
    effective final degree (the default)."""
    _, final_degree, n_folds, h0, heights = _schema(n, params)
    if n_final is None:
        n_final = final_degree
    q = params.n_queries
    size = len(MAGIC_PROOF) + _PROOF_HEADER.size
    size += 32 * (len(ROOT_NAMES) + len(EVAL_ORDER) + (n_folds - 1) + n_final)
    per_path = lambda h: q * 2 * 32 + 2 * q * h * (ARITY - 1) * 32 + 2 * q * h
    size += len(OPEN_ORDER) * per_path(h0)
    size += sum(per_path(h) for h in heights)
    return size


def _poss_bytes(poss, height: int, q: int) -> bytes:
    arr = np.asarray(poss)
    if arr.shape != (2 * q, height):
        raise ValueError(f"position block shape {arr.shape} != {(2 * q, height)}")
    if arr.size and (arr.min() < 0 or arr.max() >= ARITY):
        raise ValueError("Merkle position out of range")
    return arr.astype(np.uint8).tobytes()


def _sibs_bytes(sibs, height: int, q: int) -> bytes:
    arr = np.asarray(sibs)
    if arr.shape != (2 * q, height, ARITY - 1, N_DIGITS):
        raise ValueError(
            f"sibling block shape {arr.shape} != "
            f"{(2 * q, height, ARITY - 1, N_DIGITS)}"
        )
    return digits_to_bytes(arr)


def _values_bytes(vals, q: int) -> bytes:
    if len(vals) != q or any(len(v) != 2 for v in vals):
        raise ValueError("opened-value block must be (n_queries, 2)")
    return b"".join(scalar_to_bytes(int(v)) for pair in vals for v in pair)


def proof_to_bytes(proof: SuccinctProof, vk: VerifyingKey) -> bytes:
    """Serialize a succinct proof against the key's schema. Malformed
    structure (wrong shapes, out-of-range positions, non-canonical
    values) raises instead of producing undecodable bytes."""
    params = vk.params
    _, final_degree, n_folds, h0, heights = _schema(vk.n, params)
    q = params.n_queries
    n_final = len(proof.fri.final_coeffs)
    if n_final > final_degree:
        raise ValueError("final_coeffs exceeds the effective final degree")
    if len(proof.fri.layer_roots) != n_folds - 1:
        raise ValueError("layer_roots count disagrees with the key schema")
    out = bytearray()
    out += MAGIC_PROOF
    out += _PROOF_HEADER.pack(vk.n, params.blowup, q, params.final_degree,
                              int(params.zk), n_final)
    for name in ROOT_NAMES:
        if name not in proof.roots:
            raise ValueError(f"missing commitment root {name!r}")
        out += scalar_to_bytes(int(proof.roots[name]))
    for name in EVAL_ORDER:
        if name not in proof.evals:
            raise ValueError(f"missing claimed evaluation {name!r}")
        out += scalar_to_bytes(int(proof.evals[name]))
    for root in proof.fri.layer_roots:
        out += scalar_to_bytes(int(root))
    for c in proof.fri.final_coeffs:
        out += scalar_to_bytes(int(c))
    for name in OPEN_ORDER:
        if (name not in proof.open_values or name not in proof.open_sibs
                or name not in proof.open_poss):
            raise ValueError(f"missing opening block {name!r}")
        out += _values_bytes(proof.open_values[name], q)
        out += _sibs_bytes(proof.open_sibs[name], h0, q)
        out += _poss_bytes(proof.open_poss[name], h0, q)
    for part in (proof.fri.layer_values, proof.fri.layer_sibs,
                 proof.fri.layer_poss):
        if len(part) != n_folds - 1:
            raise ValueError("FRI layer blocks disagree with the key schema")
    for k, h in enumerate(heights):
        out += _values_bytes(proof.fri.layer_values[k], q)
        out += _sibs_bytes(proof.fri.layer_sibs[k], h, q)
        out += _poss_bytes(proof.fri.layer_poss[k], h, q)
    return bytes(out)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated encoding")
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def scalar(self) -> int:
        return scalar_from_bytes(self.take(32))

    def scalars(self, n: int) -> list[int]:
        return [self.scalar() for _ in range(n)]

    def values(self, q: int) -> list[list[int]]:
        flat = self.scalars(2 * q)
        return [[flat[2 * i], flat[2 * i + 1]] for i in range(q)]

    def sibs(self, height: int, q: int) -> np.ndarray:
        raw = self.take(2 * q * height * (ARITY - 1) * 32)
        # bytes_to_digits appends the trailing N_DIGITS axis itself;
        # it rejects non-canonical digests
        return bytes_to_digits(raw, (2 * q, height, ARITY - 1))

    def poss(self, height: int, q: int) -> np.ndarray:
        raw = np.frombuffer(self.take(2 * q * height), np.uint8)
        arr = raw.reshape(2 * q, height).astype(np.int32)
        if arr.size and arr.max() >= ARITY:
            raise ValueError("Merkle position out of range")
        return arr

    def done(self):
        if self.pos != len(self.data):
            raise ValueError(
                f"{len(self.data) - self.pos} trailing bytes after proof"
            )


def proof_from_bytes(data: bytes, vk: VerifyingKey) -> SuccinctProof:
    """Strict inverse of `proof_to_bytes`: header must agree with the
    key, every scalar must be canonical, every position in range, and
    the byte count exact."""
    r = _Reader(data)
    if r.take(len(MAGIC_PROOF)) != MAGIC_PROOF:
        raise ValueError("not a Hades succinct proof (bad magic)")
    params = vk.params
    n, blowup, q, final_degree, zk, n_final = _PROOF_HEADER.unpack(
        r.take(_PROOF_HEADER.size)
    )
    if (n, blowup, q, final_degree, bool(zk)) != (
        vk.n, params.blowup, params.n_queries, params.final_degree,
        params.zk,
    ):
        raise ValueError("proof header disagrees with the verifying key")
    _, fd_eff, n_folds, h0, heights = _schema(vk.n, params)
    if n_final > fd_eff:
        raise ValueError("final_coeffs exceeds the effective final degree")
    roots = {name: r.scalar() for name in ROOT_NAMES}
    evals = {name: r.scalar() for name in EVAL_ORDER}
    layer_roots = r.scalars(n_folds - 1)
    final_coeffs = r.scalars(n_final)
    open_values, open_sibs, open_poss = {}, {}, {}
    for name in OPEN_ORDER:
        open_values[name] = r.values(q)
        open_sibs[name] = r.sibs(h0, q)
        open_poss[name] = r.poss(h0, q)
    layer_values, layer_sibs, layer_poss = [], [], []
    for h in heights:
        layer_values.append(r.values(q))
        layer_sibs.append(r.sibs(h, q))
        layer_poss.append(r.poss(h, q))
    r.done()
    return SuccinctProof(
        roots=roots,
        evals=evals,
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
    )


def vk_to_bytes(vk: VerifyingKey) -> bytes:
    """Serialize the verifier key (domain facts + statement digest +
    preprocessed commitment roots); the reference analogue is moving
    dusk-plonk's verifier data as bytes."""
    out = bytearray()
    out += MAGIC_VK
    out += _VK_HEADER.pack(vk.n, vk.n_gates, vk.params.blowup,
                           vk.params.n_queries, vk.params.final_degree,
                           int(vk.params.zk))
    out += scalar_to_bytes(int(vk.digest))
    for name in SELECTOR_NAMES + SIGMA_NAMES:
        if name not in vk.roots:
            raise ValueError(f"missing preprocessed root {name!r}")
        out += scalar_to_bytes(int(vk.roots[name]))
    return bytes(out)


def vk_from_bytes(data: bytes) -> VerifyingKey:
    """Strict inverse of `vk_to_bytes` (omega is recomputed from n — it
    is a domain fact, not free data)."""
    from .plonk import _domain_root

    r = _Reader(data)
    if r.take(len(MAGIC_VK)) != MAGIC_VK:
        raise ValueError("not a Hades verifying key (bad magic)")
    n, n_gates, blowup, q, final_degree, zk = _VK_HEADER.unpack(
        r.take(_VK_HEADER.size)
    )
    if n < 1 or n & (n - 1):
        raise ValueError("domain size must be a power of two")
    if not 0 < n_gates <= n:
        raise ValueError("gate count out of range for the domain")
    params = FriParams(blowup=blowup, n_queries=q, final_degree=final_degree,
                       zk=bool(zk))
    digest = r.scalar()
    roots = {name: r.scalar() for name in SELECTOR_NAMES + SIGMA_NAMES}
    r.done()
    return VerifyingKey(n=n, omega=_domain_root(n), n_gates=n_gates,
                        digest=digest, roots=roots, params=params)


# ---------------------------------------------------------------------------
# Aggregated proofs (aggregate.py): HAP1
# ---------------------------------------------------------------------------


def expected_aggregate_size(n: int, params: FriParams, n_instances: int,
                            n_final: int | None = None) -> int:
    """Exact serialized size in bytes of an aggregated proof for
    `n_instances` instances (header included)."""
    from .aggregate import KEY_EVAL_ORDER, WIRE_EVAL_ORDER, WIRE_NAMES

    _, final_degree, n_folds, h0, heights = _schema(n, params)
    if n_final is None:
        n_final = final_degree
    q = params.n_queries
    size = len(MAGIC_AGG) + _AGG_HEADER.size
    size += 32 * (
        len(WIRE_NAMES)
        + n_instances * len(WIRE_EVAL_ORDER)
        + len(KEY_EVAL_ORDER)
        + (n_folds - 1)
        + n_final
    )
    path = lambda h: 2 * q * h * (ARITY - 1) * 32 + 2 * q * h
    # wire block trees: B opened values per side, one shared path set
    size += len(WIRE_NAMES) * (q * 2 * n_instances * 32 + path(h0))
    # shared key trees: single-value openings
    size += len(KEY_ORDER) * (q * 2 * 32 + path(h0))
    size += sum(q * 2 * 32 + path(h) for h in heights)
    return size


def _block_values_bytes(vals, q: int, n_instances: int) -> bytes:
    if len(vals) != q or any(
        len(pair) != 2 or any(len(side) != n_instances for side in pair)
        for pair in vals
    ):
        raise ValueError(
            "block opened-value block must be (n_queries, 2, n_instances)"
        )
    return b"".join(
        scalar_to_bytes(int(v)) for pair in vals for side in pair
        for v in side
    )


def aggregate_to_bytes(proof, vk: VerifyingKey) -> bytes:
    """Serialize an `aggregate.AggregateProof` against the key's schema.
    Same strictness contract as `proof_to_bytes`."""
    from .aggregate import KEY_EVAL_ORDER, WIRE_EVAL_ORDER, WIRE_NAMES

    params = vk.params
    _, final_degree, n_folds, h0, heights = _schema(vk.n, params)
    q = params.n_queries
    n_inst = int(proof.n_instances)
    if n_inst < 1:
        raise ValueError("aggregate proof needs at least one instance")
    if len(proof.evals) != n_inst:
        raise ValueError("per-instance evaluation count != n_instances")
    n_final = len(proof.fri.final_coeffs)
    if n_final > final_degree:
        raise ValueError("final_coeffs exceeds the effective final degree")
    if len(proof.fri.layer_roots) != n_folds - 1:
        raise ValueError("layer_roots count disagrees with the key schema")
    out = bytearray()
    out += MAGIC_AGG
    out += _AGG_HEADER.pack(vk.n, params.blowup, q, params.final_degree,
                            int(params.zk), n_final, n_inst)
    for name in WIRE_NAMES:
        if name not in proof.roots:
            raise ValueError(f"missing commitment root {name!r}")
        out += scalar_to_bytes(int(proof.roots[name]))
    for e in proof.evals:
        for name in WIRE_EVAL_ORDER:
            if name not in e:
                raise ValueError(f"missing claimed evaluation {name!r}")
            out += scalar_to_bytes(int(e[name]))
    for name in KEY_EVAL_ORDER:
        if name not in proof.key_evals:
            raise ValueError(f"missing key evaluation {name!r}")
        out += scalar_to_bytes(int(proof.key_evals[name]))
    for root in proof.fri.layer_roots:
        out += scalar_to_bytes(int(root))
    for c in proof.fri.final_coeffs:
        out += scalar_to_bytes(int(c))
    for name in WIRE_NAMES:
        if (name not in proof.open_values or name not in proof.open_sibs
                or name not in proof.open_poss):
            raise ValueError(f"missing opening block {name!r}")
        out += _block_values_bytes(proof.open_values[name], q, n_inst)
        out += _sibs_bytes(proof.open_sibs[name], h0, q)
        out += _poss_bytes(proof.open_poss[name], h0, q)
    for name in KEY_ORDER:
        if (name not in proof.key_open_values
                or name not in proof.key_open_sibs
                or name not in proof.key_open_poss):
            raise ValueError(f"missing key opening block {name!r}")
        out += _values_bytes(proof.key_open_values[name], q)
        out += _sibs_bytes(proof.key_open_sibs[name], h0, q)
        out += _poss_bytes(proof.key_open_poss[name], h0, q)
    for part in (proof.fri.layer_values, proof.fri.layer_sibs,
                 proof.fri.layer_poss):
        if len(part) != n_folds - 1:
            raise ValueError("FRI layer blocks disagree with the key schema")
    for k, h in enumerate(heights):
        out += _values_bytes(proof.fri.layer_values[k], q)
        out += _sibs_bytes(proof.fri.layer_sibs[k], h, q)
        out += _poss_bytes(proof.fri.layer_poss[k], h, q)
    return bytes(out)


def aggregate_from_bytes(data: bytes, vk: VerifyingKey):
    """Strict inverse of `aggregate_to_bytes` (same contract as
    `proof_from_bytes`)."""
    from .aggregate import (
        AggregateProof,
        KEY_EVAL_ORDER,
        WIRE_EVAL_ORDER,
        WIRE_NAMES,
    )

    r = _Reader(data)
    if r.take(len(MAGIC_AGG)) != MAGIC_AGG:
        raise ValueError("not a Hades aggregated proof (bad magic)")
    params = vk.params
    n, blowup, q, final_degree, zk, n_final, n_inst = _AGG_HEADER.unpack(
        r.take(_AGG_HEADER.size)
    )
    if (n, blowup, q, final_degree, bool(zk)) != (
        vk.n, params.blowup, params.n_queries, params.final_degree,
        params.zk,
    ):
        raise ValueError("proof header disagrees with the verifying key")
    if n_inst < 1:
        raise ValueError("aggregate proof needs at least one instance")
    _, fd_eff, n_folds, h0, heights = _schema(vk.n, params)
    if n_final > fd_eff:
        raise ValueError("final_coeffs exceeds the effective final degree")
    roots = {name: r.scalar() for name in WIRE_NAMES}
    evals = [
        {name: r.scalar() for name in WIRE_EVAL_ORDER}
        for _ in range(n_inst)
    ]
    key_evals = {name: r.scalar() for name in KEY_EVAL_ORDER}
    layer_roots = r.scalars(n_folds - 1)
    final_coeffs = r.scalars(n_final)
    open_values, open_sibs, open_poss = {}, {}, {}
    for name in WIRE_NAMES:
        flat = r.scalars(2 * q * n_inst)
        open_values[name] = [
            [flat[2 * n_inst * i : 2 * n_inst * i + n_inst],
             flat[2 * n_inst * i + n_inst : 2 * n_inst * (i + 1)]]
            for i in range(q)
        ]
        open_sibs[name] = r.sibs(h0, q)
        open_poss[name] = r.poss(h0, q)
    key_open_values, key_open_sibs, key_open_poss = {}, {}, {}
    for name in KEY_ORDER:
        key_open_values[name] = r.values(q)
        key_open_sibs[name] = r.sibs(h0, q)
        key_open_poss[name] = r.poss(h0, q)
    layer_values, layer_sibs, layer_poss = [], [], []
    for h in heights:
        layer_values.append(r.values(q))
        layer_sibs.append(r.sibs(h, q))
        layer_poss.append(r.poss(h, q))
    r.done()
    return AggregateProof(
        n_instances=n_inst,
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
