"""Host-side encodings between Python ints, 32-byte LE scalars, and digit arrays.

The byte format matches the reference's `BlsScalar::to_bytes`/`from_bytes`
canonical 32-byte little-endian encoding (reference: src/round_constants.rs:61-62,
src/lib.rs:33-44). Used for I/O, checkpoints, and test oracles; never traced.
"""

from __future__ import annotations

import numpy as np

from ..params import N_DIGITS, P, digits_to_int


def _flatten_values(values) -> list:
    """Flatten nested lists/tuples/arrays of ints WITHOUT the
    object-ndarray detour (np.asarray(dtype=object) costs ~5x a chained
    flatten on the deep prover-sized inputs)."""
    if isinstance(values, np.ndarray):
        return values.reshape(-1).tolist()
    out = list(values)
    from itertools import chain

    while out and isinstance(out[0], (list, tuple, np.ndarray)):
        out = list(chain.from_iterable(out))
    return out


def ints_to_digits(values, shape=None) -> np.ndarray:
    """List/array of canonical Python ints -> (..., N_DIGITS) uint32.

    Fast path: one to_bytes per value + a single frombuffer decode
    (instead of N_DIGITS shift/mask ops per value) — this conversion sits
    on the host side of every device<->bigint boundary (prover phases,
    PCS tree building) and was a measured bottleneck of batched proving."""
    flat = _flatten_values(values)
    if shape is None:
        shape = np.asarray(values, dtype=object).shape
    if not flat:
        return np.zeros(tuple(shape) + (N_DIGITS,), np.uint32)
    try:
        buf = b"".join(int(v).to_bytes(32, "little") for v in flat)
    except (OverflowError, TypeError):
        raise ValueError("not a canonical field element (negative or "
                         "non-int value)") from None
    out = np.frombuffer(buf, dtype="<u2").astype(np.uint32)
    out = out.reshape(tuple(shape) + (N_DIGITS,))
    # vectorized canonicality check (value < p), replacing the per-value
    # Python comparison loop
    check_canonical_digits(
        out.reshape(-1, N_DIGITS),
        "not a canonical field element: value >= p",
    )
    return out


_P_DIGITS_DESC = np.asarray(
    [(P >> (16 * i)) & 0xFFFF for i in range(N_DIGITS)], np.uint32
)


def digits_to_ints(digits) -> np.ndarray:
    """(..., N_DIGITS) uint array -> object array of Python ints.

    Fast path for NORMALIZED digits (< 2^16, the invariant of every field
    op's output): one uint16 serialization + one from_bytes per value."""
    digits = np.asarray(digits)
    lead = digits.shape[:-1]
    flat = digits.reshape(-1, digits.shape[-1])
    out = np.empty(flat.shape[0], dtype=object)
    if flat.shape[-1] == N_DIGITS and flat.size and (flat < 65536).all():
        # memoryview slices share the buffer (a bytes slice would copy
        # 32 bytes per value — measurable at prover batch sizes)
        buf = memoryview(np.ascontiguousarray(flat).astype("<u2").tobytes())
        for i in range(flat.shape[0]):
            out[i] = int.from_bytes(buf[32 * i : 32 * (i + 1)], "little")
        return out.reshape(lead)
    for i, d in enumerate(flat):
        out[i] = digits_to_int(d)
    return out.reshape(lead)


def u64_from_buffer(data: bytes, i: int) -> int:
    """Decode the little-endian u64 at byte offset i (the reference's shared
    asset-decode helper, src/lib.rs:33-44)."""
    return int.from_bytes(data[i : i + 8], "little")


def scalar_to_bytes(x: int) -> bytes:
    """Canonical 32-byte little-endian encoding (BlsScalar::to_bytes)."""
    if not 0 <= x < P:
        raise ValueError("not a canonical field element")
    return int(x).to_bytes(32, "little")


def scalar_from_bytes(b: bytes) -> int:
    """Decode canonical 32-byte LE scalar; rejects non-canonical values
    (mirrors BlsScalar::from_bytes returning None for >= p)."""
    if len(b) != 32:
        raise ValueError("expected 32 bytes")
    x = int.from_bytes(b, "little")
    if x >= P:
        raise ValueError("non-canonical scalar encoding")
    return x


def check_canonical_digits(flat: np.ndarray, msg: str) -> None:
    """Vectorized canonicality check on (K, N_DIGITS) normalized digits
    (each < 2^16): every value must be < p or ValueError(msg) is raised.

    Fast path: a row whose TOP digit is strictly below p's top digit
    (0x73ed) is canonical regardless of the rest, so the full
    lexicographic sweep only runs over rows whose top digit equals it —
    vanishingly few for field-random data. (This check sits under every
    native-engine admission point and conversion; at ~250 small calls
    per proof verification the 2*N_DIGITS-op sweep was measurable.)"""
    pd = _P_DIGITS_DESC
    top = flat[:, N_DIGITS - 1]
    p_top = pd[N_DIGITS - 1]
    if bool((top > p_top).any()):
        raise ValueError(msg)
    sus = top == p_top
    if not bool(sus.any()):
        return
    sub = flat[sus]
    ge = np.zeros(sub.shape[0], bool)
    eq = np.ones(sub.shape[0], bool)
    for i in range(N_DIGITS - 2, -1, -1):
        ge |= eq & (sub[:, i] > pd[i])
        eq &= sub[:, i] == pd[i]
    if bool((ge | eq).any()):
        raise ValueError(msg)


def digits_to_bytes(digits) -> bytes:
    """(..., N_DIGITS) digit array -> concatenated 32-byte LE scalars.

    Fast path for NORMALIZED digits (each < 2^16, the invariant of every
    field op's output): the uint16 little-endian digit buffer IS the
    canonical 32-byte LE scalar encoding, so one astype+tobytes replaces
    the per-value Python-int round trip (this conversion sits under every
    native-engine call — it was ~half the host verifier's hashing time)."""
    digits = np.asarray(digits)
    if digits.size == 0:
        return b""
    flat = digits.reshape(-1, digits.shape[-1])
    if flat.shape[-1] == N_DIGITS and bool((flat < 65536).all()):
        flat = flat.astype(np.uint32, copy=False)
        check_canonical_digits(
            flat, "not a canonical field element: value >= p"
        )
        return np.ascontiguousarray(flat).astype("<u2").tobytes()
    return b"".join(scalar_to_bytes(v) for v in digits_to_ints(digits).reshape(-1))


def bytes_to_digits(data: bytes, shape) -> np.ndarray:
    """Concatenated 32-byte LE scalars -> (..., N_DIGITS) uint32.
    Vectorized decode + canonicality check (rejects values >= p exactly
    like scalar_from_bytes)."""
    n = len(data) // 32
    out = (
        np.frombuffer(bytes(data[: n * 32]), dtype="<u2")
        .astype(np.uint32)
        .reshape(n, N_DIGITS)
    )
    check_canonical_digits(out, "non-canonical scalar encoding")
    return out.reshape(tuple(shape) + (N_DIGITS,))
