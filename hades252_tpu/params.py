"""Parameter layer: decode the Hades252 constant assets bit-exactly.

TPU-native analogue of the reference's compile-time constant loading
(reference: src/mds_matrix.rs:18-40, src/round_constants.rs:29-48,
src/lib.rs:33-44 `u64_from_buffer`). The reference decodes each 32-byte
little-endian record with `BlsScalar::from_raw`, i.e. it treats the stored
bytes as a *canonical* integer (see SURVEY.md §2.2: the assets were written
in Montgomery internal_repr but are deliberately re-interpreted as canonical
values — the effective constants ARE the raw LE integers). We therefore
decode `ark.bin` / `mds.bin` verbatim: each 32-byte chunk, little-endian,
is the canonical field element.

All derived forms (Montgomery-domain constants, limb decompositions) are
computed here once at import with exact Python big-int arithmetic.
"""

from __future__ import annotations

import functools
import os

import numpy as np

# ---------------------------------------------------------------------------
# Fixed Hades252 parameters (reference: src/lib.rs:20-27)
# ---------------------------------------------------------------------------

#: State width (reference: src/lib.rs:27 `WIDTH`)
WIDTH = 5
#: Total full rounds, R_F (reference: src/lib.rs:20 `TOTAL_FULL_ROUNDS`)
TOTAL_FULL_ROUNDS = 8
#: Partial rounds, R_P (reference: src/lib.rs:24 `PARTIAL_ROUNDS`)
PARTIAL_ROUNDS = 59
#: Total rounds (reference: src/strategies.rs:160-162 `rounds()`)
ROUNDS = TOTAL_FULL_ROUNDS + PARTIAL_ROUNDS
#: Round constants consumed per permutation: 5 per round, 67 rounds = 335
CONSTANTS_PER_PERM = ROUNDS * WIDTH
#: Number of preloaded ARK constants (reference: src/round_constants.rs:18)
N_ROUND_CONSTANTS = 960

#: BLS12-381 scalar field modulus (reference: src/strategies.rs:14)
P = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

# ---------------------------------------------------------------------------
# Limb representation: 16 digits x 16 bits, little-endian, held in uint32.
#
# Rationale (TPU-first): the VPU has no widening multiply; a 16x16-bit
# product fits exactly in a uint32 lane, and column sums of <= 32 split
# halves stay < 2^22, so schoolbook multiplication is exact in uint32
# arithmetic with a single carry-normalization pass.
# ---------------------------------------------------------------------------

DIGIT_BITS = 16
N_DIGITS = 16
DIGIT_MASK = (1 << DIGIT_BITS) - 1

#: Montgomery radix R = 2^(DIGIT_BITS * N_DIGITS) = 2^256
R_EXP = DIGIT_BITS * N_DIGITS
R = 1 << R_EXP
R_MOD_P = R % P
R2_MOD_P = (R * R) % P
#: -p^{-1} mod R (full-word Montgomery constant)
P_PRIME = (-pow(P, -1, R)) % R


def int_to_digits(x: int, n: int = N_DIGITS) -> np.ndarray:
    """Decompose a non-negative int into n little-endian DIGIT_BITS digits."""
    if x < 0 or x >= (1 << (DIGIT_BITS * n)):
        raise ValueError(f"value out of range for {n} digits: {x}")
    return np.array(
        [(x >> (DIGIT_BITS * i)) & DIGIT_MASK for i in range(n)], dtype=np.uint32
    )


def digits_to_int(d) -> int:
    """Recompose little-endian digits (any uint array) into a Python int."""
    d = np.asarray(d)
    return sum(int(v) << (DIGIT_BITS * i) for i, v in enumerate(d.reshape(-1)))


# ---------------------------------------------------------------------------
# Asset decoding (reference: assets/ark.bin 960x32 B, assets/mds.bin 25x32 B)
# ---------------------------------------------------------------------------

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")


def _load_scalars(name: str, count: int) -> list[int]:
    path = os.path.join(_ASSET_DIR, name)
    data = open(path, "rb").read()
    if len(data) != count * 32:
        raise ValueError(f"{name}: expected {count * 32} bytes, got {len(data)}")
    vals = [int.from_bytes(data[i * 32 : (i + 1) * 32], "little") for i in range(count)]
    for i, v in enumerate(vals):
        if v >= P:
            raise ValueError(f"{name}[{i}] is not a canonical field element")
    return vals


@functools.cache
def round_constants_int() -> tuple[int, ...]:
    """All 960 ARK constants as canonical Python ints."""
    return tuple(_load_scalars("ark.bin", N_ROUND_CONSTANTS))


@functools.cache
def mds_matrix_int() -> tuple[tuple[int, ...], ...]:
    """The 5x5 MDS matrix as canonical Python ints, row-major
    (reference: src/mds_matrix.rs:24-37)."""
    flat = _load_scalars("mds.bin", WIDTH * WIDTH)
    return tuple(tuple(flat[i * WIDTH : (i + 1) * WIDTH]) for i in range(WIDTH))


def _to_mont(x: int) -> int:
    return (x * R_MOD_P) % P


@functools.cache
def perm_constants_np() -> dict[str, np.ndarray]:
    """Numpy limb arrays used by every backend.

    Keys:
      ark_mont:  (ROUNDS, WIDTH, N_DIGITS) uint32 — the 335 per-perm ARK
                 constants in Montgomery form (state lives in the Montgomery
                 domain between rounds; x_mont + c_mont == (x+c)_mont).
      mds_mont:  (WIDTH, WIDTH, N_DIGITS) uint32 — MDS in Montgomery form so
                 mont_mul(mds_mont, v_mont) == (mds*v)_mont.
      p:         (N_DIGITS,) uint32 — the modulus.
      p_prime:   (N_DIGITS,) uint32 — -p^{-1} mod 2^256.
      r2:        (N_DIGITS,) uint32 — R^2 mod p (canonical->Montgomery).
      one:       (N_DIGITS,) uint32 — 1 (Montgomery->canonical via mont_mul).
      ark_full:  (N_ROUND_CONSTANTS, N_DIGITS) uint32 — all 960 constants,
                 canonical (for parity tests / gadget path).
    """
    ark = round_constants_int()
    mds = mds_matrix_int()
    ark_mont = np.stack(
        [int_to_digits(_to_mont(c)) for c in ark[:CONSTANTS_PER_PERM]]
    ).reshape(ROUNDS, WIDTH, N_DIGITS)
    mds_mont = np.stack(
        [int_to_digits(_to_mont(m)) for row in mds for m in row]
    ).reshape(WIDTH, WIDTH, N_DIGITS)
    ark_full = np.stack([int_to_digits(c) for c in ark])
    return {
        "ark_mont": ark_mont,
        "mds_mont": mds_mont,
        "p": int_to_digits(P),
        "p_prime": int_to_digits(P_PRIME),
        "r2": int_to_digits(R2_MOD_P),
        "one": int_to_digits(1),
        "ark_full": ark_full,
    }
