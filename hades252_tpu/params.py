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

import dataclasses
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


@dataclasses.dataclass(frozen=True)
class HadesParams:
    """The frozen Hades252 parameter set (SURVEY.md §5, config system).

    Mirrors the reference's stance that parameters are compile-time
    constants, not configuration (reference: src/lib.rs:20-27; width change
    requires regenerating assets, README.md:30-31): this dataclass is
    deliberately immutable and has exactly one instance, PARAMS. Runtime
    knobs (batch, tile/block, mesh shape) live at call sites, never here.
    """

    width: int = WIDTH
    total_full_rounds: int = TOTAL_FULL_ROUNDS
    partial_rounds: int = PARTIAL_ROUNDS
    modulus: int = P
    n_round_constants: int = N_ROUND_CONSTANTS
    digit_bits: int = DIGIT_BITS
    n_digits: int = N_DIGITS

    @property
    def rounds(self) -> int:
        return self.total_full_rounds + self.partial_rounds

    @property
    def constants_per_perm(self) -> int:
        return self.rounds * self.width


#: The one parameter set this framework implements.
PARAMS = HadesParams()


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


# ---------------------------------------------------------------------------
# Sparse-factored partial-round schedule (exact algebraic transform)
#
# A partial round is s <- M @ sbox4(s + c) where sbox4 is x^5 on word 4 only
# (reference: src/strategies.rs:79-93). Split M = D @ S with
#   D = [[A, 0], [0, 1]]   (A = M[0:4, 0:4]; identity on word 4)
#   S = [[I, A^-1 v], [w, m]]   (v = M[0:4, 4], w = M[4, 0:4], m = M[4, 4])
# D commutes with sbox4 (it neither reads nor writes word 4), so with
# x_r := D^-r @ (s_r + c_r) the 59-round chain becomes
#   x <- s + c_0
#   for r in 0..58:  x[4] <- sbox(x[4]);  x <- S_r @ x;  x += D^-(r+1) c_{r+1}
#   s_out <- D^59 @ x
# where S_r = D^-r @ S @ D^r = [[I, A^-r u], [w A^r, m]] stays SPARSE
# (9 non-identity entries): 9 muls per round instead of the dense 25.
# The values fed to every S-box — and the final output — are bit-identical
# to the naive schedule (verified in tests against the int oracle).
# ---------------------------------------------------------------------------


def _mat_mul(a, b):
    n, k, m2 = len(a), len(b), len(b[0])
    return tuple(
        tuple(sum(a[i][t] * b[t][j] for t in range(k)) % P for j in range(m2))
        for i in range(n)
    )


def _mat_vec(a, x):
    return tuple(sum(a[i][j] * x[j] for j in range(len(x))) % P for i in range(len(a)))


def _mat_inv(a):
    """Gauss-Jordan inverse mod P (exact; raises if singular)."""
    n = len(a)
    aug = [[a[i][j] % P for j in range(n)] + [1 if i == j else 0 for j in range(n)]
           for i in range(n)]
    for col in range(n):
        piv = next((r for r in range(col, n) if aug[r][col] != 0), None)
        if piv is None:
            raise ValueError("singular matrix")
        aug[col], aug[piv] = aug[piv], aug[col]
        inv = pow(aug[col][col], -1, P)
        aug[col] = [(x * inv) % P for x in aug[col]]
        for r in range(n):
            if r != col and aug[r][col]:
                f = aug[r][col]
                aug[r] = [(aug[r][j] - f * aug[col][j]) % P for j in range(2 * n)]
    return tuple(tuple(row[n:]) for row in aug)


@functools.cache
def optimized_partial_int() -> dict:
    """Exact int-valued constants for the sparse partial-round schedule.

    Keys (all canonical ints mod P):
      c0:    (WIDTH,) initial additive constants (ARK of the first partial
             round, global round 4).
      u:     (PARTIAL_ROUNDS, 4)  S_r top-right column  A^-r @ (A^-1 v).
      w:     (PARTIAL_ROUNDS, 4)  S_r bottom-left row   w @ A^r.
      m:     scalar M[4][4] (same for every r).
      d:     (PARTIAL_ROUNDS - 1, WIDTH) folded constants
             D^-(r+1) @ c_{r+1}, added after S_r for r < 58.
      final: (4, 4) the once-per-chain dense matrix A^59.
    """
    mds = mds_matrix_int()
    ark = round_constants_int()
    half = TOTAL_FULL_ROUNDS // 2
    # partial-round ARK vectors: global rounds half .. half+PARTIAL_ROUNDS-1
    cs = [tuple(ark[(half + r) * WIDTH + i] for i in range(WIDTH))
          for r in range(PARTIAL_ROUNDS)]

    a_hat = tuple(tuple(mds[i][j] for j in range(4)) for i in range(4))
    v = tuple(mds[i][4] for i in range(4))
    w = tuple(mds[4][j] for j in range(4))
    m = mds[4][4]
    a_inv = _mat_inv(a_hat)
    u0 = _mat_vec(a_inv, v)

    ident = tuple(tuple(1 if i == j else 0 for j in range(4)) for i in range(4))
    a_pow = [ident]          # A^r
    a_inv_pow = [ident]      # A^-r
    for _ in range(PARTIAL_ROUNDS):
        a_pow.append(_mat_mul(a_pow[-1], a_hat))
        a_inv_pow.append(_mat_mul(a_inv_pow[-1], a_inv))

    u = tuple(_mat_vec(a_inv_pow[r], u0) for r in range(PARTIAL_ROUNDS))
    wr = tuple(_mat_vec(tuple(zip(*a_pow[r])), w) for r in range(PARTIAL_ROUNDS))
    d = tuple(
        tuple(_mat_vec(a_inv_pow[r + 1], cs[r + 1][:4])) + (cs[r + 1][4],)
        for r in range(PARTIAL_ROUNDS - 1)
    )
    return {
        "c0": cs[0],
        "u": u,
        "w": wr,
        "m": m,
        "d": d,
        "final": a_pow[PARTIAL_ROUNDS],
    }


@functools.cache
def dot_schedule_int() -> dict:
    """Full-expansion partial-round schedule (exact algebraic transform).

    Because the 59 partial rounds only apply the S-box to word 4
    (reference: src/strategies.rs:79-93), the whole chain is affine except
    for the 59 scalar S-box outputs. Expanding symbolically over the basis
        e = [1, x_0..x_4, s_0..s_58]          (65 elements)
    where x_i is the state entering the chain (after full round 3's MDS,
    before any partial ARK) and s_r is the r-th partial S-box OUTPUT, every
    S-box INPUT and the final chain output are fixed linear maps:

        t_r       = alpha[r] . e[:6+r]        (s_r = t_r^5)
        state_out = omega    . e

    with all ARK constants folded into the coefficient on basis element 1.
    Per round this is ONE 6+r-term constant dot + one S-box — on the MXU
    kernel, one matmul + one wide Montgomery reduction instead of the dense
    MDS layer's five (the REDC path is ~73% of kernel time, PERF.md).

    Returns canonical ints mod P:
      alpha: tuple of 59 tuples; alpha[r] has length 6+r.
      omega: (5, 65) tuple-of-tuples.
    Bit-exactness vs the naive schedule is oracle-tested
    (tests/test_params.py).
    """
    mds = mds_matrix_int()
    ark = round_constants_int()
    half = TOTAL_FULL_ROUNDS // 2
    n_basis = 1 + WIDTH + PARTIAL_ROUNDS

    def unit(j):
        return [1 if i == j else 0 for i in range(n_basis)]

    # symbolic state: 5 coefficient vectors over the basis
    state = [unit(1 + i) for i in range(WIDTH)]
    alpha = []
    for r in range(PARTIAL_ROUNDS):
        # ARK: constants fold onto basis element 0 (the constant 1)
        for i in range(WIDTH):
            state[i][0] = (state[i][0] + ark[(half + r) * WIDTH + i]) % P
        # S-box input = word 4 after ARK; output becomes a new basis element
        alpha.append(tuple(state[4][: 6 + r]))
        state[4] = unit(6 + r)
        # MDS mixes the coefficient vectors linearly
        state = [
            [
                sum(mds[k][j] * state[j][b] for j in range(WIDTH)) % P
                for b in range(n_basis)
            ]
            for k in range(WIDTH)
        ]
    return {
        "alpha": tuple(alpha),
        "omega": tuple(tuple(row) for row in state),
    }


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


def _byte_pos(r: int) -> int:
    """Byte position encoded by input row r of the MXU byte layout.

    A 256-bit value enters MXU matmuls as 32 rows: rows 0..15 are the LOW
    bytes of 16-bit digits 0..15 (byte positions 0,2,..,30), rows 16..31
    the HIGH bytes (positions 1,3,..,31)."""
    return 2 * r if r < N_DIGITS else 2 * (r - N_DIGITS) + 1


def _value_bytes(x: int) -> list[int]:
    return list(int(x).to_bytes(32, "little"))


def _toeplitz_rows(value: int, n_cols: int) -> np.ndarray:
    """(n_cols, 32) float32 weight block: W[c, r] = byte_{c - pos(r)} of
    value, i.e. multiplying the byte-row vector of a variable by this block
    yields the base-256 columns (un-carried) of value * variable."""
    vb = _value_bytes(value)
    w = np.zeros((n_cols, 2 * N_DIGITS), np.float32)
    for r in range(2 * N_DIGITS):
        pos = _byte_pos(r)
        for c in range(n_cols):
            e = c - pos
            if 0 <= e < 32:
                w[c, r] = vb[e]
    return w


@functools.cache
def mxu_weights_np() -> dict[str, np.ndarray]:
    """Constant matmul weights for the MXU kernel schedule (float32 host
    arrays; cast to bfloat16 at kernel build — all entries are bytes 0..255,
    exact in bf16, and every accumulation stays < 2^24, exact in f32).

    Keys:
      w_lin: (5*63, 5*32) — the full 5x5 Montgomery-MDS digit convolution:
             row k*63+c = base-256 column c of word k's pre-reduction value
             sum_j mds_mont[k][j] * state[j]; column block j*32+r indexes
             byte-row r of state word j. Max column sum 5*32*255^2 < 2^24.
      w_pp:  (32, 32) — truncated Toeplitz of P' = -p^-1 mod R: byte rows of
             T_lo -> base-256 columns of (T_lo * P') mod R (columns >= 32
             dropped = the mod-R truncation, exact after a carry pass).
      w_p:   (63, 32) — Toeplitz of p: byte rows of m -> columns of m*p.
    """
    mds = mds_matrix_int()
    w_lin = np.zeros((WIDTH * 63, WIDTH * 2 * N_DIGITS), np.float32)
    for k in range(WIDTH):
        for j in range(WIDTH):
            w_lin[k * 63 : (k + 1) * 63, j * 32 : (j + 1) * 32] = (
                _toeplitz_rows(_to_mont(mds[k][j]), 63)
            )
    return {
        "w_lin": w_lin,
        "w_pp": _toeplitz_rows(P_PRIME, 32),
        "w_p": _toeplitz_rows(P, 63),
    }


#: hyb-schedule segment split: rounds 0..26 touch <= 32 basis elements,
#: rounds 27..58 touch <= 64; each segment's weights are zero-padded to the
#: segment width so the kernel loop has fixed shapes (small Mosaic trace).
HYB_SEG1_ROUNDS = 27
HYB_SEG1_ELEMS = 32
HYB_SEG2_ELEMS = 64
HYB_N_BASIS = 1 + WIDTH + PARTIAL_ROUNDS  # 65


def _coeff_row_block(coeffs, n_elems: int) -> np.ndarray:
    """One matmul weight block (63, 32*n_elems): per basis element j, the
    Toeplitz byte block of its Montgomery-form coefficient (zero where the
    coefficient is absent/zero)."""
    w = np.zeros((63, 32 * n_elems), np.float32)
    for j, c in enumerate(coeffs):
        if c:
            w[:, 32 * j : 32 * (j + 1)] = _toeplitz_rows(_to_mont(c), 63)
    return w


def _offset_i8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    s8 = (w.astype(np.int32) - 128).astype(np.int8)
    return s8, s8.sum(axis=1, keepdims=True, dtype=np.int64).astype(np.int32)


@functools.cache
def hyb_weights_np() -> dict[str, np.ndarray]:
    """int8 MXU weights for the full-expansion partial-round schedule
    (dot_schedule_int), offset-encoded like mxu_weights_np (exactness: the
    identity W@x = w_s8@(x-128) + 128*rowsum(w_s8) + 128*colsum(x) over the
    SAME padded width; absent coefficients are byte 0 and padded basis rows
    hold raw byte 0, so they contribute exactly nothing).

    Keys:
      w_seg1/rs_seg1: (27, 63, 32*32) int8 / (27, 63, 1) int32 — rounds
        0..26, padded to 32 basis elements.
      w_seg2/rs_seg2: (32, 63, 32*64) / (32, 63, 1) — rounds 27..58.
      w_out/rs_out:   (5*63, 32*65) / (5*63, 1) — the chain-exit map omega
        for all 5 words (word k = rows 63k..63k+62).
      pmul17: (5, 17) uint32 — 16p, 8p, 4p, 2p, p as 17-digit arrays (the
        conditional-subtract ladder normalizing the big lazy REDC, whose
        input is a sum of up to 65 Montgomery products: t < 31p).
      one_mont: (N_DIGITS,) uint32 — basis element 0 (the constant 1) in
        Montgomery form, R mod p.
    """
    d = dot_schedule_int()
    alpha, omega = d["alpha"], d["omega"]
    seg1 = [_offset_i8(_coeff_row_block(alpha[r], HYB_SEG1_ELEMS))
            for r in range(HYB_SEG1_ROUNDS)]
    seg2 = [_offset_i8(_coeff_row_block(alpha[r], HYB_SEG2_ELEMS))
            for r in range(HYB_SEG1_ROUNDS, PARTIAL_ROUNDS)]
    w_out = np.concatenate(
        [_coeff_row_block(row, HYB_N_BASIS) for row in omega], axis=0
    )
    w_out_s8, rs_out = _offset_i8(w_out)
    return {
        "w_seg1": np.stack([s for s, _ in seg1]),
        "rs_seg1": np.stack([r for _, r in seg1]),
        "w_seg2": np.stack([s for s, _ in seg2]),
        "rs_seg2": np.stack([r for _, r in seg2]),
        "w_out": w_out_s8,
        "rs_out": rs_out,
        "pmul17": np.stack(
            [int_to_digits(k * P, 17) for k in (16, 8, 4, 2, 1)]
        ),
        "one_mont": int_to_digits(R_MOD_P),
    }


@functools.cache
def hybp_weights_np() -> dict[str, np.ndarray]:
    """Software-pipelined variant of hyb_weights_np.

    Round r's dot splits into W_r = Wo_r + [newest column block]: Wo_r
    zeroes the coefficient block of the NEWEST basis element (s_{r-1}),
    which is only produced by the previous round's S-box; the newest
    element's contribution comes from a separate small (63, 32) Toeplitz
    matmul. The big Wo matmul for round r+1 then depends only on elements
    through s_{r-1} and can be computed while round r's S-box chain is in
    flight — the MXU work leaves the serial critical path.

    Keys: wo_seg1/rso_seg1 (27 rounds: round 0 keeps its full W since all
    its inputs are available at init), wo_seg2/rso_seg2 (rounds 27..58),
    w_new/rs_new (59, 63, 32; row 0 unused), plus w_out/rs_out/pmul17/
    one_mont identical to hyb_weights_np.
    """
    d = dot_schedule_int()
    alpha = d["alpha"]

    def wo_block(r, n_pad):
        coeffs = list(alpha[r])
        if r > 0:
            coeffs[-1] = 0  # newest element handled by w_new
        return _offset_i8(_coeff_row_block(coeffs, n_pad))

    def new_block(r):
        w = np.zeros((63, 32), np.float32)
        if r > 0 and alpha[r][-1]:
            w[:] = _toeplitz_rows(_to_mont(alpha[r][-1]), 63)
        return _offset_i8(w)

    seg1 = [wo_block(r, HYB_SEG1_ELEMS) for r in range(HYB_SEG1_ROUNDS)]
    seg2 = [wo_block(r, HYB_SEG2_ELEMS)
            for r in range(HYB_SEG1_ROUNDS, PARTIAL_ROUNDS)]
    new = [new_block(r) for r in range(PARTIAL_ROUNDS)]
    base = hyb_weights_np()
    return {
        "wo_seg1": np.stack([s for s, _ in seg1]),
        "rso_seg1": np.stack([r for _, r in seg1]),
        "wo_seg2": np.stack([s for s, _ in seg2]),
        "rso_seg2": np.stack([r for _, r in seg2]),
        "w_new": np.stack([s for s, _ in new]),
        "rs_new": np.stack([r for _, r in new]),
        "w_out": base["w_out"],
        "rs_out": base["rs_out"],
        "pmul17": base["pmul17"],
        "one_mont": base["one_mont"],
    }


@functools.cache
def opt_schedule_np() -> dict[str, np.ndarray]:
    """Montgomery-form limb arrays for the sparse partial-round schedule
    (optimized_partial_int) plus the full-round constants, consumed by the
    optimized fused kernel (ops/perm_pallas.py).

    Keys:
      ark_fr:  (TOTAL_FULL_ROUNDS, WIDTH, N_DIGITS) — ARK for the 8 full
               rounds (global rounds 0..3 and 63..66), Montgomery.
      c0:      (WIDTH, N_DIGITS) — initial partial-chain constants.
      u:       (PARTIAL_ROUNDS, 4, N_DIGITS) — sparse column entries.
      w:       (PARTIAL_ROUNDS, 4, N_DIGITS) — sparse row entries.
      m:       (1, N_DIGITS) — the (4,4) entry (round-invariant).
      d:       (PARTIAL_ROUNDS, WIDTH, N_DIGITS) — folded constants; row
               PARTIAL_ROUNDS-1 is zero (no constant after the last round).
      final:   (4, 4, N_DIGITS) — the once-per-chain dense matrix A^59.
    """
    opt = optimized_partial_int()
    half = TOTAL_FULL_ROUNDS // 2
    ark = round_constants_int()

    def mont_digits(x):
        return int_to_digits(_to_mont(x))

    fr_rounds = list(range(half)) + list(
        range(half + PARTIAL_ROUNDS, ROUNDS)
    )
    ark_fr = np.stack(
        [
            np.stack([mont_digits(ark[g * WIDTH + i]) for i in range(WIDTH)])
            for g in fr_rounds
        ]
    )
    d = np.zeros((PARTIAL_ROUNDS, WIDTH, N_DIGITS), np.uint32)
    for r, row in enumerate(opt["d"]):
        d[r] = np.stack([mont_digits(x) for x in row])
    return {
        "ark_fr": ark_fr,
        "c0": np.stack([mont_digits(x) for x in opt["c0"]]),
        "u": np.stack(
            [np.stack([mont_digits(x) for x in row]) for row in opt["u"]]
        ),
        "w": np.stack(
            [np.stack([mont_digits(x) for x in row]) for row in opt["w"]]
        ),
        "m": mont_digits(opt["m"])[None],
        "d": d,
        "final": np.stack(
            [np.stack([mont_digits(x) for x in row]) for row in opt["final"]]
        ),
    }
