"""Fused Pallas TPU kernel: the full 67-round Hades252 permutation per tile.

TPU-native equivalent of the reference hot path `ScalarStrategy::perm`
(reference: src/strategies.rs:140-157 + src/strategies/scalar.rs:22-50),
designed for the VPU rather than translated:

  * Layout is PLANAR / digit-major: a tile holds B independent permutation
    states as (WIDTH, N_DIGITS, B) uint32 — the batch axis maps onto the
    128-wide lane dimension so every digit op is a full-width vector op,
    and the 16-digit axis maps onto sublanes. (The batch-minor layout of
    field.py would waste 7/8 of each lane group.)
  * All 67 rounds are fused in one kernel invocation per tile: state stays
    in VMEM/registers for the whole permutation; only the initial load and
    final store touch HBM. Round constants (67x5x16 u32 = 21 KB) and the
    MDS matrix (1.6 KB) are VMEM-resident.
  * Field arithmetic is the same exact schoolbook + full-word Montgomery
    REDC scheme as field.py (see overflow analysis there), specialized to
    digit-major arrays and fully unrolled over digits; rounds iterate via
    lax.fori_loop so the Mosaic trace stays ~3 round bodies.

Verified bit-exact against ops/perm_ref.py (tests/test_perm_pallas.py).
"""

from __future__ import annotations

import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import (
    DIGIT_BITS,
    DIGIT_MASK,
    N_DIGITS,
    PARTIAL_ROUNDS,
    TOTAL_FULL_ROUNDS,
    ROUNDS,
    WIDTH,
    perm_constants_np,
)

# numpy scalars, not jnp arrays: Pallas kernels must not close over jax.Arrays
_MASK = np.uint32(DIGIT_MASK)
_SH = DIGIT_BITS
_D = N_DIGITS

# Default lane-axis tile per schedule (measured throughput knees on v5e):
# 2048 for the dense schedules; 1024 for the hyb/hybp basis-chain schedules
# (their resident weights + basis buffer favor the smaller tile).
DEFAULT_BLOCK = 2048
DEFAULT_SCHEDULE = "hybp"


def default_block(schedule: str = DEFAULT_SCHEDULE) -> int:
    return 1024 if schedule.startswith(("hyb", "hybp")) else DEFAULT_BLOCK

# Emulation toggle: when set the kernel body runs eagerly on NUMPY arrays
# (identical uint32 wrap-around semantics, zero XLA compile) — the CPU test
# path. A ContextVar (not a module global) so a concurrent jit trace of
# permute_planar in another thread never observes the numpy namespace.
_EMULATE = contextvars.ContextVar("hades_emulate", default=False)


def _emu() -> bool:
    return _EMULATE.get()


def _xp():
    """Array namespace for the kernel body: jnp (traced) or numpy (emulated)."""
    return np if _emu() else jnp


def _fori(lo, hi, body, st):
    """lax.fori_loop when traced; a plain Python loop under emulation."""
    if _emu():
        for r in range(lo, hi):
            st = body(r, st)
        return st
    return jax.lax.fori_loop(lo, hi, body, st)


# ---------------------------------------------------------------------------
# Digit-major field arithmetic (arrays are (n_digits, B); axis 0 = digits).
# Exactness bounds are identical to field.py: 16x16-bit digit products are
# exact in uint32; column sums < 2^22; carry chains are unrolled.
# ---------------------------------------------------------------------------


def _carry(acc):
    """Normalize column sums to 16-bit digits; final carry must be 0."""
    rows = []
    carry = _xp().zeros_like(acc[0:1])
    for d in range(acc.shape[0]):
        t = acc[d : d + 1] + carry
        rows.append(t & _MASK)
        carry = t >> _SH
    return _xp().concatenate(rows, axis=0)


def _slice_add(acc, start, vals):
    """acc[start:start+len(vals)] += vals, via slice+concat (Pallas-friendly:
    .at[].add lowers to scatter, which Mosaic rejects for captured indices)."""
    stop = start + vals.shape[0]
    pieces = []
    if start > 0:
        pieces.append(acc[:start])  # Mosaic rejects zero-size slices
    pieces.append(acc[start:stop] + vals)
    if stop < acc.shape[0]:
        pieces.append(acc[stop:])
    if len(pieces) == 1:
        return pieces[0]
    return _xp().concatenate(pieces, axis=0)


def _mul_cols(a, b, n_out, acc=None):
    """Un-carried schoolbook columns of a*b, added into acc (fresh if None).

    a, b: (D, 1) or (D, B) in any combination. Per product, each column
    receives <= 32 split halves < 2^16, so one product contributes < 2^21
    per column; up to 5 products may be accumulated (< 2^24) before a carry
    pass — the lazy-reduction seam used by the MDS/dot layers.
    """
    xp = _xp()
    if acc is None:
        bshape = xp.broadcast_shapes(a.shape[1:], b.shape[1:])
        acc = xp.zeros((n_out,) + bshape, xp.uint32)
    for i in range(_D):
        prod = a[i : i + 1] * b  # (D, B), exact in uint32
        lo = prod & _MASK
        hi = prod >> _SH
        w_lo = min(_D, n_out - i)
        if w_lo > 0:
            acc = _slice_add(acc, i, lo[:w_lo])
        w_hi = min(_D, n_out - i - 1)
        if w_hi > 0:
            acc = _slice_add(acc, i + 1, hi[:w_hi])
    if _emu():
        # sanitizer analogue (SURVEY.md §5): the lazy-reduction bound that
        # every caller relies on — checked on every CPU test run
        assert int(acc.max()) < (1 << 24), "column accumulator overflow"
    return acc


def _sqr_cols(a):
    """Un-carried columns of a*a, symmetric schoolbook: each off-diagonal
    product a_i*a_j (i<j) is computed once and its split halves doubled
    (halves < 2^16 so doubles < 2^17; column sums < 2^22). 136 digit
    products instead of 256."""
    xp = _xp()
    acc = xp.zeros((2 * _D,) + a.shape[1:], xp.uint32)
    for i in range(_D):
        diag = a[i : i + 1] * a[i : i + 1]
        acc = _slice_add(acc, 2 * i, diag & _MASK)
        acc = _slice_add(acc, 2 * i + 1, diag >> _SH)
        if i + 1 < _D:
            prod = a[i : i + 1] * a[i + 1 :]  # rows j = i+1 .. D-1
            lo = prod & _MASK
            hi = prod >> _SH
            acc = _slice_add(acc, 2 * i + 1, lo + lo)
            acc = _slice_add(acc, 2 * i + 2, hi + hi)
    if _emu():
        assert int(acc.max()) < (1 << 22), "square accumulator overflow"
    return acc


# -- base-2^13 S-box schoolbook (the hyb13/hybp13 variants) ------------------
# Raw 26-bit products accumulate in uint32 with NO lo/hi split; the results
# repack carry-free into the 16-bit column buffers the REDC machinery
# consumes. Measured essentially op-count-NEUTRAL vs _sqr_cols/_mul_cols
# (~3100 vs 3120 lane-ops per S-box: the 20-vs-16 digit-count growth
# cancels the split savings — ops/sbox13.py op_count_report, PERF.md r3).

_D13 = 20                      # ceil(256 / 13) thirteen-bit digits
_M13 = np.uint32((1 << 13) - 1)


def _to13(a16):
    """(16, B) normalized 16-bit digits -> (20, B) 13-bit digits. Carry-
    free bit windowing (each 13-bit digit spans <= 2 source digits)."""
    xp = _xp()
    rows = []
    for k in range(_D13):
        j, r = divmod(13 * k, 16)
        lo = a16[j : j + 1] >> r
        if r + 13 > 16 and j + 1 < _D:
            lo = lo | (a16[j + 1 : j + 2] << (16 - r))
        rows.append(lo & _M13)
    return xp.concatenate(rows, axis=0)


def _mul13_cols(a13, b13):
    """Un-carried base-2^13 schoolbook columns: products < 2^26 accumulate
    directly; <= 20 per column keeps sums < 2^31."""
    xp = _xp()
    bshape = xp.broadcast_shapes(a13.shape[1:], b13.shape[1:])
    acc = xp.zeros((2 * _D13 - 1,) + bshape, xp.uint32)
    for i in range(_D13):
        acc = _slice_add(acc, i, a13[i : i + 1] * b13)
    if _emu():
        assert int(acc.max()) < (1 << 31), "base-13 column overflow"
    return acc


def _sqr13_cols(a13):
    """Symmetric base-2^13 squaring: diagonal once, off-diagonals doubled
    (2*2^26 terms, <= 10 + diagonal per column: sums < 2^31). 210 products
    instead of 400."""
    xp = _xp()
    acc = xp.zeros((2 * _D13 - 1,) + a13.shape[1:], xp.uint32)
    for i in range(_D13):
        diag = a13[i : i + 1] * a13[i : i + 1]
        acc = _slice_add(acc, 2 * i, diag)
        if i + 1 < _D13:
            prod = a13[i : i + 1] * a13[i + 1 :]
            acc = _slice_add(acc, 2 * i + 1, prod + prod)
    if _emu():
        assert int(acc.max()) < (1 << 31), "base-13 square overflow"
    return acc


def _cols13_to16(cols13, n_out=2 * _D):
    """Value-preserving carry-free repack: base-2^13 column sums (< 2^31
    at bit offset 13k) -> base-2^16 column sums. Each source column windows
    into <= 3 output columns (low window masks BEFORE the left shift so
    nothing overflows uint32); <= 4 sources overlap one output column, so
    output sums < 2^18 — far inside the REDC path's < 2^24 bound."""
    xp = _xp()
    acc = xp.zeros((n_out,) + cols13.shape[1:], xp.uint32)
    for k in range(2 * _D13 - 1):
        v = cols13[k : k + 1]
        j, r = divmod(13 * k, 16)
        if r == 0:
            if j < n_out:
                acc = _slice_add(acc, j, v & _MASK)
            if j + 1 < n_out:
                acc = _slice_add(acc, j + 1, v >> 16)
        else:
            if j < n_out:
                low = np.uint32((1 << (16 - r)) - 1)
                acc = _slice_add(acc, j, (v & low) << r)
            if j + 1 < n_out:
                acc = _slice_add(acc, j + 1, (v >> (16 - r)) & _MASK)
            if j + 2 < n_out and r > 1:
                acc = _slice_add(acc, j + 2, v >> (32 - r))
    if _emu():
        assert int(acc.max()) < (1 << 18), "base-13 repack overflow"
    return acc


def _mul(a, b, n_out):
    """Schoolbook product of digit-major values, normalized to n_out digits."""
    return _carry(_mul_cols(a, b, n_out))


def _add_wide(a, b):
    """Digit-wise sum with carry chain (carry out structurally zero)."""
    return _carry(a + b)


def _sub_borrow(a, b):
    """a - b with borrow chain: returns (borrow (1,B), digits)."""
    rows = []
    borrow = _xp().zeros_like(a[0:1])
    for d in range(a.shape[0]):
        t = a[d : d + 1] - b[d : d + 1] - borrow  # wraps mod 2^32
        rows.append(t & _MASK)
        borrow = t >> np.uint32(31)
    return borrow, _xp().concatenate(rows, axis=0)


def _cond_sub_p(a, p):
    """Reduce [0, 2p) -> [0, p)."""
    borrow, diff = _sub_borrow(a, _xp().broadcast_to(p, a.shape))
    return _xp().where(borrow == 0, diff, a)


def _add_mod(a, b, p):
    return _cond_sub_p(_add_wide(a, _xp().broadcast_to(b, a.shape)), p)


def _redc32(cols, p, pp):
    """REDC of un-carried 32-digit columns, T < Rp: returns T*R^{-1} mod p
    normalized (< p). m = (T mod R)p' mod R; t = (T + mp)/R < 2p."""
    t = _carry(cols)
    m = _mul(t[:_D], pp, _D)
    s = _carry(_mul_cols(m, _xp().broadcast_to(p, m.shape), 2 * _D, acc=t))
    return _cond_sub_p(s[_D:], p)


def _redc_lazy(cols33, p, pp, p17, twop17):
    """REDC of an un-carried 33-digit accumulator holding T < 5p^2 (a sum of
    up to 5 Montgomery products — 5p^2 needs 513 bits, hence the extra
    digit). t = (T + mp)/R < 5p^2/R + p < 3.3p: two conditional subtracts
    (2p then p) normalize; the 17th digit is then structurally zero."""
    t = _carry(cols33)
    m = _mul(t[:_D], pp, _D)
    s = _carry(_mul_cols(m, _xp().broadcast_to(p, m.shape), 2 * _D + 1, acc=t))
    hi = s[_D:]  # 17 digits, value < 3.3p
    hi = _cond_sub_p(hi, twop17)
    hi = _cond_sub_p(hi, p17)
    return hi[:_D]


def _mont_mul(a, b, p, pp):
    """Montgomery product a*b*R^{-1} mod p, digit-major (see field.mont_mul)."""
    return _redc32(_mul_cols(a, b, 2 * _D), p, pp)


def _mont_sqr(x, p, pp):
    """Montgomery square via the symmetric schoolbook (_sqr_cols)."""
    return _redc32(_sqr_cols(x), p, pp)


def _sbox(x, p, pp):
    """x^5: (x^2)^2 * x (reference: src/strategies/scalar.rs:32-34)."""
    x2 = _mont_sqr(x, p, pp)
    x4 = _mont_sqr(x2, p, pp)
    return _mont_mul(x4, x, p, pp)


# ---------------------------------------------------------------------------
# The fused permutation kernel
# ---------------------------------------------------------------------------


def _perm_kernel(ark_ref, mds_ref, fc_ref, in_ref, out_ref, *, convert: bool):
    """67-round permutation on one planar tile.

    ark_ref: (ROUNDS, WIDTH, D) Montgomery ARK constants.
    mds_ref: (WIDTH, WIDTH, D) Montgomery MDS.
    fc_ref:  (4, D) field constants: p, p', R^2, 1.
    in_ref/out_ref: (WIDTH, D, B) canonical digits (convert=True) or
    Montgomery-domain digits (convert=False, for sponge/Merkle pipelines
    that stay in-domain across permutations).
    """
    p = fc_ref[0, :][:, None]  # (D, 1)
    pp = fc_ref[1, :][:, None]
    r2 = fc_ref[2, :][:, None]
    one = fc_ref[3, :][:, None]

    if convert:
        # Load + convert to Montgomery (10 of ~1982 muls: ~0.5% overhead)
        state = [_mont_mul(in_ref[w], r2, p, pp) for w in range(WIDTH)]
    else:
        state = [in_ref[w] for w in range(WIDTH)]

    def mds_layer(state):
        """Mix layer (reference: scalar.rs:36-49), j-ascending reduction."""
        out = []
        for k in range(WIDTH):
            acc = None
            for j in range(WIDTH):
                m = mds_ref[k, j, :][:, None]
                prod = _mont_mul(m, state[j], p, pp)
                acc = prod if acc is None else _add_mod(acc, prod, p)
            out.append(acc)
        return out

    def round_fn(r, state, full):
        cs = ark_ref[r]  # (WIDTH, D) dynamic round index
        state = [_add_mod(state[w], cs[w, :][:, None], p) for w in range(WIDTH)]
        if full:
            state = [_sbox(w, p, pp) for w in state]
        else:
            state = state[:-1] + [_sbox(state[-1], p, pp)]
        return mds_layer(state)

    half = TOTAL_FULL_ROUNDS // 2

    def full_body(r, st):
        return tuple(round_fn(r, list(st), full=True))

    def partial_body(r, st):
        return tuple(round_fn(r, list(st), full=False))

    st = tuple(state)
    st = _fori(0, half, full_body, st)
    st = _fori(half, half + PARTIAL_ROUNDS, partial_body, st)
    st = _fori(half + PARTIAL_ROUNDS, ROUNDS, full_body, st)

    # Store (converting out of the Montgomery domain if we converted in)
    for w in range(WIDTH):
        out_ref[w] = _mont_mul(st[w], one, p, pp) if convert else st[w]


def _perm_kernel_opt(arkfr_ref, mds_ref, fc_ref, u_ref, w_ref, m_ref, d_ref,
                     c0_ref, fin_ref, in_ref, out_ref, *, convert: bool):
    """Optimized 67-round permutation on one planar tile.

    Exact same outputs as _perm_kernel (verified against the oracle), with
    three algebraic/arithmetic optimizations:
      * sparse-factored partial rounds (params.optimized_partial_int): each
        of the 59 partial rounds applies a 9-entry sparse matrix instead of
        the dense 5x5 MDS (9 muls vs 25), with one dense 4x4 fixup (A^59)
        after the chain;
      * lazy reduction: MDS rows / sparse dots accumulate up to 5 wide
        products in a 33-digit column buffer and Montgomery-reduce ONCE
        (_redc_lazy) — 5 REDCs per mix layer instead of 25;
      * symmetric squaring for the S-box's x^2 and x^4 (_sqr_cols).

    arkfr_ref: (8, WIDTH, D) full-round ARK (global rounds 0..3, 63..66).
    u_ref/w_ref: (59, 4, D) sparse column/row entries; m_ref: (1, D).
    d_ref: (59, WIDTH, D) folded constants (row 58 zero).
    c0_ref: (WIDTH, D); fin_ref: (4, 4, D) = A^59. All Montgomery form.
    """
    xp = _xp()
    p = fc_ref[0, :][:, None]
    pp = fc_ref[1, :][:, None]
    r2 = fc_ref[2, :][:, None]
    one = fc_ref[3, :][:, None]
    p17 = xp.concatenate([p, xp.zeros_like(p[0:1])], axis=0)
    twop17 = _carry(p17 + p17)

    if convert:
        state = tuple(_mont_mul(in_ref[w], r2, p, pp) for w in range(WIDTH))
    else:
        state = tuple(in_ref[w] for w in range(WIDTH))

    def mds_lazy(st):
        out = []
        for k in range(WIDTH):
            acc = None
            for j in range(WIDTH):
                acc = _mul_cols(mds_ref[k, j, :][:, None], st[j],
                                2 * _D + 1, acc)
            out.append(_redc_lazy(acc, p, pp, p17, twop17))
        return out

    def full_body(r, st):
        cs = arkfr_ref[r]  # (WIDTH, D)
        st = [_add_mod(st[w], cs[w, :][:, None], p) for w in range(WIDTH)]
        st = [_sbox(w_, p, pp) for w_ in st]
        return tuple(mds_lazy(st))

    def partial_body(r, st):
        xs = list(st[:4])
        x4 = _sbox(st[4], p, pp)
        uu = u_ref[r]  # (4, D)
        ww = w_ref[r]
        dd = d_ref[r]  # (WIDTH, D); zero row for the last round
        new = [
            _add_mod(xs[i], _mont_mul(uu[i, :][:, None], x4, p, pp), p)
            for i in range(4)
        ]
        acc = None
        for j in range(4):
            acc = _mul_cols(ww[j, :][:, None], xs[j], 2 * _D + 1, acc)
        acc = _mul_cols(m_ref[0, :][:, None], x4, 2 * _D + 1, acc)
        n4 = _redc_lazy(acc, p, pp, p17, twop17)
        out = [_add_mod(new[i], dd[i, :][:, None], p) for i in range(4)]
        out.append(_add_mod(n4, dd[4, :][:, None], p))
        return tuple(out)

    half = TOTAL_FULL_ROUNDS // 2
    st = _fori(0, half, full_body, state)
    # enter the transformed partial chain: x = s + c0
    st = tuple(
        _add_mod(st[w], c0_ref[w, :][:, None], p) for w in range(WIDTH)
    )
    st = _fori(0, PARTIAL_ROUNDS, partial_body, st)
    # leave the chain: words 0..3 <- A^59 @ x[0:4]
    fin = []
    for i in range(4):
        acc = None
        for j in range(4):
            acc = _mul_cols(fin_ref[i, j, :][:, None], st[j], 2 * _D + 1, acc)
        fin.append(_redc_lazy(acc, p, pp, p17, twop17))
    st = tuple(fin) + (st[4],)
    st = _fori(half, TOTAL_FULL_ROUNDS, full_body, st)

    for w in range(WIDTH):
        out_ref[w] = _mont_mul(st[w], one, p, pp) if convert else st[w]


# ---------------------------------------------------------------------------
# MXU schedule: the MDS layer and its Montgomery reduction ride the matrix
# unit as constant bf16 matmuls (exact: every operand is a byte 0..255 and
# every f32 accumulation stays < 2^24). The S-box (variable x variable)
# stays on the VPU. Weights built host-side in params.mxu_weights_np.
# ---------------------------------------------------------------------------


def _f_dtype():
    """Matmul operand dtype: bf16 on TPU (bytes 0..255 exact), f32 under
    numpy emulation (numpy has no bfloat16; same exactness bound)."""
    return np.float32 if _emu() else jnp.bfloat16


def _dot_u32(w, x):
    """Exact constant matmul: (M, K) @ (K, B) -> (M, B) uint32.

    All products are <= 255*255 and all column sums < 2^24, so f32
    accumulation is exact regardless of order."""
    if _emu():
        acc = w @ x
        assert float(acc.max()) < float(1 << 24), "f32 matmul exactness bound"
        return acc.astype(np.uint32)
    acc = jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # f32 -> i32 -> u32: values are < 2^24 and non-negative, every step exact
    return acc.astype(jnp.int32).astype(jnp.uint32)


def _byte_rows_u32(x16):
    """(16, B) u32 digit rows -> (32, B) u32 byte rows: low bytes of digits
    0..15 then high bytes (the layout of params._byte_pos)."""
    xp = _xp()
    return xp.concatenate([x16 & np.uint32(0xFF), x16 >> np.uint32(8)],
                          axis=0)


def _bytes_cast(xb):
    """u32 byte rows -> the bf16 matmul operand dtype. Cast goes through
    int32 (Mosaic has no uint32->bf16 path; values are bytes, exact both
    ways)."""
    return xb.astype(_xp().int32).astype(_f_dtype())


def _dot_u32_i8(w_s8, rowsum, xb):
    """Exact constant matmul on the int8 MXU path.

    w_s8 = W - 128 in int8 (W has byte entries 0..255); rowsum = per-row
    sums of w_s8 (int32, (M, 1)); xb: (K, B) uint32 byte rows. Identity:
        W @ x = w_s8 @ (x - 128) + 128*rowsum + 128*colsum(x)
    (the two 128^2 K terms cancel). |w_s8 @ x_s8| <= 128*128*160 < 2^22 and
    corrections <= 128*255*160 < 2^23, all exact in int32.
    """
    xp = _xp()
    xb_i32 = xb.astype(xp.int32)  # Mosaic can't reduce unsigned ints
    colsum = xp.sum(xb_i32, axis=0, keepdims=True)  # (1, B)
    x_s8 = (xb_i32 - 128).astype(xp.int8)
    if _emu():
        acc = w_s8.astype(np.int32) @ x_s8.astype(np.int32)
        assert int(np.abs(acc).max()) < (1 << 23), "int8 matmul bound"
    else:
        acc = jax.lax.dot_general(
            w_s8, x_s8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    out = acc + 128 * rowsum + 128 * colsum
    return out.astype(xp.uint32)


def _recombine16(cols, n16):
    """Base-256 columns (2*n16 or 2*n16-1 rows, u32 < 2^24) -> n16 un-carried
    16-bit columns: col[2d] + (col[2d+1] << 8), each < 2^32."""
    xp = _xp()
    rows = []
    for d in range(n16):
        lo = cols[2 * d : 2 * d + 1]
        if 2 * d + 1 < cols.shape[0]:
            rows.append(lo + (cols[2 * d + 1 : 2 * d + 2] << np.uint32(8)))
        else:
            rows.append(lo)
    return xp.concatenate(rows, axis=0)


def _carry_lo(acc):
    """Carry-normalize only the first 16 rows (T mod R — the part the
    REDC's m-step must have exact); the low half's carry out is added into
    row 16 and the high rows stay un-carried columns. Halves the length of
    the serial input-carry chain: the final (T + mp) carry pass normalizes
    the high half anyway."""
    xp = _xp()
    rows = []
    carry = xp.zeros_like(acc[0:1])
    for d in range(_D):
        t = acc[d : d + 1] + carry
        rows.append(t & _MASK)
        carry = t >> _SH
    rows.append(acc[_D : _D + 1] + carry)
    return xp.concatenate(rows + [acc[_D + 1 :]], axis=0)


def _redc_words_mxu(ts, dot_pp, dot_p, p, p17, twop17, *, wide: bool,
                    normalize: bool = True):
    """Montgomery-reduce n words at once, LANE-PACKED: the words are
    concatenated along the batch (lane) axis so every serial carry/borrow
    chain — the latency-bound part of the whole kernel — executes once on
    (rows, n*B) instead of n times on (rows, B), and the two constant
    products (m = T_lo p' mod R, then m p) are shared-weight matmuls on the
    packed operand instead of n-block block-diagonal ones.

    ts: list of n UN-carried column arrays — (33, B) with T < 5p^2 when
    wide=True (lazy dot accumulations), (32, B) with T < 2.2p^2 when
    wide=False (S-box products, inputs possibly un-normalized < 2p — see
    normalize below). Only T mod R is carried before the m-step (_carry_lo);
    the high half rides un-carried into the final sum's carry pass.
    wide: t < 3.3p needs two conditional subtracts; otherwise t < 2p, one.
    normalize=False skips that last conditional subtract, returning < 2p —
    valid ONLY for the S-box's x^2/x^4 intermediates: with x2 < 1.46p,
    T = x2^2 < 2.11p^2 = 0.96 R p keeps REDC exact, and every digit still
    fits (2p < 2^256); the x^5 product then satisfies T < 1.96p^2 < Rp and
    its normalized output re-enters the < p invariant.
    """
    xp = _xp()
    n = len(ts)
    b = ts[0].shape[1]
    tcat = _carry_lo(ts[0] if n == 1 else xp.concatenate(ts, axis=1))
    m_cols = dot_pp(_byte_rows_u32(tcat[:_D]))              # (32, nB)
    m = _carry(_recombine16(m_cols, _D))                    # exact mod R
    mp_cols = dot_p(_byte_rows_u32(m))                      # (63, nB)
    mp = _recombine16(mp_cols, 2 * _D)                      # 32 rows
    if wide:
        zero = xp.zeros_like(mp[0:1])
        s = _carry(xp.concatenate([mp, zero], axis=0) + tcat)
        hi = _cond_sub_p(s[_D:], twop17)  # 17 digits < 3.3p
        out = _cond_sub_p(hi, p17)[:_D]
    else:
        s = _carry(mp + tcat)  # T + m*p < 2.2p^2 + Rp < 2^512
        out = s[_D:]
        if normalize:
            out = _cond_sub_p(out, p)  # < 2p -> < p
        elif _emu():
            # sanitizer: the un-normalized output must stay < 2p
            twop16 = _carry(xp.broadcast_to(p, out.shape) * np.uint32(2))
            borrow, _ = _sub_borrow(out, twop16)
            assert int(borrow.min()) == 1, "skipped cond-sub bound broken"
    if n == 1:
        return [out]
    return [out[:, k * b : (k + 1) * b] for k in range(n)]


def _perm_kernel_mxu(ark_ref, fc_ref, wlin_ref, wpp_ref, wp_ref,
                     in_ref, out_ref, *, convert: bool):
    """bf16 matmul variant — see _perm_kernel_mxu_impl."""

    def mk(w_ref):
        return lambda xb: _dot_u32(w_ref[:], _bytes_cast(xb))

    _perm_kernel_mxu_impl(ark_ref, fc_ref, mk(wlin_ref), mk(wpp_ref),
                          mk(wp_ref), in_ref, out_ref, convert=convert)


def _perm_kernel_mxu8(ark_ref, fc_ref, wlin_ref, wpp_ref, wp_ref,
                      rslin_ref, rspp_ref, rsp_ref, in_ref, out_ref, *,
                      convert: bool):
    """int8 matmul variant (offset-encoded, exact) — see _dot_u32_i8."""

    def mk(w_ref, rs_ref):
        return lambda xb: _dot_u32_i8(w_ref[:], rs_ref[:], xb)

    _perm_kernel_mxu_impl(ark_ref, fc_ref, mk(wlin_ref, rslin_ref),
                          mk(wpp_ref, rspp_ref), mk(wp_ref, rsp_ref),
                          in_ref, out_ref, convert=convert)


class _MxuOps:
    """Shared MXU-schedule machinery: field constants + the round closures
    (sbox on VPU with MXU reductions, MDS as one digit-convolution matmul).
    Used by the mxu/mxu8 kernels and the hyb kernel's full rounds."""

    def __init__(self, ark_ref, fc_ref, dot_lin, dot_pp, dot_p,
                 sbox13: bool = False):
        xp = _xp()
        self.p = fc_ref[0, :][:, None]
        self.pp = fc_ref[1, :][:, None]
        self.r2 = fc_ref[2, :][:, None]
        self.one = fc_ref[3, :][:, None]
        self.p17 = xp.concatenate(
            [self.p, xp.zeros_like(self.p[0:1])], axis=0
        )
        self.twop17 = _carry(self.p17 + self.p17)
        self.ark_ref = ark_ref
        self.dot_lin, self.dot_pp, self.dot_p = dot_lin, dot_pp, dot_p
        self.sbox13 = sbox13

    def redc_words(self, ts, normalize=True):
        return _redc_words_mxu(ts, self.dot_pp, self.dot_p, self.p,
                               self.p17, self.twop17, wide=False,
                               normalize=normalize)

    def sbox_words(self, ws):
        """x^5 on each word; squares/products on VPU, reductions on MXU.
        The x^2/x^4 intermediates skip their conditional subtract (< 2p is
        fine for the next stage's REDC bound — see _redc_words_mxu); only
        the final x^5 re-normalizes to < p. sbox13 switches the raw
        products to the base-2^13 schoolbook (values and hence all REDC
        bounds are identical; only the column representation changes —
        sums < 2^18 after the repack, well under the 16-bit path's own
        bound)."""
        if self.sbox13:
            w13 = [_to13(w_) for w_ in ws]
            x2 = self.redc_words(
                [_cols13_to16(_sqr13_cols(w_)) for w_ in w13],
                normalize=False,
            )
            x4 = self.redc_words(
                [_cols13_to16(_sqr13_cols(_to13(x_))) for x_ in x2],
                normalize=False,
            )
            return self.redc_words([
                _cols13_to16(_mul13_cols(_to13(a), b))
                for a, b in zip(x4, w13)
            ])
        x2 = self.redc_words([_sqr_cols(w_) for w_ in ws], normalize=False)
        x4 = self.redc_words([_sqr_cols(w_) for w_ in x2], normalize=False)
        return self.redc_words(
            [_mul_cols(a, b, 2 * _D) for a, b in zip(x4, ws)]
        )

    def mds_mxu(self, st):
        xp = _xp()
        by = xp.concatenate([_byte_rows_u32(w_) for w_ in st], axis=0)
        t_cols = self.dot_lin(by)                                   # (315, B)
        ts = []
        for k in range(WIDTH):
            cols = t_cols[k * 63 : (k + 1) * 63]
            t16 = _recombine16(cols, 2 * _D)                        # 32 rows
            zero = xp.zeros_like(t16[0:1])
            ts.append(xp.concatenate([t16, zero], axis=0))  # 33 un-carried
        return _redc_words_mxu(ts, self.dot_pp, self.dot_p, self.p,
                               self.p17, self.twop17, wide=True)

    def round_fn(self, r, st, full):
        cs = self.ark_ref[r]
        st = [_add_mod(st[w], cs[w, :][:, None], self.p)
              for w in range(WIDTH)]
        if full:
            st = self.sbox_words(st)
        else:
            st = st[:-1] + self.sbox_words([st[-1]])
        return tuple(self.mds_mxu(st))


def _perm_kernel_mxu_impl(ark_ref, fc_ref, dot_lin, dot_pp, dot_p,
                          in_ref, out_ref, *, convert: bool):
    """67-round permutation, naive round structure (reference:
    src/strategies.rs:140-157) with every constant multiplication on the
    MXU: the mix layer (wlin), and the two REDC products of every Montgomery
    reduction (wpp/wp, applied to the 5 state words lane-packed). Only the
    variable x variable S-box products run VPU schoolbook.
    Bit-identical outputs to the other schedules (tested)."""
    ops = _MxuOps(ark_ref, fc_ref, dot_lin, dot_pp, dot_p)

    if convert:
        state = tuple(
            _mont_mul(in_ref[w], ops.r2, ops.p, ops.pp) for w in range(WIDTH)
        )
    else:
        state = tuple(in_ref[w] for w in range(WIDTH))

    def full_body(r, st):
        return ops.round_fn(r, list(st), full=True)

    def partial_body(r, st):
        return ops.round_fn(r, list(st), full=False)

    half = TOTAL_FULL_ROUNDS // 2
    st = _fori(0, half, full_body, state)
    st = _fori(half, half + PARTIAL_ROUNDS, partial_body, st)
    st = _fori(half + PARTIAL_ROUNDS, ROUNDS, full_body, st)

    for w in range(WIDTH):
        out_ref[w] = (
            _mont_mul(st[w], ops.one, ops.p, ops.pp) if convert else st[w]
        )


# ---------------------------------------------------------------------------
# hyb schedule: full-expansion partial rounds (params.dot_schedule_int).
# Each of the 59 partial rounds is ONE int8 matmul over the basis buffer
# [1, x_0..x_4, s_0..s_{r-1}] + ONE wide Montgomery reduction + the S-box —
# replacing the dense MDS layer's five lane-packed reductions. The basis
# buffer Y lives in a VMEM scratch as offset-encoded bytes (value - 128).
# ---------------------------------------------------------------------------


def _dot_i8_raw(w_s8, y_s8):
    """(M, K) int8 @ (K, B) int8 -> (M, B) int32 (exact: |sum| <= K*128^2 <
    2^26 for K <= 2080, plus corrections < 2^29, all within int32)."""
    if _emu():
        return w_s8.astype(np.int32) @ y_s8.astype(np.int32)
    return jax.lax.dot_general(
        w_s8, y_s8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _store_rows(ref, start, val):
    """ref[start:start+rows, :] = val with a (possibly dynamic) row offset."""
    if _emu():
        ref[start : start + val.shape[0], :] = val
    else:
        ref[pl.ds(start, val.shape[0]), :] = val


def _recombine16_wide(cols):
    """63 un-carried base-256 columns with values < 2^27 (a dot of up to 65
    byte-Toeplitz products) -> 33 un-carried 16-bit columns.

    The 2-term recombine (_recombine16) would overflow here — col<<8 can
    reach 2^35 — so the odd column's high bits carry one byte up instead:
        t16[d] = cols[2d] + ((cols[2d+1] & 0xFF) << 8) + (cols[2d-1] >> 8)
    every term < 2^27 + 2^16 + 2^19 < 2^28, exact in uint32."""
    xp = _xp()
    rows = []
    for d in range(2 * _D):
        t = cols[2 * d : 2 * d + 1]
        if 2 * d + 1 < cols.shape[0]:
            t = t + ((cols[2 * d + 1 : 2 * d + 2] & np.uint32(0xFF))
                     << np.uint32(8))
        if d > 0:
            t = t + (cols[2 * d - 1 : 2 * d] >> np.uint32(8))
        rows.append(t)
    rows.append(xp.zeros_like(rows[0]))
    if _emu():
        assert max(int(r.max()) for r in rows) < (1 << 28), \
            "wide recombine bound"
    return xp.concatenate(rows, axis=0)


def _redc_wide_big(t33, ops, pmul_ref, n_subs: int = 5):
    """Montgomery-reduce a _carry_lo'd 33-digit value T < k p^2, k <= 65
    (low 16 digits exact, high rows possibly un-carried columns) — (the
    full-expansion dot accumulates up to 65 Montgomery products; 65 p^2 <
    2^517 fits 33 digits). t = (T + m p)/R < k p^2/R + p < (0.46 k + 1) p;
    a binary conditional-subtract ladder (pmul_ref rows: 16p, 8p, 4p, 2p,
    p as 17-digit multiples) normalizes any value < 2^n_subs p to < p —
    callers pass the n_subs their k warrants (k<=6: 2, k<=32: 4, else 5)."""
    xp = _xp()
    m_cols = ops.dot_pp(_byte_rows_u32(t33[:_D]))              # (32, B)
    m = _carry(_recombine16(m_cols, _D))                       # exact mod R
    mp_cols = ops.dot_p(_byte_rows_u32(m))                     # (63, B)
    mp = _recombine16(mp_cols, 2 * _D)                         # 32 rows
    zero = xp.zeros_like(mp[0:1])
    s = _carry(xp.concatenate([mp, zero], axis=0) + t33)       # 33 digits
    hi = s[_D:]                                                # 17 digits
    for k in range(5 - n_subs, 5):
        hi = _cond_sub_p(hi, pmul_ref[k][:, None])
    if _emu():
        # sanitizer: the skipped ladder rungs must have been unnecessary
        borrow, _ = _sub_borrow(
            hi, xp.broadcast_to(pmul_ref[4][:, None], hi.shape)
        )
        assert int(borrow.min()) == 1, "wide-REDC ladder under-reduced"
    return hi[:_D]


def _perm_kernel_hyb(ark_ref, fc_ref, wlin_ref, wpp_ref, wp_ref,
                     rslin_ref, rspp_ref, rsp_ref,
                     w1_ref, rs1_ref, w2_ref, rs2_ref,
                     wout_ref, rsout_ref, pmul_ref, onem_ref,
                     in_ref, out_ref, y_ref, *, convert: bool,
                     sbox13: bool = False):
    """67-round permutation: mxu8 full rounds + full-expansion partial chain.

    The 59 partial rounds run as one int8 matmul over the growing basis
    buffer + one wide REDC + one S-box each (see params.dot_schedule_int for
    the exact algebraic transform and tests for bit-identity with the naive
    schedule). y_ref: (32*65, B) int8 VMEM scratch holding the basis
    elements as offset bytes; rows of absent elements hold raw byte 0
    (i.e. -128), whose matmul contribution is exactly zero because the
    corresponding weight bytes are zero (see params.hyb_weights_np).
    """
    from ..params import HYB_N_BASIS, HYB_SEG1_ELEMS, HYB_SEG1_ROUNDS, \
        HYB_SEG2_ELEMS

    xp = _xp()

    def mk(w_ref, rs_ref):
        return lambda xb: _dot_u32_i8(w_ref[:], rs_ref[:], xb)

    ops = _MxuOps(ark_ref, fc_ref, mk(wlin_ref, rslin_ref),
                  mk(wpp_ref, rspp_ref), mk(wp_ref, rsp_ref),
                  sbox13=sbox13)

    if convert:
        state = tuple(
            _mont_mul(in_ref[w], ops.r2, ops.p, ops.pp) for w in range(WIDTH)
        )
    else:
        state = tuple(in_ref[w] for w in range(WIDTH))

    half = TOTAL_FULL_ROUNDS // 2
    st = _fori(0, half,
               lambda r, s: ops.round_fn(r, list(s), full=True), state)

    b = st[0].shape[-1]
    y_rows = 32 * HYB_N_BASIS

    # --- init the basis buffer: [1_mont, x_0..x_4], rest raw byte 0 -------
    _store_rows(y_ref, 0, xp.full((y_rows, b), -128, xp.int8))

    def put_elem(j, digits16):
        by = xp.broadcast_to(_byte_rows_u32(digits16), (2 * _D, b))
        _store_rows(y_ref, 32 * j,
                    (by.astype(xp.int32) - 128).astype(xp.int8))
        return by.astype(xp.int32).sum(axis=0, keepdims=True)

    cs = put_elem(0, onem_ref[0, :][:, None])
    for i in range(WIDTH):
        cs = cs + put_elem(1 + i, st[i])

    # --- the 59-round chain, two fixed-width segments ---------------------
    def chain_seg(w_ref_s, rs_ref_s, n_rounds, base, k_elems, cs, n_subs):
        kcols = 32 * k_elems

        def body(i, cs):
            w = w_ref_s[i]                       # (63, kcols) int8
            rs = rs_ref_s[i]                     # (63, 1) int32
            y = y_ref[0:kcols, :]
            acc = _dot_i8_raw(w, y) + 128 * rs + 128 * cs
            cols = acc.astype(xp.uint32)         # byte columns of the dot
            t33 = _carry_lo(_recombine16_wide(cols))
            t = _redc_wide_big(t33, ops, pmul_ref, n_subs)  # S-box input
            s = ops.sbox_words([t])[0]
            by = _byte_rows_u32(s)
            _store_rows(y_ref, 32 * (1 + WIDTH + base + i),
                        (by.astype(xp.int32) - 128).astype(xp.int8))
            return cs + by.astype(xp.int32).sum(axis=0, keepdims=True)

        return _fori(0, n_rounds, body, cs)

    cs = chain_seg(w1_ref, rs1_ref, HYB_SEG1_ROUNDS, 0, HYB_SEG1_ELEMS, cs,
                   n_subs=4)
    cs = chain_seg(w2_ref, rs2_ref, PARTIAL_ROUNDS - HYB_SEG1_ROUNDS,
                   HYB_SEG1_ROUNDS, HYB_SEG2_ELEMS, cs, n_subs=5)

    # --- chain exit: all 5 output words in one matmul + one packed REDC ---
    y = y_ref[0:y_rows, :]
    acc = _dot_i8_raw(wout_ref[:], y) + 128 * rsout_ref[:] + 128 * cs
    cols = acc.astype(xp.uint32)                 # (315, B)
    ts = [
        _carry_lo(_recombine16_wide(cols[k * 63 : (k + 1) * 63]))
        for k in range(WIDTH)
    ]
    red = _redc_wide_big(xp.concatenate(ts, axis=1), ops, pmul_ref)
    st = tuple(red[:, k * b : (k + 1) * b] for k in range(WIDTH))

    st = _fori(half + PARTIAL_ROUNDS, ROUNDS,
               lambda r, s: ops.round_fn(r, list(s), full=True), st)

    for w in range(WIDTH):
        out_ref[w] = (
            _mont_mul(st[w], ops.one, ops.p, ops.pp) if convert else st[w]
        )


def _perm_kernel_hybp(ark_ref, fc_ref, wlin_ref, wpp_ref, wp_ref,
                      rslin_ref, rspp_ref, rsp_ref,
                      wo1_ref, rso1_ref, wo2_ref, rso2_ref,
                      wn_ref, rsn_ref,
                      wout_ref, rsout_ref, pmul_ref, onem_ref,
                      in_ref, out_ref, y_ref, *, convert: bool,
                      sbox13: bool = False):
    """Software-pipelined hyb: round r's BIG basis matmul excludes the
    newest element s_{r-1} (a separate (63,32) Toeplitz matmul adds it), so
    the big matmul for round r+1 depends only on elements through s_{r-1}
    and is issued in the same iteration as round r's S-box chain — Mosaic
    overlaps the MXU streaming with the serial VPU chains, taking the
    matmul off the critical path (see params.hybp_weights_np)."""
    from ..params import HYB_N_BASIS, HYB_SEG1_ELEMS, HYB_SEG1_ROUNDS

    xp = _xp()

    def mk(w_ref, rs_ref):
        return lambda xb: _dot_u32_i8(w_ref[:], rs_ref[:], xb)

    ops = _MxuOps(ark_ref, fc_ref, mk(wlin_ref, rslin_ref),
                  mk(wpp_ref, rspp_ref), mk(wp_ref, rsp_ref),
                  sbox13=sbox13)

    if convert:
        state = tuple(
            _mont_mul(in_ref[w], ops.r2, ops.p, ops.pp) for w in range(WIDTH)
        )
    else:
        state = tuple(in_ref[w] for w in range(WIDTH))

    half = TOTAL_FULL_ROUNDS // 2
    st = _fori(0, half,
               lambda r, s: ops.round_fn(r, list(s), full=True), state)

    b = st[0].shape[-1]
    y_rows = 32 * HYB_N_BASIS
    k1 = 32 * HYB_SEG1_ELEMS

    _store_rows(y_ref, 0, xp.full((y_rows, b), -128, xp.int8))

    def put_elem(j, digits16):
        by = xp.broadcast_to(_byte_rows_u32(digits16), (2 * _D, b))
        _store_rows(y_ref, 32 * j,
                    (by.astype(xp.int32) - 128).astype(xp.int8))
        return by.astype(xp.int32).sum(axis=0, keepdims=True)

    cs = put_elem(0, onem_ref[0, :][:, None])
    for i in range(WIDTH):
        cs = cs + put_elem(1 + i, st[i])

    def cdot(w, rs, kcols, cs):
        """Corrected big dot over the first kcols basis rows of Y."""
        return _dot_i8_raw(w, y_ref[0:kcols, :]) + 128 * rs + 128 * cs

    def reduce_t(cols_i32, n_subs):
        t33 = _carry_lo(_recombine16_wide(cols_i32.astype(xp.uint32)))
        return _redc_wide_big(t33, ops, pmul_ref, n_subs)

    def new_part(i, sb):
        """The newest element's contribution to round i's dot."""
        s8 = (sb.astype(xp.int32) - 128).astype(xp.int8)
        csn = sb.astype(xp.int32).sum(axis=0, keepdims=True)
        part = _dot_i8_raw(wn_ref[i], s8) + 128 * rsn_ref[i] + 128 * csn
        return part, csn, s8

    # prologue: round 0 — every input is in Y; also issue round 1's big dot
    cols0 = cdot(wo1_ref[0], rso1_ref[0], k1, cs)
    d_old = cdot(wo1_ref[1], rso1_ref[1], k1, cs)
    s_prev = ops.sbox_words([reduce_t(cols0, n_subs=2)])[0]  # s_0 (k = 6)

    def make_body(kcols, wo_ref_s, rso_ref_s, idx_off, n_subs):
        def body(i, carry):
            cs, s_prev, d_old = carry
            sb = _byte_rows_u32(s_prev)
            npart, csn, s8 = new_part(i, sb)
            t = reduce_t(d_old + npart, n_subs)
            _store_rows(y_ref, 32 * (5 + i), s8)   # s_{i-1} enters the basis
            cs = cs + csn
            d_next = cdot(wo_ref_s[i - idx_off], rso_ref_s[i - idx_off],
                          kcols, cs)               # round i+1's big dot
            s = ops.sbox_words([t])[0]             # overlaps d_next on MXU
            return cs, s, d_next
        return body

    k2 = 32 * 2 * HYB_SEG1_ELEMS  # seg2 width (64 elements)
    seg1_last = HYB_SEG1_ROUNDS - 1  # round 26, peeled (next dot is seg2)
    carry = (cs, s_prev, d_old)
    # rounds 1..25: next dot stays in seg1 (wo1[i+1] -> idx_off = -1)
    carry = _fori(1, seg1_last,
                  make_body(k1, wo1_ref, rso1_ref, -1, n_subs=4), carry)
    # round 26 peeled: next dot (round 27) uses seg2 width
    cs, s_prev, d_old = carry
    sb = _byte_rows_u32(s_prev)
    npart, csn, s8 = new_part(seg1_last, sb)
    t = reduce_t(d_old + npart, n_subs=4)
    _store_rows(y_ref, 32 * (5 + seg1_last), s8)
    cs = cs + csn
    d_old = cdot(wo2_ref[0], rso2_ref[0], k2, cs)
    s_prev = ops.sbox_words([t])[0]
    # rounds 27..57: wo2[i - 26] is round i+1 (wo2[j] = round 27 + j)
    carry = _fori(HYB_SEG1_ROUNDS, PARTIAL_ROUNDS - 1,
                  make_body(k2, wo2_ref, rso2_ref, 26, n_subs=5),
                  (cs, s_prev, d_old))
    # round 58 peeled: no further big dot; finish the chain
    cs, s_prev, d_old = carry
    sb = _byte_rows_u32(s_prev)
    npart, csn, s8 = new_part(PARTIAL_ROUNDS - 1, sb)
    t = reduce_t(d_old + npart, n_subs=5)
    _store_rows(y_ref, 32 * (4 + PARTIAL_ROUNDS), s8)  # s_57, element 63
    cs = cs + csn
    s_last = ops.sbox_words([t])[0]                    # s_58
    cs = cs + put_elem(HYB_N_BASIS - 1, s_last)

    # chain exit + final full rounds (same as hyb)
    acc = _dot_i8_raw(wout_ref[:], y_ref[0:y_rows, :]) \
        + 128 * rsout_ref[:] + 128 * cs
    cols = acc.astype(xp.uint32)
    ts = [
        _carry_lo(_recombine16_wide(cols[k * 63 : (k + 1) * 63]))
        for k in range(WIDTH)
    ]
    red = _redc_wide_big(xp.concatenate(ts, axis=1), ops, pmul_ref)
    st = tuple(red[:, k * b : (k + 1) * b] for k in range(WIDTH))

    st = _fori(half + PARTIAL_ROUNDS, ROUNDS,
               lambda r, s: ops.round_fn(r, list(s), full=True), st)

    for w in range(WIDTH):
        out_ref[w] = (
            _mont_mul(st[w], ops.one, ops.p, ops.pp) if convert else st[w]
        )


class _HostRef:
    """Minimal pl.Ref stand-in so the kernel body can run as a plain traced
    function (see permute_planar_emulated)."""

    def __init__(self, arr=None):
        self.arr = arr
        self.writes = {}

    def __getitem__(self, idx):
        if self.arr is None:
            return self.writes[idx]
        return self.arr[idx]

    def __setitem__(self, idx, val):
        if self.arr is not None:
            self.arr[idx] = val  # scratch buffers (e.g. the hyb basis)
        else:
            self.writes[idx] = val


def permute_planar_emulated(x, *, convert: bool = True,
                            schedule: str = DEFAULT_SCHEDULE):
    """Run the EXACT kernel body (_perm_kernel) eagerly on numpy arrays.

    Mosaic interpret mode executes this kernel orders of magnitude too
    slowly for CI (minutes per tile), and XLA:CPU takes minutes to compile
    the unrolled round bodies — so CPU tests validate the kernel's math (the
    digit-major field arithmetic and the full 67-round schedule, the same
    code object the TPU runs) on numpy, whose uint32 wrap-around semantics
    match XLA's exactly. The Mosaic lowering itself is exercised on real TPU
    by bench.py and the driver's entry() compile check.
    """
    x = np.asanyarray(x)  # asANYarray: keep ndarray subclasses (roofline counting)
    if x.shape[:2] != (WIDTH, N_DIGITS) or x.dtype != np.uint32:
        raise ValueError(
            f"expected ({WIDTH}, {N_DIGITS}, B) uint32, got {x.shape} {x.dtype}"
        )
    out = _HostRef()
    token = _EMULATE.set(True)
    try:
        if schedule == "opt":
            consts = _const_arrays_opt()
            _perm_kernel_opt(
                *[_HostRef(a) for a in consts], _HostRef(x), out,
                convert=convert,
            )
        elif schedule == "mxu":
            consts = _const_arrays_mxu(as_bf16=False)
            _perm_kernel_mxu(
                *[_HostRef(a) for a in consts], _HostRef(x), out,
                convert=convert,
            )
        elif schedule == "mxu8":
            consts = _const_arrays_mxu8()
            _perm_kernel_mxu8(
                *[_HostRef(a) for a in consts], _HostRef(x), out,
                convert=convert,
            )
        elif schedule in ("hyb", "hyb13"):
            consts = _const_arrays_hyb()
            y = _HostRef(
                np.empty((_hyb_scratch_rows(), x.shape[2]), np.int8)
            )
            _perm_kernel_hyb(
                *[_HostRef(a) for a in consts], _HostRef(x), out, y,
                convert=convert, sbox13=schedule.endswith("13"),
            )
        elif schedule in ("hybp", "hybp13"):
            consts = _const_arrays_hybp()
            y = _HostRef(
                np.empty((_hyb_scratch_rows(), x.shape[2]), np.int8)
            )
            _perm_kernel_hybp(
                *[_HostRef(a) for a in consts], _HostRef(x), out, y,
                convert=convert, sbox13=schedule.endswith("13"),
            )
        elif schedule == "naive":
            ark, mds, fc = _const_arrays()
            _perm_kernel(
                _HostRef(ark), _HostRef(mds), _HostRef(fc), _HostRef(x), out,
                convert=convert,
            )
        else:
            raise ValueError(f"unknown schedule: {schedule}")
    finally:
        _EMULATE.reset(token)
    return np.stack([out[w] for w in range(WIDTH)])


@functools.cache
def _const_arrays():
    # numpy (not jnp) so the cache never captures tracers when first
    # populated inside a jit trace
    c = perm_constants_np()
    fc = np.stack([c["p"], c["p_prime"], c["r2"], c["one"]])
    return c["ark_mont"], c["mds_mont"], fc


@functools.cache
def _const_arrays_opt():
    from ..params import opt_schedule_np

    c = perm_constants_np()
    o = opt_schedule_np()
    fc = np.stack([c["p"], c["p_prime"], c["r2"], c["one"]])
    return (o["ark_fr"], c["mds_mont"], fc, o["u"], o["w"], o["m"], o["d"],
            o["c0"], o["final"])


@functools.cache
def _const_arrays_mxu8():
    """int8 offset-encoded weights + int32 row sums (see _dot_u32_i8)."""
    from ..params import mxu_weights_np

    c = perm_constants_np()
    w = mxu_weights_np()
    fc = np.stack([c["p"], c["p_prime"], c["r2"], c["one"]])
    s8, rs = [], []
    for key in ("w_lin", "w_pp", "w_p"):
        ws = (w[key].astype(np.int32) - 128).astype(np.int8)
        s8.append(ws)
        rs.append(ws.astype(np.int32).sum(axis=1, keepdims=True))
    return (c["ark_mont"], fc, *s8, *rs)


@functools.cache
def _const_arrays_hyb():
    """mxu8 int8 weights (full rounds + REDC Toeplitz) + the full-expansion
    partial-chain weights (see params.hyb_weights_np)."""
    from ..params import hyb_weights_np, mxu_weights_np

    c = perm_constants_np()
    w = mxu_weights_np()
    h = hyb_weights_np()
    fc = np.stack([c["p"], c["p_prime"], c["r2"], c["one"]])
    s8, rs = [], []
    for key in ("w_lin", "w_pp", "w_p"):
        ws = (w[key].astype(np.int32) - 128).astype(np.int8)
        s8.append(ws)
        rs.append(ws.astype(np.int32).sum(axis=1, keepdims=True))
    return (c["ark_mont"], fc, *s8, *rs,
            h["w_seg1"], h["rs_seg1"], h["w_seg2"], h["rs_seg2"],
            h["w_out"], h["rs_out"], h["pmul17"], h["one_mont"][None])


def _hyb_scratch_rows() -> int:
    from ..params import HYB_N_BASIS

    return 32 * HYB_N_BASIS


@functools.cache
def _const_arrays_hybp():
    """Pipelined-hyb weights (see params.hybp_weights_np)."""
    from ..params import hybp_weights_np, mxu_weights_np

    c = perm_constants_np()
    w = mxu_weights_np()
    h = hybp_weights_np()
    fc = np.stack([c["p"], c["p_prime"], c["r2"], c["one"]])
    s8, rs = [], []
    for key in ("w_lin", "w_pp", "w_p"):
        ws = (w[key].astype(np.int32) - 128).astype(np.int8)
        s8.append(ws)
        rs.append(ws.astype(np.int32).sum(axis=1, keepdims=True))
    return (c["ark_mont"], fc, *s8, *rs,
            h["wo_seg1"], h["rso_seg1"], h["wo_seg2"], h["rso_seg2"],
            h["w_new"], h["rs_new"],
            h["w_out"], h["rs_out"], h["pmul17"], h["one_mont"][None])


@functools.cache
def _const_arrays_mxu(as_bf16: bool):
    from ..params import mxu_weights_np

    c = perm_constants_np()
    w = mxu_weights_np()
    fc = np.stack([c["p"], c["p_prime"], c["r2"], c["one"]])
    weights = [w["w_lin"], w["w_pp"], w["w_p"]]
    if as_bf16:
        # numpy-side cast (ml_dtypes ships with jax): the cache must never
        # hold jax arrays — first population can happen inside a jit trace
        import ml_dtypes

        weights = [a.astype(ml_dtypes.bfloat16) for a in weights]
    return (c["ark_mont"], fc, *weights)


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "convert", "schedule")
)
def permute_planar(
    x, *, block: int | None = None, interpret: bool = False,
    convert: bool = True, schedule: str = DEFAULT_SCHEDULE,
):
    """Fused-kernel permutation on planar state.

    x: (WIDTH, N_DIGITS, B) uint32, B a multiple of `block` (the per-tile
    batch width; multiples of 128 lanes; None = the schedule's measured
    default). Returns the same shape/layout.
    convert=True: x is canonical digits. convert=False: x is already in the
    Montgomery domain and stays there (for perm-chaining pipelines).
    schedule — bit-identical outputs, tested against each other and the
    oracle; by descending measured v5e throughput:
      "hybp"  full-expansion partial rounds, software-pipelined so the big
              basis matmul overlaps the S-box chain (~1.47M perms/s) — the
              default,
      "hyb"   full-expansion partial rounds (~1.40M perms/s),
      "hybp13"/"hyb13"  the same schedules with the S-box schoolbook in
              base-2^13 digits — the documented negative-result experiment
              (op-count-neutral but measured 26% slower on v5e; PERF.md
              r3), kept bit-exact and hardware-KAT-verified,
      "mxu8"  dense rounds, constant products as offset-encoded int8
              matmuls (~1.0M perms/s),
      "mxu"   same structure with bf16 matmuls,
      "opt"   VPU-only sparse partial rounds + lazy reduction,
      "naive" direct transcription of the reference round loop (the
              in-kernel oracle).
    """
    if block is None:
        block = default_block(schedule)
    if x.shape[:2] != (WIDTH, N_DIGITS) or x.dtype != jnp.uint32:
        raise ValueError(
            f"expected ({WIDTH}, {N_DIGITS}, B) uint32, got {x.shape} {x.dtype}"
        )
    if not interpret and jax.default_backend() != "tpu":
        raise RuntimeError(
            "the fused Pallas kernel requires a TPU backend (current: "
            f"{jax.default_backend()}); for CPU testing pass emulate=True to "
            "permute_pallas/permute_pallas_mont, or use the pure-JAX oracle "
            "(ops.perm_ref.permute)"
        )
    b = x.shape[2]
    if b % block != 0:
        raise ValueError(f"batch {b} not a multiple of block {block}")
    grid = (b // block,)

    def whole(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i: zeros, memory_space=pltpu.VMEM)

    tile = pl.BlockSpec((WIDTH, N_DIGITS, block), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    scratch_shapes = []
    compiler_params = None
    if schedule == "opt":
        consts = _const_arrays_opt()
        kernel = functools.partial(_perm_kernel_opt, convert=convert)
    elif schedule == "mxu":
        consts = _const_arrays_mxu(as_bf16=True)
        kernel = functools.partial(_perm_kernel_mxu, convert=convert)
    elif schedule == "mxu8":
        consts = _const_arrays_mxu8()
        kernel = functools.partial(_perm_kernel_mxu8, convert=convert)
    elif schedule in ("hyb", "hybp", "hyb13", "hybp13"):
        sbox13 = schedule.endswith("13")
        if schedule.startswith("hybp"):
            consts = _const_arrays_hybp()
            kernel = functools.partial(_perm_kernel_hybp, convert=convert,
                                       sbox13=sbox13)
        else:
            consts = _const_arrays_hyb()
            kernel = functools.partial(_perm_kernel_hyb, convert=convert,
                                       sbox13=sbox13)
        scratch_shapes = [
            pltpu.VMEM((_hyb_scratch_rows(), block), jnp.int8)
        ]
        # ~8MB of resident basis-chain weights push past the default 16MB
        # scoped-VMEM accounting; v5e has 128MB of physical VMEM
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    elif schedule == "naive":
        consts = _const_arrays()
        kernel = functools.partial(_perm_kernel, convert=convert)
    else:
        raise ValueError(f"unknown schedule: {schedule}")
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
        grid=grid,
        in_specs=[whole(c.shape) for c in consts] + [tile],
        out_specs=tile,
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*consts, x)


def permute_pallas(x, *, block: int | None = None, interpret: bool = False,
                   emulate: bool = False, schedule: str = DEFAULT_SCHEDULE):
    """Fused-kernel permutation on batch-major canonical state.

    Drop-in fast path for ops/perm_ref.permute: x is (B, WIDTH, N_DIGITS)
    uint32 canonical digits (B >= 1, any size; padded to the tile width
    internally). Bit-exact with the oracle. emulate=True runs the kernel
    body eagerly on numpy (CPU testing; see permute_planar_emulated).
    """
    return _batch_major(x, block=block, interpret=interpret, convert=True,
                        emulate=emulate, schedule=schedule)


def permute_pallas_mont(x, *, block: int | None = None,
                        interpret: bool = False, emulate: bool = False,
                        schedule: str = DEFAULT_SCHEDULE):
    """Like permute_pallas but on Montgomery-domain state (no conversions);
    the building block for sponge/Merkle pipelines that chain permutations."""
    return _batch_major(x, block=block, interpret=interpret, convert=False,
                        emulate=emulate, schedule=schedule)


def _batch_major(x, *, block, interpret, convert, emulate=False,
                 schedule=DEFAULT_SCHEDULE):
    if block is None:
        block = default_block(schedule)
    x = jnp.asarray(x)
    if x.ndim != 3 or x.shape[1:] != (WIDTH, N_DIGITS):
        raise ValueError(f"expected (B, {WIDTH}, {N_DIGITS}), got {x.shape}")
    b = x.shape[0]
    blk = min(block, 128) if b < block else block
    pad = (-b) % blk
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    planar = jnp.transpose(xp, (1, 2, 0))
    if emulate:
        out = permute_planar_emulated(planar, convert=convert,
                                      schedule=schedule)
    else:
        out = permute_planar(planar, block=blk, interpret=interpret,
                             convert=convert, schedule=schedule)
    return jnp.transpose(out, (2, 0, 1))[:b]
