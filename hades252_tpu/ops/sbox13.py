"""Base-2^13 digit representation for the S-box schoolbook — the
round-2 roofline's one identified untried lever (PERF.md "future work",
VERDICT.md r2 next-step #3).

The hypothesis: with 13-bit digits, raw 26-bit products accumulate
directly in uint32 lanes (column sums stay < 2^31) with NO lo/hi split —
removing the `& MASK` / `>> 16` pair plus one of the two slice-adds per
partial product that dominate `_sqr_cols`/`_mul_cols` in the 16-bit path
(ops/perm_pallas.py:119-167).

The catch this module makes measurable: the surrounding kernel is
structurally 16-bit — the Montgomery REDC's byte-aligned Toeplitz MXU
matmuls and the carry ladders all consume 16-bit column buffers — so a
13-bit S-box product needs THREE boundary conversions per S-box
(x, x^2, x^4 each re-enter from a 16-bit REDC output) plus a
columns-13 -> columns-16 repack of every product result. Both directions
are carry-free bit-windowing (shifts/masks only; bounds proven in the
docstrings below), but they are pure overhead the 16-bit path doesn't pay.

Everything here is exact uint32 arithmetic on digit-major (digits, B)
arrays, verified bit-exactly against integer multiplication
(tests/test_sbox13.py); `op_count_report()` measures the KERNEL-idiom
implementation (ops/perm_pallas.py `_to13`/`_sqr13_cols`/`_mul13_cols`/
`_cols13_to16`, wired into the "hyb13"/"hybp13" schedule variants) with
the same instrumentation as the roofline model, so the verdict rests on
exact lane-op numbers.

Measured verdict (PERF.md round-3 row): ESSENTIALLY NEUTRAL — ~3100 vs
3120 lane-ops per S-box (0.6%), ~745.3k vs 747.3k per permutation
(0.3%). The per-product saving is real (no lo/hi split: 2 ops/product vs
5), but base-13 needs 20 digits instead of 16, so the product count grows
400 vs 256 (mul) / 210 vs 136 (square), and squares end up slightly WORSE
once the three boundary conversions are paid (970 vs 920). On the real
chip the gap widens decisively: hybp13 measured 1.22M perms/s vs hybp's
1.65M (26% slower at equal op counts — the 20/39-row base-13 buffers pack
worse onto (8,128) vector registers and the repack's shift ladder deepens
the serial chains). The hyb13/hybp13 variants are kept bit-exact and
hardware-KAT-verified as documentation; the production default stays
16-bit. A future full base-2^13 pipeline would need a re-derived 13-bit
MXU REDC interop to avoid the repack — only then could the split savings
show up net (and the 25% longer carry chains would still work against
it). Full numbers: PERF.md round-3 experiment section.
"""

from __future__ import annotations

import numpy as np

D16 = 16           # 16-bit digits per 256-bit value
D13 = 20           # ceil(256/13) = 20 thirteen-bit digits
MASK13 = np.uint32((1 << 13) - 1)
MASK16 = np.uint32((1 << 16) - 1)


def to_base13(a16: np.ndarray) -> np.ndarray:
    """(16, B) normalized 16-bit digits -> (20, B) 13-bit digits.

    Carry-free: normalized digits are the value's exact bit string, so
    13-bit digit k is bits [13k, 13k+13) — at most two source digits,
    combined with one shift each (left operand < 2^16 shifted <= 16 bits
    stays < 2^32)."""
    rows = []
    for k in range(D13):
        s = 13 * k
        j, r = divmod(s, 16)
        lo = a16[j] >> np.uint32(r)
        if r + 13 > 16 and j + 1 < D16:
            lo = lo | (a16[j + 1] << np.uint32(16 - r))
        rows.append(lo & MASK13)
    return np.stack(rows)


def mul13_cols(a13: np.ndarray, b13: np.ndarray) -> np.ndarray:
    """Un-carried schoolbook columns of a*b in base 2^13: (39, B) uint32.

    Each product < 2^26 accumulates DIRECTLY (the whole point — no lo/hi
    split); a column receives <= 20 products, so sums < 20*2^26 < 2^31."""
    out_shape = (2 * D13 - 1,) + np.broadcast_shapes(a13.shape[1:],
                                                     b13.shape[1:])
    acc = np.zeros(out_shape, np.uint32)
    for i in range(D13):
        prod = a13[i : i + 1] * b13          # (20, B), exact in uint32
        acc[i : i + D13] += prod
    assert int(acc.max()) < (1 << 31), "base-13 column overflow"
    return acc


def sqr13_cols(a13: np.ndarray) -> np.ndarray:
    """Un-carried columns of a*a, symmetric schoolbook: diagonal once,
    off-diagonal products doubled (2*2^26 = 2^27; <= 10 doubled terms +
    one diagonal per column keeps sums < 2^31). 210 digit products
    instead of 400."""
    acc = np.zeros((2 * D13 - 1,) + a13.shape[1:], np.uint32)
    for i in range(D13):
        diag = a13[i : i + 1] * a13[i : i + 1]
        acc[2 * i : 2 * i + 1] += diag
        if i + 1 < D13:
            prod = a13[i : i + 1] * a13[i + 1 :]
            acc[2 * i + 1 : i + D13] += prod + prod
    assert int(acc.max()) < (1 << 31), "base-13 square column overflow"
    return acc


def cols13_to_cols16(cols13: np.ndarray, n_out: int = 32) -> np.ndarray:
    """Repack base-2^13 column sums into the base-2^16 column buffer the
    16-bit REDC machinery consumes (value-preserving, carry-free).

    Each cols13[k] < 2^31 sits at bit offset 13k and is windowed into at
    most three 16-bit columns: the low window masks BEFORE shifting left
    (so nothing overflows uint32), the upper windows shift right. At most
    4 of the 13-bit columns overlap one 16-bit window and each
    contribution is < 2^16, so output column sums stay < 2^18 — far
    inside the < 2^24 lazy-reduction bound the REDC path requires
    (perm_pallas._mul_cols docstring)."""
    acc = np.zeros((n_out,) + cols13.shape[1:], np.uint32)
    for k in range(cols13.shape[0]):
        v = cols13[k : k + 1]
        s = 13 * k
        j, r = divmod(s, 16)
        if r == 0:
            if j < n_out:
                acc[j : j + 1] += v & MASK16
            if j + 1 < n_out:
                acc[j + 1 : j + 2] += v >> np.uint32(16)
        else:
            if j < n_out:
                low_bits = np.uint32((1 << (16 - r)) - 1)
                acc[j : j + 1] += (v & low_bits) << np.uint32(r)
            if j + 1 < n_out:
                acc[j + 1 : j + 2] += (v >> np.uint32(16 - r)) & MASK16
            if j + 2 < n_out and r > 1:
                acc[j + 2 : j + 3] += v >> np.uint32(32 - r)
    assert int(acc.max()) < (1 << 18), "base-16 repack overflow"
    return acc


def mul13(a16: np.ndarray, b16: np.ndarray) -> np.ndarray:
    """End-to-end: 16-bit operands -> 32 un-carried 16-bit product columns
    via the base-13 schoolbook (the drop-in for _mul_cols(a, b, 32))."""
    return cols13_to_cols16(mul13_cols(to_base13(a16), to_base13(b16)))


def sqr13(a16: np.ndarray) -> np.ndarray:
    """End-to-end square (the drop-in for _sqr_cols)."""
    return cols13_to_cols16(sqr13_cols(to_base13(a16)))


# ---------------------------------------------------------------------------
# The measurement that settles the hypothesis
# ---------------------------------------------------------------------------


def op_count_report(lanes: int = 128) -> dict:
    """Exact VPU lane-op counts (utils/roofline.py counting instrumentation)
    for one S-box worth of raw-product work — 2 squares + 1 multiply — in
    the 16-bit production path vs the KERNEL-idiom base-2^13 path
    (ops/perm_pallas.py, exactly what the hyb13/hybp13 schedules execute)
    including its mandatory boundary conversions. MXU MACs are zero in
    both (these are the VPU-side variable*variable products), so lane-ops
    decide. Both paths are measured through the same _slice_add/concat
    kernel idiom — measuring this module's in-place numpy twins instead
    under-counts the base-13 side (the round-3 lesson: a 26% "win" that
    was a counting artifact of mixed accumulator array types)."""
    from ..utils import roofline
    from . import perm_pallas as pp

    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 16, (D16, lanes), dtype=np.uint32)
    b = rng.integers(0, 1 << 16, (D16, lanes), dtype=np.uint32)

    def counted(fn):
        roofline._COUNTER = roofline._Counter()
        try:
            fn()
        finally:
            counter = roofline._COUNTER
            roofline._COUNTER = None
        return counter.vpu / lanes

    wrap = roofline._CountingArray
    aw, bw = a.view(wrap), b.view(wrap)

    token = pp._EMULATE.set(True)
    try:
        ops16 = counted(
            lambda: (pp._sqr_cols(aw), pp._sqr_cols(bw),
                     pp._mul_cols(aw, bw, 2 * D16))
        )
        # kernel base-13 S-box: x converted once and reused by the final
        # multiply; x2 re-enters from the REDC in 16-bit and converts
        ops13 = counted(
            lambda: (
                lambda w13: (
                    pp._cols13_to16(pp._sqr13_cols(w13)),          # x^2
                    pp._cols13_to16(pp._sqr13_cols(pp._to13(bw))), # x^4
                    pp._cols13_to16(
                        pp._mul13_cols(pp._to13(aw), w13)          # x^5
                    ),
                )
            )(pp._to13(aw))
        )
    finally:
        pp._EMULATE.reset(token)
    return {
        "vpu_ops_per_sbox_16bit": ops16,
        "vpu_ops_per_sbox_base13": ops13,
        "base13_over_16bit": ops13 / ops16,
        "products_16bit": 136 * 2 + 256,
        "products_base13": 210 * 2 + 400,
    }
