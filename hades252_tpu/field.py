"""L0 field layer: BLS12-381 scalar-field arithmetic as JAX-traceable ops.

TPU-native replacement for the reference's external `dusk-bls12_381`
dependency (reference: Cargo.toml:12; ops used enumerated in SURVEY.md §1).
The reference uses 4x u64 Montgomery limbs on the CPU; that representation
does not map to the TPU VPU (no 64-bit lanes, no widening multiply), so this
layer is designed from scratch for 32-bit vector lanes:

  * A field element is 16 little-endian digits of 16 bits, each held in a
    uint32 lane (`params.N_DIGITS` x `params.DIGIT_BITS`). The digit axis is
    always the LAST axis; any leading axes are batch and broadcast freely,
    so the same code path serves scalars, vmapped batches, and Pallas tiles.
  * Multiplication is exact schoolbook in uint32 (16x16-bit products fit in
    32 bits; split lo/hi column sums stay < 2^22), followed by a full-word
    Montgomery REDC (m = T_lo * p' mod R; t = (T + m*p) / R) — chosen over
    digit-serial CIOS because every step is a vector op over the digit axis
    with only two sequential carry chains, which the VPU pipelines across
    the batch lanes.
  * All values between ops are normalized (< p) canonical digit vectors; the
    Montgomery domain is an internal convention of the callers (see
    ops/perm_ref.py) — this module just provides exact mod-p primitives.

Every function is pure and shape-polymorphic: inputs `(..., N_DIGITS)`
uint32, outputs likewise. Dtype is asserted to guard against JAX's default
weak-type promotion ever touching the data path (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .params import DIGIT_BITS, DIGIT_MASK, N_DIGITS, perm_constants_np

# numpy scalar, not jnp: creating a jax array at import time would
# initialize the XLA backend and break jax.distributed.initialize for
# multi-host users who import this package first
_MASK = np.uint32(DIGIT_MASK)
_SHIFT = DIGIT_BITS


def _check(*arrays) -> None:
    for a in arrays:
        if a.dtype != jnp.uint32:
            raise TypeError(f"field op requires uint32 digits, got {a.dtype}")
        if a.shape[-1] not in (N_DIGITS, 2 * N_DIGITS):
            raise ValueError(f"unexpected digit-axis length {a.shape[-1]}")


def _scan_digits(step, init, acc: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run a carry/borrow chain along the last (digit) axis via lax.scan."""
    acc_t = jnp.moveaxis(acc, -1, 0)
    carry, out_t = jax.lax.scan(step, init, acc_t)
    return carry, jnp.moveaxis(out_t, 0, -1)


def carry_normalize(acc: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Propagate carries: column sums (any uint32 values) -> digits < 2^16.

    Returns (final_carry, digits). The represented value is preserved:
    sum(acc[d] * 2^(16 d)) == carry * 2^(16 n) + sum(digits[d] * 2^(16 d)).
    """

    def step(carry, col):
        t = col + carry
        return t >> _SHIFT, t & _MASK

    zero = jnp.zeros(acc.shape[:-1], jnp.uint32)
    return _scan_digits(step, zero, acc)


def add_digits(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Digit-wise a + b with carry chain. Returns (carry_out, digits)."""
    _check(a, b)
    return carry_normalize(a + b)


def sub_digits(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Digit-wise a - b with borrow chain. Returns (borrow_out, digits).

    borrow_out is 1 where b > a (result then equals a - b + 2^(16 n)).
    """
    _check(a, b)

    def step(borrow, cols):
        ai, bi = cols
        t = ai - bi - borrow  # wraps mod 2^32; negative iff top bit set
        return t >> jnp.uint32(31), t & _MASK

    zero = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), jnp.uint32)
    a, b = jnp.broadcast_arrays(a, b)
    a_t = jnp.moveaxis(a, -1, 0)
    b_t = jnp.moveaxis(b, -1, 0)
    borrow, out_t = jax.lax.scan(step, zero, (a_t, b_t))
    return borrow, jnp.moveaxis(out_t, 0, -1)


def _p_digits() -> jnp.ndarray:
    return jnp.asarray(perm_constants_np()["p"])


@jax.jit
def cond_sub_p(a: jnp.ndarray) -> jnp.ndarray:
    """Reduce a in [0, 2p) to [0, p): subtract p when a >= p."""
    borrow, diff = sub_digits(a, _p_digits())
    return jnp.where((borrow == 0)[..., None], diff, a)


@jax.jit
def add_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod p for normalized inputs (< p).

    a + b < 2p < 2^256, so the carry out is always zero and a single
    conditional subtract normalizes (reference op: BlsScalar `+=`,
    src/strategies/scalar.rs:28).
    """
    _, s = add_digits(a, b)
    return cond_sub_p(s)


@jax.jit
def sub_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod p for normalized inputs (< p)."""
    borrow, diff = sub_digits(a, b)
    _, fixed = add_digits(diff, _p_digits())
    return jnp.where((borrow == 1)[..., None], fixed, diff)


def _accumulate_columns(lo: jnp.ndarray, hi: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Sum split partial products into 2n columns.

    lo/hi: (..., n, n) uint32 with lo[i, j] + 2^16 hi[i, j] = a_i * b_j.
    Returns acc: (..., n_out) uint32 column sums (un-normalized, < 2^22).
    """
    n = lo.shape[-1]
    acc = jnp.zeros(lo.shape[:-2] + (n_out,), jnp.uint32)
    for i in range(n):
        w_lo = min(n, n_out - i)
        if w_lo > 0:
            acc = acc.at[..., i : i + w_lo].add(lo[..., i, :w_lo])
        w_hi = min(n, n_out - i - 1)
        if w_hi > 0:
            acc = acc.at[..., i + 1 : i + 1 + w_hi].add(hi[..., i, :w_hi])
    return acc


@jax.jit
def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact 256x256 -> 512-bit product as 32 normalized digits."""
    _check(a, b)
    prods = a[..., :, None] * b[..., None, :]  # exact in uint32
    lo = prods & _MASK
    hi = prods >> _SHIFT
    acc = _accumulate_columns(lo, hi, 2 * N_DIGITS)
    carry, digits = carry_normalize(acc)
    # product < 2^512 so the final carry is structurally zero
    return digits


@jax.jit
def mul_low(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod 2^256 as 16 normalized digits."""
    _check(a, b)
    prods = a[..., :, None] * b[..., None, :]
    lo = prods & _MASK
    hi = prods >> _SHIFT
    acc = _accumulate_columns(lo, hi, N_DIGITS)
    _, digits = carry_normalize(acc)
    return digits


@jax.jit
def mont_reduce(t_wide: jnp.ndarray) -> jnp.ndarray:
    """Full-word Montgomery REDC: t_wide (32 digits, value T < R*p) ->
    T * R^{-1} mod p as 16 normalized digits (< p)."""
    consts = perm_constants_np()
    p = jnp.asarray(consts["p"])
    p_prime = jnp.asarray(consts["p_prime"])
    t_lo = t_wide[..., :N_DIGITS]
    m = mul_low(t_lo, p_prime)
    mp = mul_wide(m, p)
    # T + m*p < 2 R p < 2^512: fits 32 digits, carry out is zero.
    _, s = add_digits(t_wide, mp)
    hi = s[..., N_DIGITS:]  # exact division by R: low half is zero
    return cond_sub_p(hi)


@jax.jit
def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a * b * R^{-1} mod p (normalized inputs)."""
    return mont_reduce(mul_wide(a, b))


def mont_sqr(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery square (same cost as mul for now; kept as an API seam for
    the symmetric-schoolbook optimization)."""
    return mont_mul(a, a)


@jax.jit
def to_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Canonical digits -> Montgomery domain (a * R mod p)."""
    r2 = jnp.asarray(perm_constants_np()["r2"])
    return mont_mul(a, r2)


@jax.jit
def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery domain -> canonical digits (a * R^{-1} mod p)."""
    one = jnp.asarray(perm_constants_np()["one"])
    return mont_mul(a, one)


@jax.jit
def quintic_sbox_mont(x: jnp.ndarray) -> jnp.ndarray:
    """x^5 in the Montgomery domain: (x^2)^2 * x, 3 Montgomery muls
    (reference: src/strategies/scalar.rs:32-34 `quintic_s_box`)."""
    x2 = mont_sqr(x)
    x4 = mont_sqr(x2)
    return mont_mul(x4, x)


@jax.jit
def invert(a: jnp.ndarray) -> jnp.ndarray:
    """a^{-1} mod p for canonical digits; invert(0) = 0.

    Completes the L0 surface of the replaced dependency (dusk-bls12_381's
    BlsScalar::invert, SURVEY.md §1) as a TRACED op: Fermat exponentiation
    a^(p-2) by square-and-multiply over the constant 255-bit exponent,
    rolled into one lax.scan (255 iterations x ~2 Montgomery muls) so the
    compiled body stays two muls deep. Unlike the reference (which returns
    CtOption::none for 0), 0 maps to 0 — the natural fixed point of x^(p-2);
    callers needing the distinction test for zero themselves."""
    from .params import P

    a_m = to_mont(a)
    e = P - 2
    bits = jnp.asarray(
        np.array([(e >> i) & 1 for i in reversed(range(e.bit_length()))],
                 np.uint32)
    )
    one_m = to_mont(jnp.broadcast_to(
        jnp.asarray(perm_constants_np()["one"]), a.shape
    ))

    def step(acc, bit):
        acc = mont_mul(acc, acc)
        return jnp.where(bit > 0, mont_mul(acc, a_m), acc), None

    res, _ = jax.lax.scan(step, one_m, bits)
    return from_mont(res)


# ---------------------------------------------------------------------------
# Host-side conveniences (numpy, non-traced) for tests and I/O
# ---------------------------------------------------------------------------


def np_random_elements(shape, rng: np.random.Generator) -> np.ndarray:
    """Uniform canonical field elements as (..., N_DIGITS) uint32 (host)."""
    from .params import P, int_to_digits

    flat = int(np.prod(shape)) if shape else 1
    vals = [rng.integers(0, 1 << 63, 5).tolist() for _ in range(flat)]
    out = np.stack(
        [
            int_to_digits(
                (v[0] | v[1] << 63 | v[2] << 126 | v[3] << 189 | v[4] << 252) % P
            )
            for v in vals
        ]
    )
    return out.reshape(tuple(shape) + (N_DIGITS,))
