"""Poseidon-style sponge over the Hades252 permutation, batched and streaming.

The reference deliberately carries no hashing mode (removed in 0.7.0 —
reference CHANGELOG.md:159-162: the permutation is the capability; sponge
lives downstream in dusk-poseidon). This module is the framework's sponge
driver per BASELINE.md config 3, designed TPU-first:

  * rate 4 / capacity 1 over the width-5 state;
  * fixed-length domain separation: the capacity word (word 0) is
    initialized to the message length L as a field element, so no bit
    padding is needed — messages are zero-padded to a multiple of the rate
    (our spec; documented here, tested against a Python int oracle);
  * absorption adds message words into state words 1..4 (modular add, which
    commutes with the Montgomery domain), then permutes;
  * the digest is state word 1 after the final permutation;
  * streams are the batch axis: absorption is sequential per stream
    (an inherent dependency chain — SURVEY.md §5 long-context note), so
    throughput scales with the number of independent streams; chunks
    iterate under lax.scan with the state resident on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import field
from ..params import N_DIGITS, WIDTH
from ..utils import metrics
from ..utils.encoding import ints_to_digits

RATE = WIDTH - 1  # 4
CAPACITY_INDEX = 0
DIGEST_INDEX = 1


def _iv_digits(length: int):
    """Capacity initialization: the message length as a field element."""
    return ints_to_digits([length])[0]  # (N_DIGITS,)


def sponge_hash(msgs: jnp.ndarray, perm_mont_fn=None, *, scan: bool = True
                ) -> jnp.ndarray:
    """Hash B fixed-length messages of L field elements each.

    msgs: (B, L, N_DIGITS) uint32 canonical digits.
    Returns (B, N_DIGITS) canonical digest digits.

    perm_mont_fn: batched Montgomery-domain permutation
    (B, WIDTH, N_DIGITS) -> same; defaults to the fused TPU kernel on TPU,
    the pure-JAX oracle elsewhere (ops.default_perm_mont_fn).
    scan=False absorbs with a plain Python loop instead of lax.scan — for
    permutation backends that can't run under a trace (the numpy-emulated
    kernel used by CPU tests).
    """
    if perm_mont_fn is None:
        from ..ops import default_perm_mont_fn

        perm_mont_fn = default_perm_mont_fn()
    if msgs.ndim != 3 or msgs.shape[-1] != N_DIGITS:
        raise ValueError(f"expected (B, L, {N_DIGITS}), got {msgs.shape}")
    b, length, _ = msgs.shape
    if length == 0:
        raise ValueError("empty message")

    pad = (-length) % RATE
    msgs = jnp.pad(msgs, ((0, 0), (0, pad), (0, 0)))
    n_chunks = (length + pad) // RATE
    msgs_mont = field.to_mont(msgs)
    # (n_chunks, B, RATE, D) scan-major
    chunks = jnp.transpose(
        msgs_mont.reshape(b, n_chunks, RATE, N_DIGITS), (1, 0, 2, 3)
    )

    iv = field.to_mont(jnp.asarray(_iv_digits(length)))
    state = jnp.zeros((b, WIDTH, N_DIGITS), jnp.uint32)
    state = state.at[:, CAPACITY_INDEX, :].set(
        jnp.broadcast_to(iv, (b, N_DIGITS))
    )

    def absorb(state, chunk):
        fed = field.add_mod(state[:, 1:, :], chunk)
        state = jnp.concatenate([state[:, :1, :], fed], axis=1)
        return perm_mont_fn(state), None

    if scan:
        state, _ = jax.lax.scan(absorb, state, chunks)
    else:
        for c in range(n_chunks):
            state, _ = absorb(state, chunks[c])
        state = jnp.asarray(state)
    metrics.count("sponge.messages", b)
    metrics.count("sponge.elements_absorbed", b * length)
    metrics.count("perms.executed", b * n_chunks)
    return field.from_mont(state[:, DIGEST_INDEX, :])


class SpongeState:
    """Incremental rate-4 sponge over batched streams (SURVEY.md §5:
    long-context scaling = chunked absorption with device-resident state;
    parallelism across independent streams, the batch axis).

    Equivalent to sponge_hash for the same total input: the capacity word
    is initialized to the declared total length, chunks absorb into words
    1..4, and the first squeezed word equals sponge_hash's digest. Squeeze
    is extendable: each permutation yields RATE output words (our spec,
    documented here and oracle-tested).

    absorb() accepts any word count; partial chunks are buffered host-side
    and absorbed once full (or zero-padded at the first squeeze).
    """

    def __init__(self, n_streams: int, total_length: int, perm_mont_fn=None):
        if total_length <= 0:
            raise ValueError("total_length must be positive")
        if perm_mont_fn is None:
            from ..ops import default_perm_mont_fn

            perm_mont_fn = default_perm_mont_fn()
        self._perm = perm_mont_fn
        self._b = n_streams
        self._total = total_length
        self._absorbed = 0
        self._pending: list[jnp.ndarray] = []  # buffered (B, k, D) mont words
        self._pending_n = 0
        self._squeezed: int | None = None
        iv = field.to_mont(jnp.asarray(_iv_digits(total_length)))
        state = jnp.zeros((n_streams, WIDTH, N_DIGITS), jnp.uint32)
        self._state = state.at[:, CAPACITY_INDEX, :].set(
            jnp.broadcast_to(iv, (n_streams, N_DIGITS))
        )

    def absorb(self, words: jnp.ndarray) -> "SpongeState":
        """Feed (B, k, N_DIGITS) canonical digit words, any k >= 1."""
        if self._squeezed is not None:
            raise RuntimeError("cannot absorb after squeezing")
        words = jnp.asarray(words)
        if words.ndim != 3 or words.shape[0] != self._b or \
                words.shape[-1] != N_DIGITS:
            raise ValueError(
                f"expected ({self._b}, k, {N_DIGITS}), got {words.shape}"
            )
        k = words.shape[1]
        if self._absorbed + k > self._total:
            raise ValueError("absorbing past the declared total length")
        self._absorbed += k
        self._pending.append(field.to_mont(words))
        self._pending_n += k
        if self._pending_n >= RATE:
            # one concatenate; mix all full chunks, keep the remainder
            buf = jnp.concatenate(self._pending, axis=1)
            n_full = self._pending_n // RATE
            for c in range(n_full):
                self._mix(buf[:, c * RATE : (c + 1) * RATE, :])
            rest = buf[:, n_full * RATE :, :]
            self._pending = [rest] if rest.shape[1] else []
            self._pending_n = rest.shape[1]
        return self

    def _mix(self, chunk_mont: jnp.ndarray) -> None:
        fed = field.add_mod(self._state[:, 1:, :], chunk_mont)
        self._state = self._perm(
            jnp.concatenate([self._state[:, :1, :], fed], axis=1)
        )
        metrics.count("perms.executed", self._b)

    def _finalize(self) -> None:
        if self._absorbed != self._total:
            raise RuntimeError(
                f"absorbed {self._absorbed} of declared {self._total} words"
            )
        if self._pending_n:
            buf = jnp.concatenate(self._pending, axis=1)
            pad = jnp.zeros(
                (self._b, RATE - self._pending_n, N_DIGITS), jnp.uint32
            )
            self._mix(jnp.concatenate([buf, pad], axis=1))
            self._pending = []
            self._pending_n = 0
        self._squeezed = 0
        # the fixed-length digest is squeeze word 0 of this state; cache it
        # so digest() stays idempotent regardless of later squeezes
        self._digest = field.from_mont(self._state[:, DIGEST_INDEX, :])

    def squeeze(self, n_words: int = 1) -> jnp.ndarray:
        """Extract (B, n_words, N_DIGITS) canonical output words; the first
        equals sponge_hash's digest. Permutes every RATE words."""
        if self._squeezed is None:
            self._finalize()
        out = []
        for _ in range(n_words):
            if self._squeezed == RATE:
                self._state = self._perm(self._state)
                metrics.count("perms.executed", self._b)
                self._squeezed = 0
            out.append(self._state[:, DIGEST_INDEX + self._squeezed, :])
            self._squeezed += 1
        return field.from_mont(jnp.stack(out, axis=1))

    def digest(self) -> jnp.ndarray:
        """(B, N_DIGITS) canonical digest — sponge_hash equivalence.
        Idempotent: does not consume squeeze output."""
        if self._squeezed is None:
            self._finalize()
        return self._digest


def sponge_hash_ints(words, perm_mont_fn=None) -> int:
    """Convenience: hash one message given as a list of canonical ints."""
    from ..utils.encoding import digits_to_ints

    digits = ints_to_digits([[int(w) for w in words]])
    out = sponge_hash(jnp.asarray(digits), perm_mont_fn)
    return int(digits_to_ints(out[0]))
