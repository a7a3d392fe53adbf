"""Authenticated stream cipher over the Hades252 permutation (duplex mode).

The reference crate is the bare permutation; its downstream ecosystem pairs
it with a permutation-based cipher (dusk-poseidon's PoseidonCipher). This
module provides that capability TPU-first, as OUR documented spec (a
standard duplex-sponge construction, not a transcription):

    state0 = [ TAG_ENC + L*2^32 , k0 , k1 , nonce , 1 ]      (canonical)
    state  = perm(state0)
    for each rate-4 chunk m of the (zero-padded) message:
        c_i       = m_i + state[1+i]     (mod p, i = 0..3)
        state[1+i] = c_i                 (duplex: ciphertext re-enters)
        state     = perm(state)
    tag = state[1]

The capacity word 0 binds the domain AND the padded message length L (a
truncated or extended ciphertext can never verify); word 4 is the constant
1 so the all-zero key/nonce state is not a fixed point of the keystream
schedule. Decryption runs the same schedule with m_i = c_i - state[1+i]
(the duplex feedback uses the CIPHERTEXT, so both directions see identical
states) and recomputes the tag.

TPU design: batched over B independent (key, nonce, message) rows; the
chunk loop is a lax.scan with the state resident between fused-kernel
permutation calls (Montgomery domain throughout, like the sponge/Merkle
drivers). Security note: one (key, nonce) pair must encrypt at most one
message, as in every stream cipher.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import field
from ..params import N_DIGITS, WIDTH
from ..utils.encoding import ints_to_digits

RATE = WIDTH - 1
TAG_ENC = 6  # domain tag (Merkle trees use 4, the arity; sponge uses L)


def _tag_enc_mont(n_padded: int):
    return field.to_mont(
        jnp.asarray(ints_to_digits([TAG_ENC + (n_padded << 32)])[0])
    )


def _one_mont():
    return field.to_mont(jnp.asarray(ints_to_digits([1])[0]))


def _pad(msgs: jnp.ndarray) -> jnp.ndarray:
    l = msgs.shape[1]
    return jnp.pad(msgs, ((0, 0), (0, (-l) % RATE), (0, 0)))


def _init_state(key, nonce, n_padded, perm_mont_fn):
    b = key.shape[0]
    tag = jnp.broadcast_to(_tag_enc_mont(n_padded), (b, 1, N_DIGITS))
    one = jnp.broadcast_to(_one_mont(), (b, 1, N_DIGITS))
    km = field.to_mont(key)                      # (B, 2, D)
    nm = field.to_mont(nonce)[:, None]           # (B, 1, D)
    state = jnp.concatenate([tag, km, nm, one], axis=1)
    return perm_mont_fn(state)


def _duplex(state, chunk_mont, perm_mont_fn, decrypt: bool):
    """One duplex step. chunk_mont: (B, RATE, D) message (encrypt) or
    ciphertext (decrypt) in Montgomery form. Returns (state', out_mont)."""
    ks = state[:, 1 : 1 + RATE]
    if decrypt:
        out = field.sub_mod(chunk_mont, ks)      # plaintext
        fed = chunk_mont                         # duplex absorbs ciphertext
    else:
        out = field.add_mod(chunk_mont, ks)      # ciphertext
        fed = out
    state = jnp.concatenate([state[:, :1], fed, state[:, 1 + RATE :]], axis=1)
    return perm_mont_fn(state), out


def _run(key, nonce, data, perm_mont_fn, decrypt: bool):
    if perm_mont_fn is None:
        from ..ops import default_perm_mont_fn

        perm_mont_fn = default_perm_mont_fn()
    key = jnp.asarray(key)
    nonce = jnp.asarray(nonce)
    data = jnp.asarray(data)
    if key.ndim != 3 or key.shape[1:] != (2, N_DIGITS):
        raise ValueError(f"key must be (B, 2, {N_DIGITS}), got {key.shape}")
    if nonce.shape != (key.shape[0], N_DIGITS):
        raise ValueError(f"nonce must be (B, {N_DIGITS}), got {nonce.shape}")
    if data.ndim != 3 or data.shape[-1] != N_DIGITS:
        raise ValueError(f"data must be (B, L, {N_DIGITS}), got {data.shape}")
    if data.shape[1] % RATE != 0:
        raise ValueError("data length must be a multiple of the rate")
    padded = field.to_mont(data)
    n_padded = data.shape[1]
    state = _init_state(key, nonce, n_padded, perm_mont_fn)

    chunks = jnp.moveaxis(
        padded.reshape(padded.shape[0], -1, RATE, N_DIGITS), 1, 0
    )  # (n_chunks, B, RATE, D)

    def step(st, chunk):
        st, out = _duplex(st, chunk, perm_mont_fn, decrypt)
        return st, out

    state, outs = jax.lax.scan(step, state, chunks)
    out = jnp.moveaxis(outs, 0, 1).reshape(padded.shape[0], -1, N_DIGITS)
    tag = field.from_mont(state[:, 1])
    return field.from_mont(out), tag


def encrypt(key, nonce, msgs, perm_mont_fn=None):
    """Encrypt a batch: key (B, 2, D), nonce (B, D), msgs (B, L, D), all
    canonical digit arrays. Returns (ciphertext (B, L', D), tag (B, D))
    where L' = L rounded up to the rate (padding words encrypt zeros and
    must be transmitted — the tag binds the padded length)."""
    from ..utils import metrics

    key = jnp.asarray(key)
    data = _pad(jnp.asarray(msgs))
    # counters live outside any trace (metrics.py caveats)
    metrics.count("cipher.encrypts", int(key.shape[0]))
    metrics.count(
        "perms.executed",
        int(key.shape[0]) * (1 + data.shape[1] // RATE),
    )
    ct, tag = _run(key, nonce, data, perm_mont_fn, decrypt=False)
    return ct, tag


def decrypt(key, nonce, ciphertext, tag, perm_mont_fn=None):
    """Decrypt + authenticate a batch. Returns (msgs (B, L, D), ok (B,))
    — rows where ok is False carry an INVALID tag and their plaintext
    must be discarded (returned only so the batch shape is static)."""
    from ..utils import metrics

    ciphertext = jnp.asarray(ciphertext)
    if ciphertext.shape[1] % RATE != 0:
        raise ValueError("ciphertext length must be a multiple of the rate")
    # decrypt executes the same permutation schedule as encrypt — count it
    # symmetrically (counters live outside any trace, metrics.py caveats)
    metrics.count("cipher.decrypts", int(ciphertext.shape[0]))
    metrics.count(
        "perms.executed",
        int(ciphertext.shape[0]) * (1 + ciphertext.shape[1] // RATE),
    )
    msgs, tag2 = _run(key, nonce, ciphertext, perm_mont_fn, decrypt=True)
    ok = jnp.all(tag2 == jnp.asarray(tag), axis=-1)
    return msgs, ok
