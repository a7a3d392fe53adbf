"""ctypes bindings for the native C++ host oracle (native/hades_cpu.cpp).

Builds the shared library on first use if the toolchain is available; all
callers degrade gracefully when it is not (the pure-Python oracle remains
authoritative for correctness, just slower).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from functools import cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")


class NativeUnavailable(RuntimeError):
    pass


def _cpu_key() -> str:
    """Short hash of this host's CPU feature flags. The library is built
    with -march=native and this VM migrates between hosts with different
    ISAs, so each feature set gets its own artifact (loading machine code
    compiled on a richer host would SIGILL, not degrade)."""
    try:
        flags = [
            line for line in open("/proc/cpuinfo") if line.startswith("flags")
        ][0]
    except (OSError, IndexError):
        flags = "unknown"
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


@cache
def _lib() -> ctypes.CDLL:
    if os.environ.get("HADES_NO_NATIVE"):
        raise NativeUnavailable("disabled via HADES_NO_NATIVE")
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "hades_cpu.cpp"))
    # artifact keyed by CPU features AND source hash: a library built
    # from different source gets a different filename, so a stale .so
    # (e.g. copied into a worktree snapshot with a fresh mtime) can
    # never be dlopened missing symbols — it simply doesn't match
    src_key = hashlib.sha1(open(src, "rb").read()).hexdigest()[:10]
    name = f"libhades_cpu_{_cpu_key()}_{src_key}.so"
    so = os.path.abspath(os.path.join(_NATIVE_DIR, name))
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), f"SO={name}",
                 "-B"],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise NativeUnavailable(f"cannot build native oracle: {e}") from e
    lib = ctypes.CDLL(so)
    lib.hades_init.restype = ctypes.c_int
    lib.hades_init.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_char_p,
        ctypes.c_long,
    ]
    lib.hades_perm_batch.restype = ctypes.c_int
    lib.hades_perm_batch.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.hades_bench.restype = ctypes.c_double
    lib.hades_bench.argtypes = [ctypes.c_long]
    lib.hades_sponge_hash.restype = ctypes.c_int
    lib.hades_sponge_hash.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_void_p,
    ]
    lib.hades_merkle_root.restype = ctypes.c_int
    lib.hades_merkle_root.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_void_p,
    ]
    lib.hades_cipher.restype = ctypes.c_int
    lib.hades_cipher.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.hades_init_opt.restype = ctypes.c_int
    lib.hades_init_opt.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.hades_perm_batch_opt.restype = ctypes.c_int
    lib.hades_perm_batch_opt.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.hades_bench_opt.restype = ctypes.c_double
    lib.hades_bench_opt.argtypes = [ctypes.c_long]
    lib.hades_has_ifma.restype = ctypes.c_int
    lib.hades_has_ifma.argtypes = []
    lib.hades_bench_opt8.restype = ctypes.c_double
    lib.hades_bench_opt8.argtypes = [ctypes.c_long]
    ark = open(os.path.join(_ASSET_DIR, "ark.bin"), "rb").read()
    mds = open(os.path.join(_ASSET_DIR, "mds.bin"), "rb").read()
    if lib.hades_init(ark, len(ark), mds, len(mds)) != 0:
        raise NativeUnavailable("hades_init failed")
    if lib.hades_init_opt(_opt_payload(), len(_opt_payload())) != 0:
        raise NativeUnavailable("hades_init_opt failed")
    return lib


@cache
def _opt_payload() -> bytes:
    """Sparse partial-round schedule for the optimized native engine
    (hades_cpu.cpp hades_init_opt layout), serialized from the exact
    int transform in params.optimized_partial_int (itself oracle-tested
    in tests/test_params.py)."""
    from ..params import optimized_partial_int

    opt = optimized_partial_int()
    flat = list(opt["c0"])
    for row in opt["u"]:
        flat += list(row)
    for row in opt["w"]:
        flat += list(row)
    flat.append(opt["m"])
    for row in opt["d"]:
        flat += list(row)
    for row in opt["final"]:
        flat += list(row)
    return b"".join(int(v).to_bytes(32, "little") for v in flat)


def available() -> bool:
    try:
        _lib()
        return True
    except NativeUnavailable:
        return False


def perm_batch_bytes(states: bytes | bytearray, n: int) -> bytes:
    """Permute n width-5 states serialized as n*5*32 canonical LE bytes."""
    buf = ctypes.create_string_buffer(bytes(states), len(states))
    if _lib().hades_perm_batch(buf, n) != 0:
        raise NativeUnavailable("hades_perm_batch failed")
    return buf.raw


def _digits_u16_buf(digits: np.ndarray, validate: bool = True) -> np.ndarray:
    """(B, 5, N_DIGITS) canonical digit array -> contiguous little-endian
    uint16 buffer whose bytes ARE the n*5*32-byte canonical LE layout the
    C engine operates on (no Python-int round trip). Canonicality is
    checked vectorized (the engine assumes reduced inputs) unless the
    caller asserts it via validate=False (see perm_batch_digits)."""
    from .encoding import N_DIGITS, check_canonical_digits

    arr = np.asarray(digits, np.uint32)
    if arr.ndim != 3 or arr.shape[1:] != (5, N_DIGITS):
        raise ValueError(f"expected (B, 5, {N_DIGITS}) digits")
    if validate:
        if arr.size and not bool((arr < 65536).all()):
            raise ValueError("digits not normalized (>= 2^16)")
        check_canonical_digits(
            arr.reshape(-1, N_DIGITS),
            "not a canonical field element: value >= p",
        )
    return np.ascontiguousarray(arr).astype("<u2")


def _perm_batch(symbol: str, digits: np.ndarray,
                validate: bool = True) -> np.ndarray:
    b = int(digits.shape[0])
    if b == 0:
        return np.zeros_like(np.asarray(digits, np.uint32))
    buf = _digits_u16_buf(digits, validate)
    if getattr(_lib(), symbol)(
            buf.ctypes.data_as(ctypes.c_void_p), b) != 0:
        raise NativeUnavailable(f"{symbol} failed")
    return buf.astype(np.uint32)


def perm_batch_digits(digits: np.ndarray, validate: bool = True) -> np.ndarray:
    """Permute (B, 5, N_DIGITS) uint32 canonical digit arrays natively
    through the sparse-factored schedule (hades_perm_batch_opt — ~1.9x
    fewer field muls than the naive dense schedule, bit-identical
    outputs; tests/test_native.py pins the identity). The digit buffer
    is passed to the engine in place (uint16 LE digits are exactly the
    canonical 32-byte LE scalar layout).

    validate=False skips the per-call canonicality scan; callers own
    the proof that every input is already canonical — the framework's
    pooled hashing seam (fri.default_pcs_perm) qualifies because every
    admission point validates (wire deserialization via bytes_to_digits
    and proof openings via fri._check_opening), and the engine's own
    outputs are canonical by construction. Default True for everyone
    else."""
    return _perm_batch("hades_perm_batch_opt", digits, validate)


def perm_batch_digits_naive(digits: np.ndarray) -> np.ndarray:
    """The naive dense-schedule engine (hades_perm_batch) — the measured
    stand-in for the reference crate's performance class and the pinned
    vs_baseline denominator (bench.py). Kept callable for bit-identity
    tests and baseline measurement; serving paths use the optimized
    engine above."""
    return _perm_batch("hades_perm_batch", digits)


#: Below this batch size the multi-thread path falls through to one
#: thread (spawn overhead exceeds the permutation work).
_MT_MIN_BATCH = 256


def perm_batch_digits_mt(digits: np.ndarray,
                         n_threads: int | None = None,
                         validate: bool = True) -> np.ndarray:
    """Multi-thread native permutation: shard the batch across OS
    threads, each running hades_perm_batch on its contiguous slice of
    ONE shared buffer. hades_perm_batch is stateless over caller memory
    (the round constants are read-only after hades_init) and ctypes
    releases the GIL for the duration of each foreign call, so the
    shards genuinely run in parallel. Bit-identical to
    perm_batch_digits — same C++ per state, disjoint slices
    (tests/test_native.py pins the identity).

    Shards run the sparse-factored engine (hades_perm_batch_opt), same
    as perm_batch_digits. This IS the default perm_fn on multi-core
    hosts (fri.default_pcs_perm, VERDICT r4 #8); the pinned vs_baseline
    denominator remains the single-thread NAIVE engine regardless. On
    this 1-core dev VM it is correctness-tested but measures neutral by
    construction. In auto mode (n_threads=None) batches below
    _MT_MIN_BATCH states stay single-thread: per-call thread spawns
    (~50-100 us each) would exceed the ~45 us/state permutation work on
    the small top levels of tree builds; an explicit n_threads is
    honored as requested."""
    b = int(digits.shape[0])
    auto = n_threads is None
    if auto:
        n_threads = os.cpu_count() or 1
    n_threads = max(1, min(int(n_threads), b))
    if n_threads == 1 or (auto and b < _MT_MIN_BATCH):
        return perm_batch_digits(digits, validate)
    lib = _lib()
    buf = _digits_u16_buf(digits, validate)
    base = buf.ctypes.data
    bounds = [b * t // n_threads for t in range(n_threads + 1)]
    # sentinel -1: a shard whose thread dies before the foreign call must
    # read as failure, never as silently-unpermuted success (every shard
    # is non-empty since n_threads <= b)
    errs = [-1] * n_threads

    def run(t: int) -> None:
        lo, hi = bounds[t], bounds[t + 1]
        errs[t] = lib.hades_perm_batch_opt(base + lo * 5 * 32, hi - lo)

    threads = [threading.Thread(target=run, args=(t,))
               for t in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    if any(errs):
        raise NativeUnavailable("hades_perm_batch_opt failed in a shard")
    return buf.astype(np.uint32)


def threaded_perm(n_threads: int | None = None):
    """perm_fn factory over perm_batch_digits_mt for injection into the
    fri/aggregate perm_fn seams (pooled_entries_verify,
    verify_succinct_batched, tree builds). Raises NativeUnavailable up
    front when the native engine cannot build."""
    _lib()
    return lambda s: perm_batch_digits_mt(np.asarray(s, np.uint32),
                                          n_threads)


def sponge_hash_digits(msgs: np.ndarray) -> np.ndarray:
    """Native rate-4 sponge: (B, L, N_DIGITS) canonical digits -> (B, N_DIGITS).
    Same spec (and bit-identical digests) as models.sponge.sponge_hash."""
    from .encoding import bytes_to_digits, digits_to_bytes

    b, length = msgs.shape[0], msgs.shape[1]
    out = ctypes.create_string_buffer(b * 32)
    if _lib().hades_sponge_hash(digits_to_bytes(msgs), b, length, out) != 0:
        raise NativeUnavailable("hades_sponge_hash failed")
    return bytes_to_digits(out.raw, (b,))


def merkle_root_digits(leaves: np.ndarray) -> np.ndarray:
    """Native arity-4 Merkle root: (N, N_DIGITS) canonical digits ->
    (N_DIGITS,). Same spec (bit-identical root) as models.merkle.merkle_root."""
    from .encoding import bytes_to_digits, digits_to_bytes

    n = leaves.shape[0]
    out = ctypes.create_string_buffer(32)
    if _lib().hades_merkle_root(digits_to_bytes(leaves), n, out) != 0:
        raise NativeUnavailable("hades_merkle_root failed")
    return bytes_to_digits(out.raw, (1,))[0]


def cipher_digits(key: np.ndarray, nonce: np.ndarray, data: np.ndarray,
                  decrypt: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Native duplex cipher (same spec and bit-identical outputs as
    models.cipher). key (B, 2, D), nonce (B, D), data (B, L, D) canonical
    digits, L a multiple of 4. Returns (out (B, L, D), tags (B, D))."""
    from .encoding import bytes_to_digits, digits_to_bytes

    b, length = data.shape[0], data.shape[1]
    out = ctypes.create_string_buffer(b * length * 32)
    tags = ctypes.create_string_buffer(b * 32)
    rc = _lib().hades_cipher(
        digits_to_bytes(key), digits_to_bytes(nonce), digits_to_bytes(data),
        b, length, int(decrypt), out, tags,
    )
    if rc != 0:
        raise NativeUnavailable("hades_cipher failed")
    return bytes_to_digits(out.raw, (b, length)), bytes_to_digits(tags.raw, (b,))


def bench_perms_per_sec(n: int = 20000) -> float:
    """Single-thread native permutations/second (the CPU reference class:
    the naive dense schedule, bench.py's pinned vs_baseline denominator)."""
    return float(_lib().hades_bench(n))


def bench_perms_per_sec_opt(n: int = 20000) -> float:
    """Single-thread rate of the SCALAR sparse-factored schedule
    (reported alongside, never the baseline denominator)."""
    return float(_lib().hades_bench_opt(n))


def has_ifma() -> bool:
    """True when the AVX-512 IFMA batch-8 engine is compiled into this
    host's artifact (hades_perm_batch_opt then runs 8-state groups
    through it; bit-identical canonical outputs)."""
    return bool(_lib().hades_has_ifma())


def bench_perms_per_sec_opt8(n: int = 20000) -> float:
    """Single-thread rate of the AVX-512 IFMA batch-8 engine — on IFMA
    hosts this is the engine the framework's pooled host hashing and
    verification actually run on. -1.0 when not compiled in."""
    return float(_lib().hades_bench_opt8(n))
