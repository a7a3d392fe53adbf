"""Cross-backend equivalence: fused Pallas kernel vs pure-JAX oracle.

The TPU analogue of the reference's scalar<->gadget consistency oracle
(SURVEY.md §4 test plan item c). Runs the exact kernel body as a plain XLA
function on CPU (perm_pallas.permute_planar_emulated — Mosaic interpret mode
is minutes-per-tile, unusable for CI); the Mosaic lowering itself compiles
and runs on real TPU via bench.py and the driver entry() check."""

import jax.numpy as jnp
import numpy as np
import pytest

from hades252_tpu import permute
from hades252_tpu.ops.perm_pallas import permute_pallas
from hades252_tpu.params import P
from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits
from tests.test_perm_ref import KATS


def rand_states(rng, n):
    vals = [[int.from_bytes(rng.bytes(40), "little") % P for _ in range(5)]
            for _ in range(n)]
    return ints_to_digits(vals, shape=(n, 5))


def test_kats_through_kernel():
    inputs = np.stack([ints_to_digits(list(k)) for k in KATS])
    out = np.asarray(permute_pallas(jnp.asarray(inputs), emulate=True))
    for i, expected in enumerate(KATS.values()):
        assert list(digits_to_ints(out[i])) == expected


def test_matches_oracle_random_batch(rng):
    # one 128-lane tile: interpret mode runs the full 67-round kernel in
    # Python, so keep the batch at a single tile
    x = rand_states(rng, 128)
    ref = np.asarray(permute(jnp.asarray(x)))
    fast = np.asarray(permute_pallas(jnp.asarray(x), block=128, emulate=True))
    assert np.array_equal(ref, fast)


def test_non_multiple_batch_padding(rng):
    x = rand_states(rng, 5)
    ref = np.asarray(permute(jnp.asarray(x)))
    fast = np.asarray(permute_pallas(jnp.asarray(x), emulate=True))
    assert np.array_equal(ref, fast)


def test_edge_words_through_kernel():
    rows = [[0, 1, P - 1, P - 2, 0], [P - 1] * 5, [0] * 5]
    x = ints_to_digits(rows, shape=(3, 5))
    ref = np.asarray(permute(jnp.asarray(x)))
    fast = np.asarray(permute_pallas(jnp.asarray(x), emulate=True))
    assert np.array_equal(ref, fast)


def test_all_schedules_agree(rng):
    # the naive kernel (direct reference-loop transcription) is the
    # in-kernel oracle for every optimized schedule
    x = rand_states(rng, 32)
    ref = np.asarray(
        permute_pallas(jnp.asarray(x), emulate=True, schedule="naive")
    )
    for sched in ("opt", "mxu", "mxu8", "hyb", "hybp", "hyb13", "hybp13"):
        got = np.asarray(
            permute_pallas(jnp.asarray(x), emulate=True, schedule=sched)
        )
        assert np.array_equal(got, ref), sched


def test_hyb_expansion_matches_naive_int(rng):
    # the full-expansion schedule (params.dot_schedule_int) reproduces the
    # naive partial chain exactly, validated in pure int arithmetic
    from hades252_tpu.params import (
        PARTIAL_ROUNDS, TOTAL_FULL_ROUNDS, WIDTH, dot_schedule_int,
        mds_matrix_int, round_constants_int,
    )

    mds = mds_matrix_int()
    ark = round_constants_int()
    half = TOTAL_FULL_ROUNDS // 2
    x = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(WIDTH)]

    st = list(x)
    for r in range(PARTIAL_ROUNDS):
        st = [(st[i] + ark[(half + r) * WIDTH + i]) % P for i in range(WIDTH)]
        st[WIDTH - 1] = pow(st[WIDTH - 1], 5, P)
        st = [sum(mds[k][j] * st[j] for j in range(WIDTH)) % P
              for k in range(WIDTH)]

    d = dot_schedule_int()
    basis = [1] + list(x)
    for r in range(PARTIAL_ROUNDS):
        t = sum(c * b for c, b in zip(d["alpha"][r], basis)) % P
        basis.append(pow(t, 5, P))
    out = [sum(c * b for c, b in zip(row, basis)) % P for row in d["omega"]]
    assert out == st


def test_shape_validation():
    with pytest.raises(ValueError):
        permute_pallas(jnp.zeros((4, 16), jnp.uint32), emulate=True)
    with pytest.raises(ValueError):
        permute_pallas(
            jnp.zeros((4, 5, 16), jnp.uint32), emulate=True, schedule="bogus"
        )


def test_pallas_requires_tpu_clear_error(rng):
    # On a CPU backend the kernel path must fail with a clear message (not
    # deep inside pallas_call) unless emulate/interpret is requested
    x = rand_states(rng, 128)
    with pytest.raises(RuntimeError, match="requires a TPU backend"):
        permute_pallas(jnp.asarray(x), block=128)


def test_selftest_gate_emulated():
    # the on-device KAT gate (selftest.py), exercised here via the numpy
    # emulation path; bench.py/entry() run the same gate on real TPU
    from hades252_tpu import selftest

    assert selftest.verify_device(selftest.SCHEDULES_ALL, emulate=True) == []
    selftest.assert_device_correct(selftest.SCHEDULES_ALL, emulate=True)


def test_selftest_gate_detects_mismatch(monkeypatch):
    # sanity: the gate actually fails loudly when the backend lies
    import hades252_tpu.selftest as st
    from hades252_tpu.ops import perm_pallas

    real = perm_pallas.permute_pallas

    def corrupted(x, **kw):
        out = np.asarray(real(x, **kw)).copy()
        out[0, 0, 0] ^= 1
        return out

    monkeypatch.setattr(
        "hades252_tpu.ops.perm_pallas.permute_pallas", corrupted
    )
    failures = st.verify_device(schedules=("mxu8",), emulate=True)
    assert failures and "mxu8" in failures[0]
