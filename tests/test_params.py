"""Asset decoding golden tests (SURVEY.md §2.2 bit-exactness contract).

Mirrors the reference's `test_round_constants` (src/round_constants.rs:55-65)
and adds the Montgomery-trap checks: MDS[0][0] must equal R * 5^{-1} mod p
and every ARK constant must already be canonical."""

import numpy as np
import pytest

from hades252_tpu import params


def test_counts_and_canonicality():
    ark = params.round_constants_int()
    mds = params.mds_matrix_int()
    assert len(ark) == 960
    assert len(mds) == 5 and all(len(r) == 5 for r in mds)
    assert all(0 < c < params.P for c in ark)  # all non-zero, canonical
    assert all(0 < m < params.P for row in mds for m in row)


def test_mds_is_effective_cauchy_times_R():
    # SURVEY.md §2.2: effective MDS[i][j] = R / (x_i + y_j) mod p with
    # x_i = i, y_j = j + 5 (assets/HOWTO.md recipe re-read through from_raw).
    mds = params.mds_matrix_int()
    R = params.R_MOD_P
    for i in range(5):
        for j in range(5):
            expected = (R * pow(i + j + 5, params.P - 2, params.P)) % params.P
            assert mds[i][j] == expected, (i, j)


def test_digit_round_trip():
    rng = np.random.default_rng(7)
    for _ in range(50):
        v = int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % params.P
        assert params.digits_to_int(params.int_to_digits(v)) == v


def test_digit_range_validation():
    with pytest.raises(ValueError):
        params.int_to_digits(1 << 256)
    with pytest.raises(ValueError):
        params.int_to_digits(-1)


def test_assets_reproducible_from_recipe():
    """The vendored binaries must equal an independent regeneration from
    the documented recipes (reference: assets/HOWTO.md; C7 in SURVEY §2)."""
    import os

    from hades252_tpu.utils import asset_gen

    d = os.path.join(os.path.dirname(params.__file__), "assets")
    assert asset_gen.generate_ark() == open(os.path.join(d, "ark.bin"), "rb").read()
    assert asset_gen.generate_mds() == open(os.path.join(d, "mds.bin"), "rb").read()


def test_u64_from_buffer():
    from hades252_tpu.utils.encoding import u64_from_buffer

    data = (0x0123456789ABCDEF).to_bytes(8, "little") + b"\x01" + b"\x00" * 7
    assert u64_from_buffer(data, 0) == 0x0123456789ABCDEF
    assert u64_from_buffer(data, 8) == 1


def test_strategy_per_round_api(rng):
    """The schedule-engine surface (apply_full_round / apply_partial_round /
    next_c / rounds) matches the trait semantics: a hand-driven schedule
    equals perm, and exhausting constants raises (strategies.rs:40)."""
    from hades252_tpu import ScalarStrategy, Strategy

    s = ScalarStrategy()
    words = [int.from_bytes(rng.bytes(40), "little") % params.P for _ in range(5)]
    manual = list(words)
    constants = iter(params.round_constants_int())
    for _ in range(4):
        s.apply_full_round(constants, manual)
    for _ in range(59):
        s.apply_partial_round(constants, manual)
    for _ in range(4):
        s.apply_full_round(constants, manual)
    via_perm = list(words)
    out = s.perm(via_perm)  # mutates in place AND returns
    assert manual == via_perm == out
    assert Strategy.rounds() == 67
    with pytest.raises(RuntimeError, match="out of ARK constants"):
        Strategy.next_c(iter(()))


def test_montgomery_constants_consistent():
    c = params.perm_constants_np()
    assert c["ark_mont"].shape == (67, 5, 16)
    assert c["mds_mont"].shape == (5, 5, 16)
    assert c["ark_full"].shape == (960, 16)
    assert params.digits_to_int(c["p"]) == params.P
    assert params.digits_to_int(c["r2"]) == params.R2_MOD_P
    # p * p' ≡ -1 mod R
    assert (params.P * params.P_PRIME) % params.R == params.R - 1
    # ark_mont[r][w] == ark[5r+w] * R mod p
    ark = params.round_constants_int()
    got = params.digits_to_int(c["ark_mont"][3, 2])
    assert got == (ark[3 * 5 + 2] * params.R_MOD_P) % params.P


def test_public_constant_exports():
    # reference API parity: lib.rs re-exports the constant arrays
    # (ROUND_CONSTANTS: round_constants.rs:29, MDS_MATRIX: mds_matrix.rs:18)
    import hades252_tpu as h

    assert len(h.ROUND_CONSTANTS) == 960
    assert all(0 < c < params.P for c in h.ROUND_CONSTANTS)  # non-zero check
    assert len(h.MDS_MATRIX) == 5 and all(len(r) == 5 for r in h.MDS_MATRIX)
    assert h.MDS_MATRIX == params.mds_matrix_int()
    with pytest.raises(AttributeError):
        h.NO_SUCH_EXPORT
