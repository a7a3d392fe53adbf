"""Known-answer and property tests for the pure-JAX permutation oracle.

KATs are the ground-truth vectors from SURVEY.md §2.3 (verified against an
independent model of reference src/strategies.rs:140-157). Property tests
mirror the reference's `hades_det` (src/strategies/scalar.rs:62-74)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hades252_tpu import ScalarStrategy, WIDTH, permute
from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits

KATS = {
    (0, 0, 0, 0, 0): [
        0x4448679E00A28DD381089245EFAAB4249E99C5825CEEC146D8AAC63A3C3BBC95,
        0x5089F35C1040B4F2E69EC8477F36E6C9F53AA0337601ED010D42F815C408D2CF,
        0x5996FB9E63398915914EA31A6DA434F33102EA0CFCAE356F07011A82EAD4930C,
        0x5412A3D268D48157E41185620CB5587B6C4C02B86B530A2F1339FC0CFC557689,
        0x739C65CC0ABBDCA8A7CE87EDB2363AC0AAF217903C9B1729E8D9682FA82BF971,
    ],
    (1, 1, 1, 1, 1): [
        0x71A5B8040ED5C21F5900C854F34748E89DFB577514B9BD816E62E1B3E3F039C3,
        0x6A5FF1C447767085E400326CA1CC91306D6EB47C1C02BC6FE92AA34508F22C2B,
        0x2D188D45C00E483864F22F663ECDEB6833A660DBC5A53AB56A20ADA360308A45,
        0x620490481DAA92D41FCA6CE913BA69A769C4F6C705B78F4AEB2ED48020FCD3E5,
        0x4390D7DEC01AFE00E2F7E5148B8070D99021DF24B53D4BFFEC7D42433E4B8CA2,
    ],
    (17, 17, 17, 17, 17): [
        0x4A335A5BE470B8C178E7E78DFD8ABCEDEE607C75AFBFF0491C074BAE3415B320,
        0x04F108127CC563090C4724A4C394334FD38B6B59654E38FAE442351793024684,
        0x4C5A86584CB6661CCE9074CC64D18D56AAF1DC1A0C6C0DAE0319A5AFCD6C1033,
        0x432C2C79D317CC36030483F9B06879DCE6F0B7C5A421555EE32DE0DBB8FB5444,
        0x5E0F4E5BF6FA474CF727CE87DD64E6A4753F60758BB8273E04715A469AB14F91,
    ],
    (0, 1, 2, 3, 4): [
        0x4C78FE2E2CDB6E76B43742B08A782A771258F76F57B5FFE586F2391A0363013A,
        0x24CE8F38F8E02C94B2E0B44EDEE20579D1CB7E0E34EA5889B76AF5531DE48654,
        0x41BD94C473E11F8A1FA63BDA8DB2C872467187EC72668B90FF20DAAD076D2FD9,
        0x5C6ABBEF811655FF079FAB41E11932F1D784F363C4C36C1234C5C0F600E55E43,
        0x02E47CFE251226D450F518946A0ABCF1E7F721C0685A4382CAB9409AEE71FF9A,
    ],
}


def test_known_answer_vectors():
    strat = ScalarStrategy()
    for inp, expected in KATS.items():
        assert strat.perm(list(inp)) == expected, inp


def test_batched_kats_single_call():
    inputs = np.stack([ints_to_digits(list(k)) for k in KATS])
    out = np.asarray(permute(jnp.asarray(inputs)))
    for b, expected in enumerate(KATS.values()):
        assert list(digits_to_ints(out[b])) == expected


def test_hades_det(rng):
    # Mirror of reference hades_det (scalar.rs:62-74)
    strat = ScalarStrategy()
    x = strat.perm([17] * WIDTH)
    y = strat.perm([17] * WIDTH)
    z = strat.perm([19] * WIDTH)
    assert x == y
    assert x != z


def test_jit_and_leading_batch_dims(rng):
    vals = [int.from_bytes(rng.bytes(40), "little") % (1 << 250) for _ in range(20)]
    d = ints_to_digits(vals, shape=(2, 2, WIDTH))
    out1 = np.asarray(permute(jnp.asarray(d)))
    out2 = np.asarray(jax.jit(permute)(jnp.asarray(d)))
    assert np.array_equal(out1, out2)
    # each (2,2) entry equals the unbatched perm of its own words
    strat = ScalarStrategy()
    exp = strat.perm([vals[0], vals[1], vals[2], vals[3], vals[4]])
    assert list(digits_to_ints(out1[0, 0])) == exp


def test_width_validation():
    strat = ScalarStrategy()
    with pytest.raises(ValueError):
        strat.perm([1, 2, 3])
    with pytest.raises(ValueError):
        permute(jnp.zeros((4, 16), jnp.uint32))


def test_next_c_exhaustion():
    # Exhausting the 960 preloaded constants is a hard error, mirroring the
    # reference's panic "out of ARK constants" (src/strategies.rs:33-41)
    strat = ScalarStrategy()
    constants = iter([1, 2])
    assert strat.next_c(constants) == 1
    assert strat.next_c(constants) == 2
    with pytest.raises(RuntimeError, match="out of ARK constants"):
        strat.next_c(constants)
