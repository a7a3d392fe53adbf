"""Gadget (constraint-synthesis) tests mirroring the reference's plonk
integration suite (src/strategies/gadget.rs:207-271): the gadget permutation
of an input must be consistent with the scalar permutation, inconsistent
witnesses must fail, and the gate budget must match the published count."""

import pytest

from hades252_tpu import ScalarStrategy, WIDTH
from hades252_tpu.gadget import (
    GATES_PER_PERM,
    Composer,
    Constraint,
    GadgetStrategy,
    Witness,
)
from hades252_tpu.params import P


def _run_gadget(inputs):
    composer = Composer()
    wires = [composer.append_witness(v) for v in inputs]
    GadgetStrategy.gadget(composer, wires)
    return composer, wires


def test_gate_count_parity():
    composer, _ = _run_gadget([0] * WIDTH)
    assert len(composer) == GATES_PER_PERM == 973


def test_gadget_matches_scalar_random(rng):
    # the analogue of reference `preimage` (gadget.rs:207-223): gadget
    # wire values must equal the scalar permutation output
    inputs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(WIDTH)]
    expected = ScalarStrategy().perm(list(inputs))
    composer, wires = _run_gadget(inputs)
    got = [composer.value(w) for w in wires]
    assert got == expected
    assert composer.check_satisfied()


def test_gadget_matches_scalar_constant():
    # analogue of `preimage_constant` (gadget.rs:226-244): input [5000; 5]
    inputs = [5000] * WIDTH
    expected = ScalarStrategy().perm(list(inputs))
    composer, wires = _run_gadget(inputs)
    assert [composer.value(w) for w in wires] == expected
    assert composer.check_satisfied()


def test_preimage_fails():
    # analogue of `preimage_fails` (gadget.rs:247-271): asserting the
    # gadget output equals the perm of a DIFFERENT input must not satisfy
    inputs = [0, 31, 0, 0, 0]
    wrong_output = ScalarStrategy().perm([31] * WIDTH)
    composer, wires = _run_gadget(inputs)
    out_wires = [composer.append_witness(v) for v in wrong_output]
    for p, o in zip(wires, out_wires):
        composer.assert_equal(p, o)
    assert not composer.check_satisfied()


def test_preimage_succeeds_with_consistent_witness(rng):
    inputs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(WIDTH)]
    output = ScalarStrategy().perm(list(inputs))
    composer, wires = _run_gadget(inputs)
    out_wires = [composer.append_witness(v) for v in output]
    for p, o in zip(wires, out_wires):
        composer.assert_equal(p, o)
    assert composer.check_satisfied()


def test_composer_primitives():
    c = Composer()
    a = c.append_witness(3)
    b = c.append_witness(4)
    prod = c.gate_mul(Constraint().mult(2).a(a).b(b).constant(5))
    assert c.value(prod) == 2 * 3 * 4 + 5
    s = c.gate_add(Constraint().left(1).a(a).right(P - 1).b(b))
    assert c.value(s) == (3 - 4) % P
    assert c.check_satisfied()
    # zero wire is reserved and constrained
    assert c.ZERO == Witness(0)
    assert c.value(c.ZERO) == 0


def test_columnar_export():
    composer, _ = _run_gadget([1] * WIDTH)
    arrays = composer.to_arrays()
    assert arrays["selectors"].shape == (973, 6, 32)
    assert arrays["wires"].shape == (973, 4)
    # reserved gate: q_l = 1 on the zero wire
    assert int.from_bytes(bytes(arrays["selectors"][0, 1]), "little") == 1
    assert list(arrays["wires"][0]) == [0, 0, 0, 0]


def test_width_validation():
    composer = Composer()
    wires = [composer.append_witness(0)] * 3
    with pytest.raises(ValueError):
        GadgetStrategy(composer).perm(wires)
