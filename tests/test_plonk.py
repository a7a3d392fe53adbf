"""Polynomial-level prove/verify for the gadget backend (plonk.py).

Mirrors the reference's PLONK integration tests — preimage /
preimage_constant / preimage_fails (reference: src/strategies/gadget.rs:
198-271) — at the polynomial-argument level: gate identity + copy-constraint
grand product over a radix-2 domain of F_r, quotient by Z_H, Fiat-Shamir
challenges through the Hades sponge.
"""

import pytest

from hades252_tpu import plonk
from hades252_tpu.gadget import Composer, Constraint, GadgetStrategy
from hades252_tpu.params import P, WIDTH
from hades252_tpu.strategy import ScalarStrategy


def _preimage_circuit(input_words, expected):
    """The reference TestCircuit (gadget.rs:151-178): append the input
    witnesses, run the gadget, constrain each output word to the expected
    value via the public-input column."""
    c = Composer()
    ws = [c.append_witness(w) for w in input_words]
    GadgetStrategy.gadget(c, ws)
    for w, e in zip(ws, expected):
        c.append_gate(Constraint().left(1).a(w).public(-e))
    return c


def _pi_column(composer):
    return [g.pi for g in composer.gates]


# -- domain / NTT foundations -------------------------------------------------


def test_root_of_unity():
    assert pow(plonk.ROOT_OF_UNITY, 1 << 32, P) == 1
    assert pow(plonk.ROOT_OF_UNITY, 1 << 31, P) != 1


def test_ntt_roundtrip_and_eval(rng):
    coeffs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(16)]
    evals = plonk.ntt(coeffs)
    back = plonk.ntt(evals, invert=True)
    assert back == coeffs
    w = plonk._domain_root(16)
    for j in (0, 1, 7):
        assert evals[j] == plonk.poly_eval(coeffs, pow(w, j, P))


def test_coset_eval_interp(rng):
    coeffs = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(8)]
    ev = plonk._coset_eval(coeffs, 8, 7)
    assert ev[0] == plonk.poly_eval(coeffs, 7)
    assert plonk._coset_interp(ev, 7) == coeffs


# -- tiny circuit sanity ------------------------------------------------------


def test_tiny_circuit_prove_verify():
    c = Composer()
    a = c.append_witness(3)
    b = c.append_witness(5)
    c.gate_mul(Constraint().mult(1).a(a).b(b))  # o = 15
    key = plonk.preprocess(c)
    proof = plonk.prove(c, key)
    assert plonk.verify(key, proof, _pi_column(c))


def test_tiny_circuit_copy_constraints():
    # the same witness wired into two gates: sigma must bind them
    c = Composer()
    a = c.append_witness(9)
    o1 = c.gate_mul(Constraint().mult(1).a(a).b(a))      # 81
    c.gate_add(Constraint().left(1).a(o1).right(P - 1).b(a).constant(-72))
    key = plonk.preprocess(c)
    proof = plonk.prove(c, key)
    assert plonk.verify(key, proof, _pi_column(c))
    # tampering any wire polynomial breaks either the commitment binding
    # or (re-hashed) the gate/permutation identity
    bad = plonk.Proof(
        wires=(proof.wires[0][:1] + [(proof.wires[0][1] + 1) % P]
               + proof.wires[0][2:],) + proof.wires[1:],
        z=proof.z, t=proof.t, commitments=proof.commitments,
    )
    assert not plonk.verify(key, bad, _pi_column(c))


# -- the reference's integration tests, polynomial edition --------------------


@pytest.fixture(scope="module")
def preimage_setup(rng):
    x = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(WIDTH)]
    expected = ScalarStrategy().perm(list(x))
    composer = _preimage_circuit(x, expected)
    assert composer.check_satisfied()
    key = plonk.preprocess(composer)
    return x, expected, composer, key


def test_preimage(preimage_setup):
    _, _, composer, key = preimage_setup
    proof = plonk.prove(composer, key)
    assert plonk.verify(key, proof, _pi_column(composer))


def test_preimage_constant(rng):
    # fixed input [5000; 5] (gadget.rs:226-244)
    x = [5000] * WIDTH
    expected = ScalarStrategy().perm(list(x))
    composer = _preimage_circuit(x, expected)
    key = plonk.preprocess(composer)
    proof = plonk.prove(composer, key)
    assert plonk.verify(key, proof, _pi_column(composer))


def test_preimage_fails(preimage_setup):
    # inconsistent witness: input [0,31,0,0,0] against the perm of [31;5]
    # (gadget.rs:247-271) — the quotient cannot exist, verification fails
    wrong_expected = ScalarStrategy().perm([31] * WIDTH)
    composer = _preimage_circuit([0, 31, 0, 0, 0], wrong_expected)
    assert not composer.check_satisfied()
    key = plonk.preprocess(composer)
    proof = plonk.prove(composer, key)
    assert not plonk.verify(key, proof, _pi_column(composer))


def test_wrong_public_inputs_fail(preimage_setup):
    _, _, composer, key = preimage_setup
    proof = plonk.prove(composer, key)
    pi = _pi_column(composer)
    bad = list(pi)
    bad[-1] = (bad[-1] + 1) % P
    assert not plonk.verify(key, proof, bad)


def test_forged_quotient_fails(preimage_setup):
    # a stronger adversary: tamper the quotient AND recompute its
    # commitment (so the transcript re-binds); the zeta identity must
    # still fail (Schwartz-Zippel over the re-derived challenge)
    _, _, composer, key = preimage_setup
    proof = plonk.prove(composer, key)
    t2 = list(proof.t)
    t2[0] = (t2[0] + 1) % P
    cm2 = dict(proof.commitments)
    cm2["t"] = plonk.commit(t2)
    forged = plonk.Proof(wires=proof.wires, z=proof.z, t=t2,
                         commitments=cm2)
    assert not plonk.verify(key, forged, [g.pi for g in composer.gates])


def _unbound_zeta(proof):
    """The zeta a round-2 (statement-UNbound) verifier would derive: the
    transcript absorbed only the wire/z/t commitments."""
    tr = plonk.Transcript()
    for name in "abod":
        tr.absorb(proof.commitments[name])
    tr.challenge()  # beta
    tr.challenge()  # gamma
    tr.absorb(proof.commitments["z"])
    tr.challenge()  # alpha
    tr.absorb(proof.commitments["t"])
    return tr.challenge()


def test_pi_rebinding_attack_rejected(preimage_setup):
    # Frozen-Heart regression (advisor, round 2): with weak FS an honest
    # proof rebinds to any alternative PI column solving the single linear
    # constraint interp(PI')(zeta) = interp(PI)(zeta). Craft exactly that
    # attack against the statement-unbound zeta and check the (now
    # statement-bound) verifier rejects it.
    _, _, composer, key = preimage_setup
    proof = plonk.prove(composer, key)
    n = key.n
    pi = [g.pi % P for g in composer.gates]
    zeta = _unbound_zeta(proof)

    def lagrange_at_zeta(i):
        col = [0] * n
        col[i] = 1
        return plonk.poly_eval(plonk.ntt(col, invert=True), zeta)

    delta = 1
    comp = -delta * lagrange_at_zeta(0) * pow(
        lagrange_at_zeta(1), P - 2, P
    ) % P
    pi2 = list(pi)
    pi2[0] = (pi2[0] + delta) % P
    pi2[1] = (pi2[1] + comp) % P

    def interp_at(col):
        padded = [v % P for v in col] + [0] * (n - len(col))
        return plonk.poly_eval(plonk.ntt(padded, invert=True), zeta)

    # the attack is well-formed: same zeta-evaluation, different column —
    # a statement-unbound verifier would have accepted it wholesale
    assert interp_at(pi2) == interp_at(pi) and pi2 != pi
    assert not plonk.verify(key, proof, pi2)


def test_forged_high_degree_quotient_fails(preimage_setup):
    # degree-(4n-1) quotient forgery: above the derived 4n-4 bound, caught
    # by the degree check itself (belt) before any evaluation
    _, _, composer, key = preimage_setup
    proof = plonk.prove(composer, key)
    n = key.n
    t2 = list(proof.t) + [0] * (4 * n - len(proof.t))
    t2[4 * n - 1] = 1
    cm2 = dict(proof.commitments)
    cm2["t"] = plonk.commit(t2)
    forged = plonk.Proof(wires=proof.wires, z=proof.z, t=t2,
                         commitments=cm2)
    assert not plonk.verify(key, forged, [g.pi for g in composer.gates])


def test_forged_grand_product_fails(preimage_setup):
    # same for z: break the copy-constraint argument with re-bound
    # commitments; either the boundary (L1) or the permutation identity
    # catches it at zeta
    _, _, composer, key = preimage_setup
    proof = plonk.prove(composer, key)
    z2 = list(proof.z)
    z2[1] = (z2[1] + 1) % P
    cm2 = dict(proof.commitments)
    cm2["z"] = plonk.commit(z2)
    forged = plonk.Proof(wires=proof.wires, z=z2, t=proof.t,
                         commitments=cm2)
    assert not plonk.verify(key, forged, [g.pi for g in composer.gates])
