"""Quickstart: everything a dusk-network/Hades252 user needs, in one file.

Run anywhere (CPU or TPU):  python examples/quickstart.py
"""

import os

import jax

# Decide the platform WITHOUT initializing a backend (jax.default_backend()
# would block inside a TPU-relay plugin if the relay is down): honor an
# explicit TPU platform in the environment, default to CPU otherwise.
if os.environ.get("JAX_PLATFORMS", "cpu") in ("", "cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import hades252_tpu as h
from hades252_tpu.models.merkle import merkle_levels, merkle_open, merkle_root, merkle_verify
from hades252_tpu.models.sponge import SpongeState, sponge_hash_ints
from hades252_tpu.utils.encoding import digits_to_ints, ints_to_digits

# --- the permutation, reference-style (ScalarStrategy::perm) ----------------
state = [1, 2, 3, 4, 5]
h.ScalarStrategy().perm(state)  # in place, like &mut [BlsScalar; 5]
print("perm([1..5])[0] =", hex(state[0]))

# --- batched, through the compiled backend ----------------------------------
x = ints_to_digits([[i, i, i, i, i] for i in range(8)], shape=(8, 5))
out = h.permute(jnp.asarray(x))  # pure-JAX oracle; ScalarStrategy("pallas")
print("batched:", out.shape)     # uses the fused TPU kernel on TPU

# --- sponge hashing ----------------------------------------------------------
print("sponge([1..5]) =", hex(sponge_hash_ints([1, 2, 3, 4, 5]))[:20], "...")

# streaming absorb + extendable squeeze
st = SpongeState(n_streams=1, total_length=6)
st.absorb(jnp.asarray(ints_to_digits([[1, 2]], shape=(1, 2))))
st.absorb(jnp.asarray(ints_to_digits([[3, 4, 5, 6]], shape=(1, 4))))
stream = st.squeeze(3)  # 3 output words
print("squeeze(3):", [hex(int(digits_to_ints(np.asarray(w))))[:14]
                      for w in stream[0]])

# --- Merkle tree + inclusion proofs ------------------------------------------
leaves = jnp.asarray(ints_to_digits(list(range(64)), shape=(64,)))
root = merkle_root(leaves)
levels = merkle_levels(leaves)
path = merkle_open(levels, index=17)
ok = merkle_verify(root, ints_to_digits([17])[0], path, height=3)
print("merkle proof for leaf 17:", ok)

# compact batched openings: 3 siblings/level, one perm call per level for
# the whole batch of proofs
from hades252_tpu.models.merkle import merkle_open_batched, merkle_verify_batched
sibs, poss = merkle_open_batched(levels, [3, 17, 42])
ok_b = merkle_verify_batched(root, leaves[jnp.asarray([3, 17, 42])],
                             sibs, poss, height=3)
print("batched compact proofs:", [bool(v) for v in ok_b])

# --- authenticated encryption (duplex cipher over the permutation) -----------
from hades252_tpu.models import cipher
key = jnp.asarray(ints_to_digits([[11, 22]], shape=(1, 2)))
nonce = jnp.asarray(ints_to_digits([33], shape=(1,)))
msg = jnp.asarray(ints_to_digits([[1, 2, 3, 4]], shape=(1, 4)))
ct, tag = cipher.encrypt(key, nonce, msg)
pt, ok = cipher.decrypt(key, nonce, ct, tag)
print("cipher roundtrip:", bool(ok[0]) and bool((pt[:, :4] == msg).all()))

# --- PLONK constraint synthesis (GadgetStrategy) ------------------------------
c = h.Composer()
ws = [c.append_witness(v) for v in (1, 2, 3, 4, 5)]
h.GadgetStrategy.gadget(c, ws)
print(f"gadget: {len(c)} gates, satisfied={c.check_satisfied()}, "
      f"out[0]={hex(c.value(ws[0]))[:14]}...")

# --- polynomial prove/verify (curve-free PLONK argument) ----------------------
from hades252_tpu import plonk
key_ck = plonk.preprocess(c)
proof = plonk.prove(c, key_ck)
print("plonk proof verifies:", plonk.verify(key_ck, proof,
                                            [g.pi for g in c.gates]))

# --- succinct + zero-knowledge proofs (Hades-Merkle + DEEP-FRI PCS) ----------
# the same argument with commitments that bind polynomials: sublinear
# proofs, no trusted setup, optional Z_H-blinding (zk). Tiny circuit +
# light parameters here; production uses fri.FriParams() (121-bit
# conjectured) or fri.FriParams.proven() (~120.5-bit PROVEN Johnson
# bound, 67 queries) — both measured in PERF.md.
from hades252_tpu import fri
tiny = h.Composer()
a = tiny.append_witness(3)
b = tiny.append_witness(5)
tiny.gate_mul(h.Constraint().mult(1).a(a).b(b))
params = fri.FriParams(blowup=4, n_queries=4, final_degree=8, zk=True)
pk, vk = fri.preprocess_succinct(tiny, params)
sp = fri.prove_succinct(tiny, pk)
print("succinct zk proof verifies:",
      fri.verify_succinct(vk, sp, [g.pi for g in tiny.gates]),
      f"({fri.proof_size_field_elements(sp)} field elements)")

# --- proofs and keys as bytes (dusk-plonk Serializable parity) ----------------
from hades252_tpu import serialize
wire_vk = serialize.vk_to_bytes(vk)
wire_sp = serialize.proof_to_bytes(sp, vk)
vk2 = serialize.vk_from_bytes(wire_vk)        # another process/host
sp2 = serialize.proof_from_bytes(wire_sp, vk2)
print("wire roundtrip verifies:",
      fri.verify_succinct(vk2, sp2, [g.pi for g in tiny.gates]),
      f"({len(wire_sp)} proof bytes, {len(wire_vk)} key bytes)")

# --- in-circuit gadgets: prove statements ABOUT the models --------------------
# every model family has an in-circuit counterpart (circuits.py): here,
# prove knowledge of a leaf at a public index under a public Merkle root
# (the composability the reference's GadgetStrategy exists for).
from hades252_tpu import circuits

small = jnp.asarray(ints_to_digits(list(range(100, 116)), shape=(16,)))
small_levels = merkle_levels(small)
leaf, groups, positions, mroot = circuits.merkle_path_ints(small_levels, 9)
mc = circuits.merkle_membership_circuit(leaf, groups, positions, mroot,
                                        index=9)
mkey = plonk.preprocess(mc)
mproof = plonk.prove(mc, mkey)
print(f"merkle membership circuit ({len(mc)} gates, n={mkey.n}) verifies:",
      plonk.verify(mkey, mproof, circuits.public_input_column(mc)))

# --- aggregated proofs: ONE argument for B same-circuit instances -------------
# block Merkle commitments share every path + the whole FRI argument, so
# the marginal instance carries only claimed evals and opened leaf values;
# the SAME vk verifies singles and aggregates.
from hades252_tpu import aggregate


def tiny_instance(x: int, y: int):
    ci = h.Composer()
    wa = ci.append_witness(x)
    wb = ci.append_witness(y)
    ci.gate_mul(h.Constraint().mult(1).a(wa).b(wb))
    return ci


batch = [tiny_instance(3, 5), tiny_instance(2, 9), tiny_instance(7, 11)]
agg = aggregate.prove_aggregate(batch, pk)
pis = [[g.pi for g in ci.gates] for ci in batch]
wire_agg = serialize.aggregate_to_bytes(agg, vk)
print("aggregate of", agg.n_instances, "instances verifies:",
      aggregate.verify_aggregate(vk, agg, pis),
      f"({aggregate.aggregate_size_field_elements(agg)} field elements, "
      f"{len(wire_agg)} wire bytes, vs "
      f"{3 * fri.proof_size_field_elements(sp)} for 3 separate proofs)")

# --- device-resident verification entry points ---------------------------------
# on a TPU host every pooled opening chain below runs as ONE fused device
# executable (verdicts bit-identical to the host path); off-TPU the same
# calls fall back to the host-pooled path, so this example runs anywhere.
# mesh= (a jax.sharding Mesh) shards the chains across devices. The
# device PROVER twins (fri_tpu.prove_succinct_device[_batch] /
# prove_aggregate_device) are exercised by tests/test_fri_tpu.py and
# bench.py fri/aggregate — their phase compiles are too heavy for this
# quickstart's CPU budget.
from hades252_tpu import fri_tpu

verdicts = fri_tpu.verify_succinct_device_batch(
    vk, [sp, sp], [[g.pi for g in tiny.gates]] * 2)
print("device verification entry points:", list(map(bool, verdicts)),
      "| aggregate:", fri_tpu.verify_aggregate_device(vk, agg, pis))
