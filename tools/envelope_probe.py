"""HBM-envelope probe for the device-resident succinct prover
(VERDICT r4 weak #3 tail: document the measured max (n, B) after the
lax.map DEEP-composition streaming fix, commit be19db5).

This is a CAPACITY probe, not a perf row: it drives
fri_tpu.prove_succinct_device / _batch at growing (n, B) shapes on the
real chip, verifies each emitted proof with the HOST verifier (so a
silently-corrupt large-shape proof cannot read as success), and reports
pass / out-of-memory per shape. It deliberately skips the host-prover
bit-identity gate — host big-int proving at n=2^15 costs ~tens of
minutes and the bit-identity property is already pinned at smaller n by
tests/test_fri_tpu.py and every bench.py fri row.

Usage: cd <snapshot> && PYTHONPATH=<snapshot>:/root/.axon_site \
           python tools/envelope_probe.py [fast|prod]
Prints one JSON line per probed shape.
"""

import json
import sys
import time

import numpy as np

from hades252_tpu import fri, fri_tpu
from hades252_tpu.gadget import Composer, Constraint, GadgetStrategy
from hades252_tpu.params import P, WIDTH
from hades252_tpu.strategy import ScalarStrategy


def chain_circuit(n_perms: int) -> Composer:
    rng = np.random.default_rng(0)
    x = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(WIDTH)]
    strat = ScalarStrategy()
    expected = list(x)
    for _ in range(n_perms):
        expected = strat.perm(list(expected))
    c = Composer()
    ws = [c.append_witness(w) for w in x]
    state = list(ws)
    for _ in range(n_perms):
        GadgetStrategy.gadget(c, state)
    for w, e in zip(state, expected):
        c.append_gate(Constraint().left(1).a(w).public(-e))
    return c


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "fast"
    params = (fri.FriParams() if preset == "prod" else
              fri.FriParams(blowup=4, n_queries=16, final_degree=64,
                            pow_bits=8))
    # (chains, B): n = 2^ceil(log2(973*chains + 5)). Probe the n axis
    # first (B=1), then B at the largest passing n.
    shapes = [(16, 1), (32, 1), (16, 2), (16, 4), (32, 2)]
    for chains, b in shapes:
        c = chain_circuit(chains)
        n_gates = len(c.gates)
        out = {"preset": preset, "chains": chains, "B": b,
               "n_gates": n_gates}
        try:
            pk, vk = fri.preprocess_succinct(c, params)
            pi = [g.pi for g in c.gates]
            t0 = time.perf_counter()
            if b == 1:
                proofs = [fri_tpu.prove_succinct_device(c, pk)]
            else:
                proofs = fri_tpu.prove_succinct_device_batch([c] * b, pk)
            out["sec_per_batch_device"] = round(time.perf_counter() - t0, 2)
            verd = fri.verify_succinct_batched(vk, proofs, [pi] * b)
            out["verified"] = bool(np.all(verd))
            out["ok"] = out["verified"]
        except Exception as e:  # noqa: BLE001 — report OOM/compile failures
            msg = str(e)
            out["ok"] = False
            out["error"] = (msg[:300] + "...") if len(msg) > 300 else msg
            out["oom"] = ("RESOURCE_EXHAUSTED" in msg or "memory" in
                          msg.lower())
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
