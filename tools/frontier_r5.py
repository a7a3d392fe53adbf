"""Round-5 parameter/size frontier (VERDICT r4 next #3): prove/verify/
bytes at blowup {4, 8, 16, 32} pinned to equal CONJECTURED 121 bits
(queries solved per FriParams.security_bits), plus the two ~120-PROVEN-
bit candidates (FriParams.proven() at blowup 8 and 16) — all on the
973-gate preimage circuit (n=1024).

Host-side measurements only (this tool needs no TPU): host prove secs,
host verify secs with the per-phase split, serialized proof bytes, and
the per-section byte breakdown. Device prove rows for the chosen points
come from `bench.py fri` hardware runs (PERF.md).

Usage: PYTHONPATH=/root/repo python tools/frontier_r5.py
Prints one JSON line per configuration.
"""

import json
import sys
import time

import numpy as np

import jax

# host-only tool: force the CPU backend BEFORE any backend touch (the
# axon relay plugin otherwise initializes — and during a relay outage,
# hangs — even though nothing here needs a device; CLAUDE.md)
jax.config.update("jax_platforms", "cpu")

from hades252_tpu import fri, serialize
from hades252_tpu.gadget import Composer, Constraint, GadgetStrategy
from hades252_tpu.params import P, WIDTH
from hades252_tpu.strategy import ScalarStrategy


def build_circuit():
    rng = np.random.default_rng(0)
    x = [int.from_bytes(rng.bytes(40), "little") % P for _ in range(WIDTH)]
    expected = ScalarStrategy().perm(list(x))
    c = Composer()
    ws = [c.append_witness(w) for w in x]
    GadgetStrategy.gadget(c, ws)
    for w, e in zip(ws, expected):
        c.append_gate(Constraint().left(1).a(w).public(-e))
    return c


def equal_conjectured_queries(blowup: int, target: float,
                              pow_bits: int) -> int:
    import math

    return math.ceil((target - pow_bits) / math.log2(blowup))


def main():
    c = build_circuit()
    configs = []
    for blowup in (4, 8, 16, 32):
        q = equal_conjectured_queries(blowup, 121.0, 16)
        configs.append((f"conj121_b{blowup}",
                        fri.FriParams(blowup=blowup, n_queries=q,
                                      final_degree=64, pow_bits=16)))
    configs.append(("proven120_b8", fri.FriParams.proven()))
    configs.append(("proven120_b16", fri.FriParams.proven(blowup=16)))

    for name, params in configs:
        pk, vk = fri.preprocess_succinct(c, params)
        pi = [g.pi for g in c.gates]
        t0 = time.perf_counter()
        proof = fri.prove_succinct(c, pk)
        prove_s = time.perf_counter() - t0
        blob = serialize.proof_to_bytes(proof, vk)
        assert serialize.proof_from_bytes(blob, vk).roots == proof.roots
        # verify: best of 3 (1-core host noise), with the phase split
        best, phases = None, None
        for _ in range(3):
            t = {}
            t0 = time.perf_counter()
            ok = fri.verify_succinct_batched(vk, [proof], [pi], timings=t)
            dt = time.perf_counter() - t0
            assert bool(ok[0])
            if best is None or dt < best:
                best, phases = dt, t
        bd = serialize.proof_byte_breakdown(proof, vk)
        out = {
            "config": name,
            "blowup": params.blowup,
            "n_queries": params.n_queries,
            "pow_bits": params.pow_bits,
            "security_bits": round(params.security_bits(pk.key.n), 1),
            "proven_security_bits":
                round(params.proven_security_bits(pk.key.n), 1),
            "proof_wire_bytes": len(blob),
            "host_prove_s": round(prove_s, 3),
            "host_verify_s": round(best, 4),
            "verify_prepare_s": round(phases["prepare_s"], 4),
            "verify_merkle_s": round(phases["merkle_s"], 4),
            "verify_algebra_s": round(phases["algebra_s"], 4),
            "bytes_tree_blocks": sum(bd["tree_blocks"].values()),
            "bytes_tree_nodes": sum(bd["tree_nodes"].values()),
            "bytes_fri_blocks": sum(bd["fri_layer_blocks"]),
            "bytes_fri_nodes": sum(bd["fri_layer_nodes"]),
            "bytes_scaffolding": bd["header"] + bd["roots"] + bd["evals"]
                + bd["fri_layer_roots"] + bd["final_coeffs"]
                + bd["pow_nonce"] + bd["counts"],
            "breakdown": bd,
        }
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
