"""hades252_tpu — a TPU-native Hades252 permutation framework.

Brand-new implementation (not a port) of the capabilities of
`dusk-network/Hades252`: the width-5 Hades permutation of the Poseidon hash
family over the BLS12-381 scalar field, plus batched sponge/Merkle drivers,
multi-chip sharding, and a PLONK-gadget-style constraint synthesizer.

Public API parity with the reference crate root (reference: src/lib.rs:20-31):
  WIDTH, TOTAL_FULL_ROUNDS, PARTIAL_ROUNDS    — fixed parameters
  ScalarStrategy / permute                    — executes the permutation
  GadgetStrategy / Composer                   — synthesizes it as constraints
  plonk (module)                              — polynomial prove/verify for
                                                the synthesized constraints
                                                (transparent PIOP mode)
  fri (module)                                — succinct prove/verify: the
                                                same argument under Hades-
                                                Merkle + DEEP-FRI polynomial
                                                commitments (the reference's
                                                KZG capability, self-hosted)
  aggregate (module)                          — ONE succinct argument for B
                                                same-circuit instances
                                                (shared paths + FRI)
  serialize (module)                          — byte wire formats for
                                                proofs / aggregates / keys
  circuits (module)                           — in-circuit gadget library:
                                                sponge hash, arity-4 Merkle
                                                membership, and duplex-cipher
                                                gadgets + complete provable
                                                circuits for each model family
"""

from .params import (  # noqa: F401
    N_DIGITS,
    P,
    PARAMS,
    PARTIAL_ROUNDS,
    ROUNDS,
    TOTAL_FULL_ROUNDS,
    WIDTH,
    HadesParams,
)
from .gadget import Composer, Constraint, GadgetStrategy, Witness  # noqa: F401
from .ops.perm_ref import permute, permute_mont  # noqa: F401
from .strategy import ScalarStrategy, Strategy  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public constants mirroring the reference's exported arrays
    (reference: src/round_constants.rs:29 `ROUND_CONSTANTS`,
    src/mds_matrix.rs:18 `MDS_MATRIX`) as canonical Python ints. Lazy so
    importing the package never touches the asset decode path before a
    multi-host jax.distributed.initialize."""
    if name == "ROUND_CONSTANTS":
        from .params import round_constants_int

        return round_constants_int()
    if name == "MDS_MATRIX":
        from .params import mds_matrix_int

        return mds_matrix_int()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
