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
