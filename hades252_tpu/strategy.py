"""User-facing strategy API, mirroring the reference crate's surface.

The reference exposes a `Strategy` trait with two implementations:
`ScalarStrategy` (executes the permutation on field elements,
reference: src/strategies/scalar.rs:13-50) and `GadgetStrategy` (synthesizes
it as PLONK constraints, reference: src/strategies/gadget.rs). This module
provides the execution side; `gadget.py` provides the synthesis side. Unlike
the reference's mutable-slice API, `perm` here is batched and functional —
the TPU-idiomatic shape — but a width-5 list of Python ints round-trips the
same way `&mut [BlsScalar; 5]` does.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .params import P, WIDTH
from .utils.encoding import digits_to_ints, ints_to_digits


class Strategy:
    """Abstract Hades252 strategy (reference: src/strategies.rs:31 trait)."""

    def perm(self, values):
        raise NotImplementedError

    @staticmethod
    def rounds() -> int:
        """Total round count (reference: src/strategies.rs:160-162)."""
        from .params import ROUNDS

        return ROUNDS


class ScalarStrategy(Strategy):
    """Executes the permutation on actual field elements.

    backend:
      "ref"    — pure-JAX oracle (ops/perm_ref.py), runs anywhere.
      "pallas" — fused TPU kernel (ops/perm_pallas.py).
    """

    def __init__(self, backend: str = "ref"):
        if backend == "ref":
            from .ops.perm_ref import permute

            self._permute = permute
        elif backend == "pallas":
            from .ops.perm_pallas import permute_pallas

            self._permute = permute_pallas
        else:
            raise ValueError(f"unknown backend: {backend}")

    def perm(self, values):
        """Permute field elements.

        Accepts either a sequence of WIDTH Python ints (returns a list of
        ints, matching the reference's `perm(&mut [BlsScalar; 5])`) or a
        (..., WIDTH, N_DIGITS) uint32 digit array (returns the same).
        """
        if isinstance(values, (list, tuple)):
            if len(values) != WIDTH:
                raise ValueError(f"state must have exactly {WIDTH} words")
            digits = ints_to_digits([int(v) % P for v in values])[None]
            out = np.asarray(self._permute(digits))[0]
            return [int(v) for v in digits_to_ints(out)]
        values = np.asarray(values)
        if values.ndim < 2 or values.shape[-2] != WIDTH:
            raise ValueError(f"state must be (..., {WIDTH}, N_DIGITS)")
        return self._permute(values)
