"""User-facing strategy API, mirroring the reference crate's surface.

The reference's core design is one round-schedule engine with pluggable
backends: trait `Strategy` implements `perm` / `apply_full_round` /
`apply_partial_round` / `next_c` / `rounds` once as default methods, and
each backend supplies only the three primitive ops `add_round_key`,
`quintic_s_box`, `mul_matrix` (reference: src/strategies.rs:31-162).
This module preserves that separation: the `Strategy` base class IS the
schedule engine; `ScalarStrategy` executes the primitives on field
elements (reference: src/strategies/scalar.rs:13-50) and `GadgetStrategy`
(gadget.py) synthesizes them as PLONK constraints.

Unlike the reference's mutable-slice API, the batched array path is
functional and TPU-compiled — the idiomatic shape — while the width-5
int-list path runs the schedule engine directly (exact host arithmetic),
round-tripping the same way `&mut [BlsScalar; 5]` does.
"""

from __future__ import annotations

import numpy as np

from .params import (
    P,
    PARTIAL_ROUNDS,
    ROUNDS,
    TOTAL_FULL_ROUNDS,
    WIDTH,
    mds_matrix_int,
    round_constants_int,
)


class Strategy:
    """The backend-agnostic Hades round-schedule engine
    (reference: src/strategies.rs:31 trait + default methods).

    Subclasses implement the three primitive ops; the schedule methods
    below are shared verbatim across backends.
    """

    # -- the three primitive ops a backend must supply ----------------------

    def add_round_key(self, constants, words) -> None:
        """Add the next WIDTH round constants to the words in place
        (reference: src/strategies.rs:50-55)."""
        raise NotImplementedError

    def quintic_s_box(self, value):
        """x -> x^5 (reference: src/strategies.rs:57-59)."""
        raise NotImplementedError

    def mul_matrix(self, constants, values) -> None:
        """Multiply the state by the MDS matrix in place
        (reference: src/strategies.rs:61-65)."""
        raise NotImplementedError

    # -- shared schedule (default trait methods) -----------------------------

    @staticmethod
    def rounds() -> int:
        """Total round count (reference: src/strategies.rs:160-162)."""
        return ROUNDS

    @staticmethod
    def next_c(constants):
        """Consume the next ARK constant; exhausting the 960 preloaded
        constants is a hard error, mirroring the reference's panic
        "out of ARK constants" (src/strategies.rs:33-41) as an exception."""
        try:
            return next(constants)
        except StopIteration:
            raise RuntimeError("out of ARK constants") from None

    def apply_full_round(self, constants, words) -> None:
        """ARK -> quintic S-box on ALL words -> MDS
        (reference: src/strategies.rs:107-119)."""
        self.add_round_key(constants, words)
        for i in range(len(words)):
            words[i] = self.quintic_s_box(words[i])
        self.mul_matrix(constants, words)

    def apply_partial_round(self, constants, words) -> None:
        """ARK (all words) -> S-box on the LAST word -> MDS
        (reference: src/strategies.rs:79-93)."""
        self.add_round_key(constants, words)
        words[-1] = self.quintic_s_box(words[-1])
        self.mul_matrix(constants, words)

    def perm(self, data) -> None:
        """The 67-round permutation, in place; the constants iterator
        restarts at 0 each call (reference: src/strategies.rs:140-157)."""
        if len(data) != WIDTH:
            raise ValueError(f"state must have exactly {WIDTH} words")
        constants = iter(round_constants_int())
        half = TOTAL_FULL_ROUNDS // 2
        for _ in range(half):
            self.apply_full_round(constants, data)
        for _ in range(PARTIAL_ROUNDS):
            self.apply_partial_round(constants, data)
        for _ in range(half):
            self.apply_full_round(constants, data)


class ScalarStrategy(Strategy):
    """Executes the permutation on actual field elements
    (reference: src/strategies/scalar.rs:13-50).

    Two call paths:
      * `perm(list_of_5_ints)` — in-place on a width-5 list, via the
        schedule engine in exact host arithmetic (the reference shape);
        also returns the list for convenience.
      * `perm(array)` — batched (..., WIDTH, N_DIGITS) uint32 canonical
        digits through the compiled backend: "ref" (pure-JAX oracle),
        "pallas" (fused TPU kernel), or "native" (the C++ host engine,
        native/hades_cpu.cpp). Bit-identical across backends.
    """

    def __init__(self, backend: str = "ref"):
        if backend == "ref":
            from .ops.perm_ref import permute

            self._permute = permute
        elif backend == "pallas":
            from .ops.perm_pallas import permute_pallas
            from .params import N_DIGITS

            def permute_leading(values):
                arr = np.asarray(values)
                flat = arr.reshape(-1, WIDTH, N_DIGITS)
                return np.asarray(permute_pallas(flat)).reshape(arr.shape)

            self._permute = permute_leading
        elif backend == "native":
            from .params import N_DIGITS
            from .utils import native

            def permute_native(values):
                arr = np.asarray(values)
                flat = arr.reshape(-1, WIDTH, N_DIGITS)
                return native.perm_batch_digits(flat).reshape(arr.shape)

            self._permute = permute_native
        else:
            raise ValueError(f"unknown backend: {backend}")

    # primitive ops on canonical Python ints (reference: scalar.rs:22-50)

    def add_round_key(self, constants, words) -> None:
        for i in range(len(words)):
            words[i] = (words[i] + self.next_c(constants)) % P

    def quintic_s_box(self, value):
        return pow(value, 5, P)

    def mul_matrix(self, constants, values) -> None:
        # the scalar backend ignores the constants iterator here
        # (reference: scalar.rs:36); j-ascending accumulation (scalar.rs:40-48)
        mds = mds_matrix_int()
        values[:] = [
            sum(mds[k][j] * values[j] for j in range(WIDTH)) % P
            for k in range(WIDTH)
        ]

    def perm(self, values):
        if isinstance(values, (list, tuple)):
            if len(values) != WIDTH:
                raise ValueError(f"state must have exactly {WIDTH} words")
            words = [int(v) % P for v in values]
            Strategy.perm(self, words)
            if isinstance(values, list):
                values[:] = words  # in-place, like &mut [BlsScalar; 5]
            return words
        values = np.asarray(values)
        if values.ndim < 2 or values.shape[-2] != WIDTH:
            raise ValueError(f"state must be (..., {WIDTH}, N_DIGITS)")
        return self._permute(values)
