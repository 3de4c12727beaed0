"""Adaptive order-0 probability model.

The reference stores per-symbol cumulative frequencies in a Fenwick tree
(jiahansu/GPUAR src/gpuar_kernel.cu:205-238) because its per-thread coder is
scalar.  Here the model is an explicit cumulative-frequency row ``C[0..256]``
with ``C[i] = number of coded-or-initial occurrences of symbols < i``.  Both
representations store exactly the same counts, so every query returns the
same value and the emitted bitstreams are bit-identical; the explicit row is
the vector-friendly form (a symbol update is a masked suffix increment, a
range query is a gather, the decode search is a compare-and-count).

Model lifecycle (matches src/gpuar_kernel.cu:403-419):
  * init: every one of the 256 byte symbols has count 1, so C[i] = i and the
    cumulative probability starts at 256,
  * coding symbol ``c`` increments counts: C[i] += 1 for all i > c, and the
    cumulative probability increments by 1.

Because a packet holds at most 8192 symbols, the cumulative probability never
reaches MAX_PROBABILITY = 16384 and no rescaling is ever needed (guarded in
config.CodecConfig, mirroring src/compressor.cpp:13).
"""

from __future__ import annotations

import numpy as np

from gpuar_tpu.config import INITIAL_CUMULATIVE_PROB, MODEL_SIZE


def initial_cumfreq(dtype=np.int32) -> np.ndarray:
    """The freshly initialised cumulative-frequency row: C[i] = i."""
    return np.arange(MODEL_SIZE, dtype=dtype)


def initial_cumprob() -> int:
    return INITIAL_CUMULATIVE_PROB


class AdaptiveModel:
    """Scalar reference model used by the golden NumPy codec."""

    __slots__ = ("cumfreq", "cumprob")

    def __init__(self) -> None:
        self.cumfreq = initial_cumfreq()
        self.cumprob = initial_cumprob()

    def low_high(self, symbol: int) -> tuple[int, int]:
        """Cumulative range [C[c], C[c+1]) occupied by ``symbol``."""
        return int(self.cumfreq[symbol]), int(self.cumfreq[symbol + 1])

    def update(self, symbol: int) -> None:
        """Account one occurrence of ``symbol``."""
        self.cumfreq[symbol + 1 :] += 1
        self.cumprob += 1

    def find_symbol(self, unscaled: int) -> int:
        """Symbol whose cumulative range contains ``unscaled``.

        Equivalent to the reference's binary search over Fenwick prefix sums
        (src/gpuar_kernel.cu:727-763): the row is strictly increasing, so the
        answer is the count of entries C[1..256] <= unscaled.
        """
        return int(np.searchsorted(self.cumfreq, unscaled, side="right")) - 1
