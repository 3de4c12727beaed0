"""Interpret-mode coverage of the PAIR_STEP two-symbol kernels.

Round 5's algorithm-level probe (VERDICT r4 next #1/#2): exact two-symbol
steps — symbol 2's table search runs against the STALE read with the
suffix increment folded into the index-packed threshold
(C'[i] <= u2 <=> P[i] <= (u2 << 8) | sym1) plus closed-form +0/1 bound
fixups, both increments land in one merged nested-where pass, and encode
merges the pair's emission appends 4 -> 3.  Measured neutral-negative
on-chip (benchmarks/PROBES_r5.md), so PAIR_STEP defaults off — these
tests keep the pair paths bit-exact against the native golden codec
either way.

Reference behavior matched: jiahansu/GPUAR src/gpuar_kernel.cu
applySymbolRange :256-299 (encode pair) and :727-763 / :787-836 (the
decode loop being restructured).
"""

import numpy as np
import pytest

from gpuar_tpu import native
from gpuar_tpu.ops import pallas_decode, pallas_encode
from test_offset_state import _mixed_corpus


def test_pair_encode_bitstreams_match_golden(rng):
    P = 128
    data, sizes = _mixed_corpus(rng, 16, P)
    saved = pallas_encode.PAIR_STEP
    pallas_encode.PAIR_STEP = True
    try:
        pk, ln = pallas_encode.encode_batch_pallas(
            data, sizes, tile=8, packet_size=P, interpret=True)
    finally:
        pallas_encode.PAIR_STEP = saved
    for i in range(data.shape[0]):
        exp = native.encode_packet(data[i, : sizes[i]].tobytes())
        assert pk[i, : ln[i]].tobytes() == exp, \
            f"lane {i} (size {sizes[i]}) diverged"


@pytest.mark.parametrize("streams,hull,splitw,winonly",
                         [(1, True, False, False), (2, False, False, False),
                          (1, True, True, False), (1, False, True, False),
                          (1, True, False, True), (2, False, False, True)])
def test_pair_decode_roundtrip(rng, streams, hull, splitw, winonly):
    P = 256
    n = 256
    data, sizes = _mixed_corpus(rng, n, P)
    packets = np.zeros((n, P + 516), np.uint8)
    for i in range(n):
        enc = native.encode_packet(data[i, : sizes[i]].tobytes())
        packets[i, : len(enc)] = np.frombuffer(enc, np.uint8)
    D = pallas_decode
    saved = (D.PAIR_STEP, D.STREAMS, D.INTERPRET_STREAMS, D.PAIR_SPLITW,
             D.PAIR_WINONLY)
    D.PAIR_STEP, D.STREAMS, D.INTERPRET_STREAMS = True, streams, True
    D.PAIR_SPLITW, D.PAIR_WINONLY = splitw, winonly
    try:
        out = D.decode_batch_pallas(
            packets, sizes, tile=256 if streams > 1 else 8,
            packet_size=P, interpret=True, hull=hull)
    finally:
        (D.PAIR_STEP, D.STREAMS, D.INTERPRET_STREAMS,
         D.PAIR_SPLITW, D.PAIR_WINONLY) = saved
    for i in range(n):
        assert out[i, : sizes[i]].tobytes() == \
            data[i, : sizes[i]].tobytes(), f"lane {i}"


def test_pair_decode_debug_flags_clean(rng):
    """Debug mode under PAIR_STEP: valid packets raise nothing and the
    final bit cursors pass the overrun check (the pair advances the
    cursor once per two symbols — the bookkeeping must stay exact)."""
    P = 128
    data, sizes = _mixed_corpus(rng, 8, P)
    packets = np.zeros((8, P + 516), np.uint8)
    for i in range(8):
        enc = native.encode_packet(data[i, : sizes[i]].tobytes())
        packets[i, : len(enc)] = np.frombuffer(enc, np.uint8)
    D = pallas_decode
    saved = D.PAIR_STEP
    D.PAIR_STEP = True
    try:
        out = D.decode_batch_pallas(packets, sizes, tile=8, packet_size=P,
                                    interpret=True, debug=True)
    finally:
        D.PAIR_STEP = saved
    for i in range(8):
        assert out[i, : sizes[i]].tobytes() == \
            data[i, : sizes[i]].tobytes(), f"lane {i}"
