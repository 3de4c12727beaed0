"""Interpret-mode coverage of the OFFSET_STATE coder-state layout.

Both kernels can carry (lower, R = span[, D = code - lower]) instead of
(lower, upper[, code]): every renormalisation shift doubles the range
exactly and the straddle's -0x4000 cancels in code - lower, so the span
recompute, the up3 reconstruction and decode's straddle xor drop off the
per-symbol serial chain.  These tests pin bit-exactness of that algebra
against the native golden codec before any on-chip measurement
(benchmarks/probe_decode_r3.py --offset).

Reference behavior matched: jiahansu/GPUAR src/gpuar_kernel.cu
applySymbolRange :256-299 + writeEncodedBits :321-367 (encode) and
arDecompress :848-892 (decode) — same bitstreams, different state basis.
"""

import numpy as np
import pytest

from gpuar_tpu import native
from gpuar_tpu.ops import pallas_decode, pallas_encode
from gpuar_tpu.ops.pallas_encode import out_geometry


def _mixed_corpus(rng, n, P):
    """Content classes that exercise every renorm shape: random (full
    range), ASCII (hull window), skewed (long underflow runs), zeros."""
    data = np.zeros((n, P), np.uint8)
    q = n // 4
    data[:q] = rng.integers(0, 256, (q, P), np.uint8)
    data[q: 2 * q] = rng.integers(32, 127, (q, P), np.uint8)
    data[2 * q: 3 * q] = rng.integers(0, 3, (q, P), np.uint8)
    sizes = np.full(n, P, np.int32)
    sizes[-4:] = [1, 7, P - 1, P]  # ragged tails
    for i in range(n - 4, n):
        data[i, sizes[i]:] = 0
    return data, sizes


def test_offset_encode_bitstreams_match_golden(rng):
    P = 128
    data, sizes = _mixed_corpus(rng, 16, P)
    saved = pallas_encode.OFFSET_STATE
    pallas_encode.OFFSET_STATE = True
    try:
        pk, ln = pallas_encode.encode_batch_pallas(
            data, sizes, tile=8, packet_size=P, interpret=True)
    finally:
        pallas_encode.OFFSET_STATE = saved
    for i in range(data.shape[0]):
        exp = native.encode_packet(data[i, : sizes[i]].tobytes())
        assert pk[i, : ln[i]].tobytes() == exp, \
            f"lane {i} (size {sizes[i]}) diverged"


@pytest.mark.parametrize("streams,stacked",
                         [(1, False), (2, False), (2, True)])
def test_offset_decode_roundtrip(rng, streams, stacked):
    P = 256
    n = 256
    data, sizes = _mixed_corpus(rng, n, P)
    enc = [native.encode_packet(data[i, : sizes[i]].tobytes())
           for i in range(n)]
    _, out_words = out_geometry(P)
    pk = np.zeros((n, out_words * 4), np.uint8)
    for i, e in enumerate(enc):
        pk[i, : len(e)] = np.frombuffer(e, np.uint8)

    saved = (pallas_decode.OFFSET_STATE, pallas_decode.INTERPRET_STREAMS,
             pallas_decode.STACK_SCALAR)
    pallas_decode.OFFSET_STATE = True
    pallas_decode.INTERPRET_STREAMS = streams > 1
    pallas_decode.STACK_SCALAR = stacked
    try:
        out = pallas_decode.decode_batch_pallas(
            pk, sizes, tile=256, packet_size=P, interpret=True)
    finally:
        (pallas_decode.OFFSET_STATE, pallas_decode.INTERPRET_STREAMS,
         pallas_decode.STACK_SCALAR) = saved
    for i in range(n):
        assert out[i, : sizes[i]].tobytes() == \
            data[i, : sizes[i]].tobytes(), f"lane {i} (size {sizes[i]})"


def test_offset_debug_flags_still_fire(rng):
    """--debug parity must survive the state change: the range-inversion
    check moves to R2 <= 0 and the overrun cursor rides row 3 as before.
    A compressible packet whose bitstream is replaced by noise consumes
    far more bits than the frame holds (the overrun signature)."""
    from gpuar_tpu.container import ContainerError

    P = 128
    n = 8
    data = np.zeros((n, P), np.uint8)
    data[:4] = rng.integers(0, 256, (4, P), np.uint8)
    sizes = np.full(n, P, np.int32)
    enc = [native.encode_packet(data[i].tobytes()) for i in range(n)]
    _, out_words = out_geometry(P)
    pk = np.zeros((n, out_words * 4), np.uint8)
    for i, e in enumerate(enc):
        pk[i, : len(e)] = np.frombuffer(e, np.uint8)
    # Replace a compressible packet's body with noise (header intact).
    pk[5, 4: len(enc[5])] = rng.integers(0, 256, len(enc[5]) - 4, np.uint8)

    saved = pallas_decode.OFFSET_STATE
    pallas_decode.OFFSET_STATE = True
    try:
        # Release mode: silent garbage, clean lanes intact.
        out = pallas_decode.decode_batch_pallas(
            pk, sizes, tile=8, packet_size=P, interpret=True)
        for i in range(n):
            if i != 5:
                assert out[i].tobytes() == data[i].tobytes(), f"lane {i}"
        assert out[5].tobytes() != data[5].tobytes()
        # Debug mode: the corrupted packet is named.
        with pytest.raises(ContainerError, match=r"packets \[5\]"):
            pallas_decode.decode_batch_pallas(
                pk, sizes, tile=8, packet_size=P, interpret=True,
                debug=True)
    finally:
        pallas_decode.OFFSET_STATE = saved
