"""Interpret-mode coverage of the multi-stream decode layouts.

The compiled TPU kernel runs STREAMS=2 (and optionally STACK_SCALAR);
interpret mode normally forces 1 stream, so until round 3 these paths
had no CPU test at all.  INTERPRET_STREAMS honors the knobs on tiny
tiles: tile=256 is the smallest multi-stream tile (stream slices must be
whole 128-lane vregs), psize=256 gives two time-chunks so the
speculative window's sticky transition crosses a chunk boundary.

Reference behavior matched: jiahansu/GPUAR src/gpuar_kernel.cu
arDecompress :848-892 (the serial coder both layouts must reproduce
bit-for-bit).
"""

import numpy as np
import pytest

from gpuar_tpu import native
from gpuar_tpu.ops import pallas_decode
from gpuar_tpu.ops.pallas_encode import out_geometry


@pytest.mark.parametrize("stacked", [False, True])
def test_two_stream_interpret_roundtrip(rng, stacked):
    P = 256
    n = 256  # one full tile=256: stream 1 starts at lane 128
    data = np.zeros((n, P), np.uint8)
    data[:96] = rng.integers(0, 256, (96, P), np.uint8)      # sticky-full
    data[96:192] = rng.integers(32, 127, (96, P), np.uint8)  # win commits
    data[192:250] = rng.integers(0, 4, (58, P), np.uint8)    # skewed
    sizes = np.full(n, P, np.int32)
    sizes[250:] = [0, 1, 7, 100, 255, 256]  # ragged tails on stream 1
    for i in range(250, n):
        data[i, sizes[i]:] = 0

    enc = [native.encode_packet(data[i, : sizes[i]].tobytes())
           for i in range(n)]
    _, out_words = out_geometry(P)
    pk = np.zeros((n, out_words * 4), np.uint8)
    for i, e in enumerate(enc):
        pk[i, : len(e)] = np.frombuffer(e, np.uint8)

    saved = (pallas_decode.INTERPRET_STREAMS, pallas_decode.STACK_SCALAR)
    pallas_decode.INTERPRET_STREAMS = True
    pallas_decode.STACK_SCALAR = stacked
    try:
        out = pallas_decode.decode_batch_pallas(
            pk, sizes, tile=256, packet_size=P, interpret=True)
    finally:
        (pallas_decode.INTERPRET_STREAMS,
         pallas_decode.STACK_SCALAR) = saved
    for i in range(n):
        assert out[i, : sizes[i]].tobytes() == \
            data[i, : sizes[i]].tobytes(), f"lane {i} (size {sizes[i]})"


def test_three_stream_interpret_roundtrip(rng):
    """STREAMS=3 (the tile=1536 on-chip candidate: three w=512 chains);
    interpret twin at tile=384 = 3 x 128-lane slices."""
    P = 256
    n = 384
    data = np.zeros((n, P), np.uint8)
    data[:128] = rng.integers(0, 256, (128, P), np.uint8)     # sticky-full
    data[128:256] = rng.integers(32, 127, (128, P), np.uint8)  # win commits
    data[256:378] = rng.integers(0, 4, (122, P), np.uint8)    # skewed
    sizes = np.full(n, P, np.int32)
    sizes[378:] = [0, 1, 7, 100, 255, 256]  # ragged tails on stream 2
    for i in range(378, n):
        data[i, sizes[i]:] = 0

    enc = [native.encode_packet(data[i, : sizes[i]].tobytes())
           for i in range(n)]
    _, out_words = out_geometry(P)
    pk = np.zeros((n, out_words * 4), np.uint8)
    for i, e in enumerate(enc):
        pk[i, : len(e)] = np.frombuffer(e, np.uint8)

    saved = (pallas_decode.INTERPRET_STREAMS, pallas_decode.STREAMS)
    pallas_decode.INTERPRET_STREAMS = True
    pallas_decode.STREAMS = 3
    try:
        out = pallas_decode.decode_batch_pallas(
            pk, sizes, tile=384, packet_size=P, interpret=True)
    finally:
        (pallas_decode.INTERPRET_STREAMS,
         pallas_decode.STREAMS) = saved
    for i in range(n):
        assert out[i, : sizes[i]].tobytes() == \
            data[i, : sizes[i]].tobytes(), f"lane {i} (size {sizes[i]})"


@pytest.mark.parametrize("streams,offset", [(2, False), (2, True),
                                            (3, False)])
def test_xdiv_interpret_roundtrip(rng, streams, offset):
    """XDIV (cross-stream paired div: one [2*S, w] exact-div per symbol
    position) must be bit-identical to the per-stream PAIRED_DIV path —
    the quotients are the same values, only the issue grouping changes.
    Swept with OFFSET_STATE since the two knobs share the q rows."""
    P = 256
    n = 128 * streams
    data = np.zeros((n, P), np.uint8)
    third = n // 3
    data[:third] = rng.integers(0, 256, (third, P), np.uint8)
    data[third:2 * third] = rng.integers(32, 127, (third, P), np.uint8)
    data[2 * third:n - 6] = rng.integers(0, 4, (n - 6 - 2 * third, P),
                                         np.uint8)
    sizes = np.full(n, P, np.int32)
    sizes[n - 6:] = [0, 1, 7, 100, 255, 256]
    for i in range(n - 6, n):
        data[i, sizes[i]:] = 0

    enc = [native.encode_packet(data[i, : sizes[i]].tobytes())
           for i in range(n)]
    _, out_words = out_geometry(P)
    pk = np.zeros((n, out_words * 4), np.uint8)
    for i, e in enumerate(enc):
        pk[i, : len(e)] = np.frombuffer(e, np.uint8)

    saved = (pallas_decode.INTERPRET_STREAMS, pallas_decode.STREAMS,
             pallas_decode.XDIV, pallas_decode.OFFSET_STATE)
    pallas_decode.INTERPRET_STREAMS = True
    pallas_decode.STREAMS = streams
    pallas_decode.XDIV = True
    pallas_decode.OFFSET_STATE = offset
    try:
        out = pallas_decode.decode_batch_pallas(
            pk, sizes, tile=128 * streams, packet_size=P, interpret=True)
    finally:
        (pallas_decode.INTERPRET_STREAMS, pallas_decode.STREAMS,
         pallas_decode.XDIV, pallas_decode.OFFSET_STATE) = saved
    for i in range(n):
        assert out[i, : sizes[i]].tobytes() == \
            data[i, : sizes[i]].tobytes(), f"lane {i} (size {sizes[i]})"
