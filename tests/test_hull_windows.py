"""Mid-stream transitions of the hull-windowed model ops.

Encode selects the [0,128)-row windowed chunk variant per chunk from the
input's high-bit test; decode BETS on the window and falls back (table
snapshot restore + sticky tile) on the first miss.  These tests pin the
transition seams: committed windowed chunks followed by a miss, hull
flips between chunks, and deferred high-row updates interleaving with
full-range chunks — all bit-exact against the golden codec.
"""

import numpy as np

from gpuar_tpu import native
from gpuar_tpu.ops.pallas_decode import decode_batch_pallas
from gpuar_tpu.ops.pallas_encode import encode_batch_pallas

PSIZE = 1024  # 8 chunks of 32 words: several window transitions per packet


def _roundtrip(data, sizes):
    packets, lengths = encode_batch_pallas(
        data, sizes, tile=8, packet_size=PSIZE, interpret=True)
    for i in range(data.shape[0]):
        exp = native.encode_packet(data[i, : sizes[i]].tobytes())
        assert packets[i, : lengths[i]].tobytes() == exp, f"lane {i}"
    out = decode_batch_pallas(packets, sizes, tile=8, packet_size=PSIZE,
                              interpret=True)
    for i in range(data.shape[0]):
        assert np.array_equal(out[i, : sizes[i]], data[i, : sizes[i]]), \
            f"decode lane {i}"


def test_ascii_then_binary_sections(rng):
    """Chunks 0-3 pure ASCII (windowed, committed, deferred adds), chunks
    4+ full-range: the decode tile goes sticky mid-packet AFTER several
    committed windowed chunks — the transition must splice exactly."""
    data = np.zeros((8, PSIZE), np.uint8)
    for i in range(8):
        data[i, : PSIZE // 2] = rng.integers(32, 127, PSIZE // 2, np.uint8)
        data[i, PSIZE // 2:] = rng.integers(0, 256, PSIZE // 2, np.uint8)
    sizes = np.full(8, PSIZE, np.int32)
    _roundtrip(data, sizes)


def test_binary_then_ascii_sections(rng):
    """The reverse seam: the decode tile is sticky-full from chunk 0 and
    must stay correct through later all-ASCII chunks (encode flips back
    to windowed per chunk; decode stays full)."""
    data = np.zeros((8, PSIZE), np.uint8)
    for i in range(8):
        data[i, : PSIZE // 2] = rng.integers(128, 256, PSIZE // 2, np.uint8)
        data[i, PSIZE // 2:] = rng.integers(32, 127, PSIZE // 2, np.uint8)
    sizes = np.full(8, PSIZE, np.int32)
    _roundtrip(data, sizes)


def test_single_high_byte_flips_one_chunk(rng):
    """One high byte in one chunk of one lane: that chunk alone loses the
    encode window, and the decode tile goes sticky exactly there."""
    data = rng.integers(32, 127, (8, PSIZE), np.uint8)
    data[3, 500] = 200
    sizes = np.full(8, PSIZE, np.int32)
    _roundtrip(data, sizes)


def test_boundary_symbols_127_128(rng):
    """Symbols hugging the window edge: 127 stays in-window (its `high`
    comes from the carried C[128]); 128 must miss."""
    data = np.full((4, PSIZE), 127, np.uint8)
    data[1, ::7] = 128                  # misses sprinkled through every chunk
    data[2] = rng.integers(120, 136, PSIZE, np.uint8)  # straddles the edge
    data[3, :512] = 127
    data[3, 512:] = 128
    sizes = np.full(4, PSIZE, np.int32)
    _roundtrip(data, sizes)


def test_ragged_tails_with_windows(rng):
    """Short packets (inactive lanes mid-chunk) through both window
    paths: the deferred high-row update counts only active symbols."""
    data = np.zeros((6, PSIZE), np.uint8)
    sizes = np.asarray([PSIZE, 1, 100, 513, PSIZE - 1, 0], np.int32)
    for i, n in enumerate(sizes):
        data[i, :n] = rng.integers(32, 127, n, np.uint8)
    data[4, : sizes[4]] = rng.integers(0, 256, sizes[4], np.uint8)
    _roundtrip(data, sizes)
