"""The weak-scaling sleep-codec control (benchmarks/sleep_backend.py) must
emit validly-framed packets — the size all-gather, offset scan and splice
in DistributedCompressor see exactly what the real codec would hand them —
and must spend its time sleeping, not computing, or the control measures
the contention it exists to remove."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.sleep_backend import SleepCompressor
from gpuar_tpu.config import (
    COMPRESSED_PACKET_SIZE,
    PACKET_HEADER_LENGTH,
    UNCOMPRESSED_PACKET_SIZE,
)

P = UNCOMPRESSED_PACKET_SIZE


def test_sleep_backend_framing(rng):
    raw = rng.integers(0, 256, 3 * P + 1234, np.uint8)
    be = SleepCompressor(gbps=100.0)
    packets, lengths = be.encode_fetch(be.encode_submit(raw))
    assert packets.shape == (4, COMPRESSED_PACKET_SIZE)
    # Headers parse like the real container: [u16 total][u16 raw size].
    for i in range(4):
        total = int(packets[i, 0]) | int(packets[i, 1]) << 8
        rsize = int(packets[i, 2]) | int(packets[i, 3]) << 8
        expect_raw = P if i < 3 else 1234
        assert total == lengths[i] == PACKET_HEADER_LENGTH + expect_raw
        assert rsize == expect_raw
        body = packets[i, 4: 4 + rsize]
        assert np.array_equal(body, raw[i * P: i * P + rsize])

    # Stored round-trip through the decode side.
    raw_sizes = np.array([P, P, P, 1234], np.int64)
    out = be.decode_fetch(be.decode_submit(packets, raw_sizes))
    flat = np.concatenate([out[i, :raw_sizes[i]] for i in range(4)])
    assert np.array_equal(flat, raw)


def test_sleep_backend_sleeps_not_burns(rng):
    raw = rng.integers(0, 256, 2 * P, np.uint8)
    be = SleepCompressor(gbps=0.001)  # 2*8192 bytes -> ~16 ms deadline
    t0 = time.perf_counter()
    h = be.encode_submit(raw)
    be.encode_fetch(h)
    elapsed = time.perf_counter() - t0
    assert elapsed >= 0.014, f"deadline not honoured: {elapsed}"

    # time_scale multiplies the emulated payload (--emulate-gib).
    be2 = SleepCompressor(gbps=0.001, time_scale=2.0)
    t0 = time.perf_counter()
    be2.encode_fetch(be2.encode_submit(raw))
    assert time.perf_counter() - t0 >= 0.030


def test_sleep_backend_serializes_device_time(rng):
    # A real device queues submitted batches: two in-flight batches must
    # cost the SUM of their device times, not the max (a concurrent-sleep
    # control would emulate a 2x-throughput device under submit-ahead and
    # skew whichever world size pipelines deeper).
    raw = rng.integers(0, 256, 2 * P, np.uint8)
    be = SleepCompressor(gbps=0.001)  # ~16 ms per 2-packet batch
    t0 = time.perf_counter()
    h1 = be.encode_submit(raw)
    h2 = be.encode_submit(raw)
    be.encode_fetch(h1)
    be.encode_fetch(h2)
    assert time.perf_counter() - t0 >= 0.028
