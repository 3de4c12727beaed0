"""Multi-host (pod-slice) compression: per-host file ranges, metadata
all-gather, ordered parallel splice.

The reference is strictly single-process/single-GPU (SURVEY.md §2.2.4);
this module is the distributed component the TPU rebuild adds on top of
the single-host MeshCodec.  The design (SURVEY.md §5 "Distributed
communication backend"):

  * compression needs zero cross-chip communication — packets are
    independent (per-packet model reset, src/cpu_compressor.cpp:159);
  * each host reads a packet-aligned byte range of the input and encodes
    it on its local devices;
  * the only communication is metadata: every host's compressed byte
    count is all-gathered (a few bytes per host over ICI/DCN), an
    exclusive scan turns counts into file offsets, and every host
    `pwrite`s its spliced body at its offset;
  * host 0 writes the 20-byte .gip header once the totals are known.

Decompression mirrors it: packet boundaries are data-dependent, so the
compressed stream is header-walked once (cheap: 4 bytes of header per
~8.5 KB packet) to build an index; packets are partitioned contiguously
across hosts; every host decodes its span and writes at deterministic raw
offsets (packet_index * UNCOMPRESSED_PACKET_SIZE).

All collective plumbing is isolated behind ``_allgather_sizes`` so the
range/offset/index math is pure and unit-testable without a pod
(tests/test_distributed.py); on a single process the module degrades to
the local pipeline exactly.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from gpuar_tpu import container
from gpuar_tpu.config import (
    PACKET_HEADER_LENGTH,
    UNCOMPRESSED_PACKET_SIZE,
)
from gpuar_tpu.utils.stats import CompressionInfo, ProgressMonitor


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX multi-host runtime (jax.distributed.initialize).

    On TPU pods the arguments are discovered from the environment; passing
    them explicitly supports manual clusters.  Safe to skip entirely for
    single-host runs.
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) when not distributed."""
    import jax

    return jax.process_index(), jax.process_count()


# --------------------------------------------------------------------------
# Pure planning helpers (unit-tested without any devices)
# --------------------------------------------------------------------------

def host_ranges(file_size: int, n_hosts: int,
                packet_size: int = UNCOMPRESSED_PACKET_SIZE
                ) -> list[tuple[int, int]]:
    """Split [0, file_size) into n_hosts packet-aligned (start, stop) ranges.

    Every range holds a whole number of packets; the final range carries
    the file tail.  Ranges are balanced to within one packet.
    """
    n_packets = -(-file_size // packet_size) if file_size else 0
    base, extra = divmod(n_packets, n_hosts)
    ranges = []
    start_pkt = 0
    for h in range(n_hosts):
        count = base + (1 if h < extra else 0)
        start = start_pkt * packet_size
        stop = min((start_pkt + count) * packet_size, file_size)
        ranges.append((min(start, file_size), max(stop, min(start, file_size))))
        start_pkt += count
    return ranges


def exclusive_scan(sizes: np.ndarray) -> np.ndarray:
    """Byte offsets for each host's body given per-host compressed sizes."""
    sizes = np.asarray(sizes, dtype=np.int64)
    out = np.zeros_like(sizes)
    np.cumsum(sizes[:-1], out=out[1:])
    return out


def walk_packet_index(stream, compressed_body_size: int,
                      block_size: int = 8 << 20) -> np.ndarray:
    """Scan the packet headers of a .gip body and return packet byte offsets
    (relative to the body start), plus a final sentinel offset.

    Reads the stream in large blocks and hops header-to-header; validates
    sizes as it goes (like the reference's header-then-body reads,
    src/gpu_compressor.cpp:299-310).
    """
    offsets = [0]
    buf = b""
    buf_base = 0          # file offset of buf[0]
    pos = 0               # current packet offset
    while pos < compressed_body_size:
        if pos + PACKET_HEADER_LENGTH > buf_base + len(buf):
            stream.seek(pos)
            buf = stream.read(min(block_size, compressed_body_size - pos))
            buf_base = pos
            if len(buf) < PACKET_HEADER_LENGTH:
                raise container.ContainerError(
                    "Incorrect file format: truncated packet header"
                )
        rel = pos - buf_base
        total, raw = container.packet_sizes(buf[rel:rel + PACKET_HEADER_LENGTH])
        container.validate_packet_header(total, raw, UNCOMPRESSED_PACKET_SIZE)
        pos += total
        offsets.append(pos)
    if pos != compressed_body_size:
        raise container.ContainerError(
            "Incorrect file format: packet overruns the declared size"
        )
    return np.asarray(offsets, dtype=np.int64)


def partition_packets(n_packets: int, n_hosts: int) -> list[tuple[int, int]]:
    """Contiguous (first, last) packet spans per host, balanced."""
    base, extra = divmod(n_packets, n_hosts)
    spans = []
    start = 0
    for h in range(n_hosts):
        count = base + (1 if h < extra else 0)
        spans.append((start, start + count))
        start += count
    return spans


# --------------------------------------------------------------------------
# Collective metadata exchange
# --------------------------------------------------------------------------

def _allgather_sizes(local_size: int) -> np.ndarray:
    """All-gather one int64 per host (identity on a single process)."""
    import jax

    if jax.process_count() == 1:
        return np.asarray([local_size], dtype=np.int64)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        np.asarray([local_size], dtype=np.int64)
    )
    return np.asarray(gathered, dtype=np.int64).reshape(-1)


def _barrier(name: str) -> None:
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


# --------------------------------------------------------------------------
# Distributed drive loops
# --------------------------------------------------------------------------

class DistributedCompressor:
    """Pod-slice compressor: every process runs this against a shared
    filesystem; behaves exactly like the local pipeline on one process.

    The local codec work is delegated to a per-process backend (by default
    the TPUCompressor over this host's local devices).
    """

    def __init__(self, backend=None):
        if backend is None:
            from gpuar_tpu.parallel.runner import TPUCompressor

            backend = TPUCompressor()
        self.backend = backend

    def compress(self, src: str | Path, dst: str | Path,
                 monitor: ProgressMonitor | None = None) -> CompressionInfo:
        import jax

        rank, world = process_info()
        monitor = monitor or ProgressMonitor(enabled=False)
        info = CompressionInfo()
        info.uncompressed_file_size = os.path.getsize(src)
        ranges = host_ranges(info.uncompressed_file_size, world)
        start, stop = ranges[rank]

        # Encode this host's packet range into an in-memory body.
        parts = []
        batch = self.backend.super_batch_packets * UNCOMPRESSED_PACKET_SIZE
        with open(src, "rb") as fin:
            fin.seek(start)
            todo = stop - start
            while todo > 0:
                chunk = fin.read(min(batch, todo))
                if not chunk:
                    break
                todo -= len(chunk)
                raw = np.frombuffer(chunk, dtype=np.uint8)
                packets, lengths = self.backend.encode_batch(raw)
                parts.extend(
                    packets[i, : lengths[i]] for i in range(packets.shape[0])
                )
                info.processed_uncompressed_size += len(chunk)
                monitor.update(info)
        body = np.concatenate(parts).tobytes() if parts else b""

        # Metadata exchange: sizes -> offsets; then ordered parallel splice.
        sizes = _allgather_sizes(len(body))
        offsets = exclusive_scan(sizes) + container.HEADER_LENGTH
        total = int(container.HEADER_LENGTH + sizes.sum())
        info.compressed_file_size = total

        if rank == 0:
            with open(dst, "wb") as f:
                f.truncate(total)
                f.write(
                    container.FileHeader(
                        uncompressed_size=info.uncompressed_file_size,
                        compressed_size=total,
                    ).to_bytes()
                )
        _barrier("gip-header-written")
        with open(dst, "r+b") as f:
            f.seek(int(offsets[rank]))
            f.write(body)
        _barrier("gip-bodies-written")
        monitor.finish()
        return info

    def decompress(self, src: str | Path, dst: str | Path,
                   monitor: ProgressMonitor | None = None) -> CompressionInfo:
        rank, world = process_info()
        monitor = monitor or ProgressMonitor(enabled=False)
        info = CompressionInfo()
        actual = os.path.getsize(src)
        with open(src, "rb") as fin:
            header = container.FileHeader.from_bytes(
                fin.read(container.HEADER_LENGTH), actual_file_size=actual
            )
            info.uncompressed_file_size = header.uncompressed_size
            info.compressed_file_size = header.compressed_size

            # Header walk -> packet index (every host walks independently;
            # the walk touches 4 bytes per ~8.5 KB packet).
            body = _BodyView(fin, container.HEADER_LENGTH)
            index = walk_packet_index(
                body, header.compressed_size - container.HEADER_LENGTH
            )
            n_packets = len(index) - 1
            first, last = partition_packets(n_packets, world)[rank]

            if rank == 0:
                with open(dst, "wb") as f:
                    f.truncate(info.uncompressed_file_size)
            _barrier("raw-file-sized")

            with open(dst, "r+b") as fout:
                done = 0
                for lo in range(first, last,
                                self.backend.super_batch_packets):
                    hi = min(lo + self.backend.super_batch_packets, last)
                    packets, raw_sizes = _load_packets(body, index, lo, hi)
                    raw = self.backend.decode_batch(packets, raw_sizes)
                    fout.seek(lo * UNCOMPRESSED_PACKET_SIZE)
                    for i in range(raw.shape[0]):
                        fout.write(raw[i, : raw_sizes[i]].tobytes())
                    done += int(raw_sizes.sum())
                    info.processed_uncompressed_size = done
                    monitor.update(info)
        _barrier("raw-bodies-written")
        monitor.finish()
        return info


class _BodyView:
    """Seek/read view of a file past a fixed header offset."""

    def __init__(self, stream, base: int):
        self._stream = stream
        self._base = base

    def seek(self, pos: int) -> None:
        self._stream.seek(self._base + pos)

    def read(self, n: int) -> bytes:
        return self._stream.read(n)


def _load_packets(body: "_BodyView", index: np.ndarray, lo: int, hi: int):
    """Load packets [lo, hi) into a fixed-stride batch."""
    from gpuar_tpu.config import COMPRESSED_PACKET_SIZE

    n = hi - lo
    packets = np.zeros((n, COMPRESSED_PACKET_SIZE), np.uint8)
    raw_sizes = np.zeros(n, np.int32)
    body.seek(int(index[lo]))
    blob = body.read(int(index[hi] - index[lo]))
    for i in range(n):
        a = int(index[lo + i] - index[lo])
        b = int(index[lo + i + 1] - index[lo])
        packets[i, : b - a] = np.frombuffer(blob[a:b], np.uint8)
        _, raw_sizes[i] = container.packet_sizes(blob[a:a + 4])
    return packets, raw_sizes
