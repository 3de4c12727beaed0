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

Decompression mirrors it: packet boundaries are data-dependent, so rank 0
header-walks the compressed stream once (a streaming pass over the body)
to build the packet index (compressed AND raw offsets, from the per-packet
headers) and broadcasts it; packets are partitioned contiguously across
hosts; every host decodes its span and writes at its walked raw offset.

All collective plumbing is isolated behind ``_allgather_sizes`` so the
range/offset/index math is pure and unit-testable without a pod
(tests/test_distributed.py); on a single process the module degrades to
the local pipeline exactly.
"""

from __future__ import annotations

import itertools
import os
from pathlib import Path

import numpy as np

from gpuar_tpu import container
from gpuar_tpu.config import (
    PACKET_HEADER_LENGTH,
    UNCOMPRESSED_PACKET_SIZE,
)
from gpuar_tpu.pipeline import _hull_hint, _splice
from gpuar_tpu.utils.stats import CompressionInfo, ProgressMonitor, SplitTimer


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
    """Scan the packet headers of a .gip body and return a [2, n+1] index:
    row 0 = compressed byte offsets of each packet (relative to the body
    start), row 1 = raw (decoded) byte offsets; both end with a sentinel
    total.

    Raw offsets come from the per-packet raw-size headers, so short
    non-final packets (legal in the container) land at the right place.
    Reads the stream in large blocks and hops header-to-header; validates
    sizes as it goes (like the reference's header-then-body reads,
    src/gpu_compressor.cpp:299-310).
    """
    offsets = [0]
    raw_offsets = [0]
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
        raw_offsets.append(raw_offsets[-1] + raw)
    if pos != compressed_body_size:
        raise container.ContainerError(
            "Incorrect file format: packet overruns the declared size"
        )
    return np.asarray([offsets, raw_offsets], dtype=np.int64)


def walk_packet_index_chunks(stream, compressed_body_size: int,
                             chunk_packets: int,
                             block_size: int = 8 << 20):
    """Incremental walk_packet_index: yields [2, k+1] segments of at most
    chunk_packets packets (absolute offsets, same layout) as the walk
    progresses, so decoding can start after ONE segment instead of after
    a full-archive read (the de-serialized prologue, VERDICT r2 item 4).
    """
    buf = b""
    buf_base = 0
    pos = 0
    raw_pos = 0
    offsets = [0]
    raw_offsets = [0]
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
        total, raw = container.packet_sizes(
            buf[rel:rel + PACKET_HEADER_LENGTH])
        container.validate_packet_header(total, raw, UNCOMPRESSED_PACKET_SIZE)
        pos += total
        raw_pos += raw
        offsets.append(pos)
        raw_offsets.append(raw_pos)
        if len(offsets) == chunk_packets + 1:
            yield np.asarray([offsets, raw_offsets], dtype=np.int64)
            offsets = [pos]
            raw_offsets = [raw_pos]
    if pos != compressed_body_size:
        raise container.ContainerError(
            "Incorrect file format: packet overruns the declared size"
        )
    if len(offsets) > 1:
        yield np.asarray([offsets, raw_offsets], dtype=np.int64)


# --------------------------------------------------------------------------
# Collective metadata exchange
# --------------------------------------------------------------------------

def _split_u32(values: np.ndarray) -> np.ndarray:
    """int64 array -> stacked [2, ...] uint32 (high, low) halves.

    JAX canonicalizes int64 collectives to int32 unless jax_enable_x64 is
    set (which this library never forces on the host program), silently
    wrapping pod-scale byte offsets; 32-bit payloads pass through
    untouched, so every int64 crosses the collectives as two u32 halves.
    """
    v = np.asarray(values, dtype=np.int64)
    return np.stack([(v >> 32).astype(np.uint32),
                     (v & 0xFFFFFFFF).astype(np.uint32)])


def _join_u32(halves: np.ndarray) -> np.ndarray:
    """Inverse of _split_u32."""
    h = np.asarray(halves)
    return (h[0].astype(np.int64) << 32) | h[1].astype(np.int64)


def _allgather_sizes(local_size: int) -> np.ndarray:
    """All-gather one int64 per host (identity on a single process)."""
    import jax

    if jax.process_count() == 1:
        return np.asarray([local_size], dtype=np.int64)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(_split_u32([local_size]))
    sizes = _join_u32(np.moveaxis(np.asarray(gathered), 1, 0)).reshape(-1)
    if sizes[jax.process_index()] != local_size:
        raise RuntimeError(
            "all-gather round-trip mismatch: "
            f"{sizes[jax.process_index()]} != {local_size}")
    return sizes


def _barrier(name: str) -> None:
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def _segment_stream(body, body_size: int, rank: int, world: int,
                    chunk_packets: int, group_max: int | None = None):
    """Yield packet-index segments ([2, k+1] ABSOLUTE offsets) on every
    rank: rank 0 walks the body incrementally and broadcasts the index
    as it is found, so no host reads the whole archive before parallel
    decode starts (time-to-first-decoded-byte is archive-size
    independent).  World 1 degrades to the plain incremental walk.

    Broadcasts are GROUPED geometrically (1, 2, 4, ... up to group_max
    segments per collective): a Gloo broadcast costs ~10 ms x world of
    pure latency, serial within the stream, so per-segment collectives
    rate-limit decode once world x segment count grows (measured: world 8
    on the sleep control went 5.5 s wall vs ~1.0 s of device time with
    one collective per segment).  The first broadcast still carries a
    single segment, keeping time-to-first-decoded-byte one segment; the
    total packet count K rides in the pad's last column (K == 0
    terminates) and receivers re-slice the combined index into
    chunk_packets-sized segments locally (exact because every walked
    segment except the final one is full)."""
    if world == 1:
        yield from walk_packet_index_chunks(body, body_size, chunk_packets)
        return
    from jax.experimental import multihost_utils

    if group_max is None:
        group_max = max(8, 2 * world)
    pad = np.zeros((2, group_max * chunk_packets + 2), np.int64)
    if rank == 0:
        walker = walk_packet_index_chunks(body, body_size, chunk_packets)
        group_size = 1
        while True:
            group = list(itertools.islice(walker, group_size))
            total = sum(s.shape[1] - 1 for s in group)
            pad[0, -1] = total
            # Spare slot carries the walker's segment size: re-slicing
            # (and round-robin ownership) silently corrupts output if
            # hosts disagree on super_batch_packets, so receivers check.
            pad[1, -1] = chunk_packets
            pos = 0
            for s in group:
                # Adjacent segments share their join column (identical
                # values), so overlapping writes splice exactly.
                pad[:, pos: pos + s.shape[1]] = s
                pos += s.shape[1] - 1
            multihost_utils.broadcast_one_to_all(_split_u32(pad))
            if total == 0:
                return
            yield from group
            group_size = min(group_size * 2, group_max)
    else:
        while True:
            got = _join_u32(np.asarray(multihost_utils.broadcast_one_to_all(
                _split_u32(pad))))
            total = int(got[0, -1])
            if total == 0:
                return
            if int(got[1, -1]) != chunk_packets:
                raise RuntimeError(
                    "segment-stream chunk mismatch: rank 0 walks "
                    f"{int(got[1, -1])} packets/segment, this rank expects "
                    f"{chunk_packets} — hosts must configure the same "
                    "super_batch_packets")
            for lo in range(0, total, chunk_packets):
                hi = min(lo + chunk_packets, total)
                yield got[:, lo: hi + 1]


class _IterPrefetcher:
    """Drain an iterator on a daemon thread into a bounded queue.

    Used to pull the segment-index stream (and its per-segment broadcast
    collectives) OFF the decode critical path: the thread runs the walk
    and the collectives ahead of the main loop, so by the time a rank
    needs segment N+1 its index is already local.  Collective ordering
    stays valid: each rank issues the stream's collectives from exactly
    one thread, in stream order, and the main loop drains the stream to
    exhaustion (thread done, all collectives issued) before the final
    barrier.  Iterator errors re-raise on the consumer side."""

    _DONE = object()

    def __init__(self, it, depth: int = 8):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._err = None
        self._t = threading.Thread(
            target=self._run, args=(it,), daemon=True)
        self._t.start()

    def _run(self, it):
        try:
            for item in it:
                self._q.put(item)
        except BaseException as exc:  # re-raised on the consumer thread
            self._err = exc
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            self._t.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


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
                 monitor: ProgressMonitor | None = None,
                 resume: bool = False) -> CompressionInfo:
        import tempfile

        if resume:
            raise ValueError(
                "--resume is not supported with --multihost (the offsets of "
                "every host's body change when any range is re-encoded)")

        rank, world = process_info()
        # Progress is reported rank-locally (against this host's range) and
        # printed by rank 0 only, to keep a shared stdout readable.
        monitor = monitor or ProgressMonitor(enabled=False)
        monitor.enabled = monitor.enabled and rank == 0
        monitor.reset()
        info = CompressionInfo()
        process, io = SplitTimer(), SplitTimer()
        info.uncompressed_file_size = os.path.getsize(src)
        ranges = host_ranges(info.uncompressed_file_size, world)
        start, stop = ranges[rank]
        local = CompressionInfo(uncompressed_file_size=stop - start)

        # Encode this host's packet range, spooling the spliced body to a
        # temp file so memory stays bounded by one super-batch.
        batch = self.backend.super_batch_packets * UNCOMPRESSED_PACKET_SIZE
        with open(src, "rb") as fin, \
                tempfile.TemporaryFile(dir=os.path.dirname(
                    os.path.abspath(dst))) as spool:
            with io:
                fin.seek(start)
            todo = stop - start
            body_size = 0
            # Same submit-ahead overlap as the local drive loop: the
            # devices run batch N+1 while this host spools batch N.
            pending = None  # (handle, chunk_len)
            while todo > 0 or pending is not None:
                handle = None
                if todo > 0:
                    with io:
                        chunk = fin.read(min(batch, todo))
                    todo -= len(chunk)
                    if chunk:
                        with process:
                            raw = np.frombuffer(chunk, dtype=np.uint8)
                            handle = (self.backend.encode_submit(raw),
                                      len(chunk))
                    else:
                        todo = 0
                if pending is not None:
                    h, chunk_len = pending
                    with process:
                        packets, lengths = self.backend.encode_fetch(h)
                        piece = _splice(packets, lengths)
                    with io:
                        spool.write(piece)
                    body_size += len(piece)
                    local.processed_uncompressed_size += chunk_len
                    monitor.update(local)
                pending = handle

            # Metadata exchange: sizes -> offsets; ordered parallel splice.
            sizes = _allgather_sizes(body_size)
            offsets = exclusive_scan(sizes) + container.HEADER_LENGTH
            total = int(container.HEADER_LENGTH + sizes.sum())
            info.compressed_file_size = total
            info.processed_uncompressed_size = info.uncompressed_file_size

            if rank == 0:
                with io, open(dst, "wb") as f:
                    f.truncate(total)
                    f.write(
                        container.FileHeader(
                            uncompressed_size=info.uncompressed_file_size,
                            compressed_size=total,
                        ).to_bytes()
                    )
            _barrier("gip-header-written")
            with io, open(dst, "r+b") as f:
                f.seek(int(offsets[rank]))
                spool.seek(0)
                while True:
                    blk = spool.read(64 << 20)
                    if not blk:
                        break
                    f.write(blk)
        _barrier("gip-bodies-written")
        monitor.finish()
        info.process_time = process.total
        info.io_time = io.total
        return info

    def decompress(self, src: str | Path, dst: str | Path,
                   monitor: ProgressMonitor | None = None) -> CompressionInfo:
        rank, world = process_info()
        monitor = monitor or ProgressMonitor(enabled=False)
        monitor.enabled = monitor.enabled and rank == 0
        monitor.reset()
        info = CompressionInfo()
        process, io = SplitTimer(), SplitTimer()
        actual = os.path.getsize(src)
        with open(src, "rb") as fin:
            with io:
                header = container.FileHeader.from_bytes(
                    fin.read(container.HEADER_LENGTH), actual_file_size=actual
                )
            info.uncompressed_file_size = header.uncompressed_size
            info.compressed_file_size = header.compressed_size

            # Packet boundaries are data-dependent, so SOME host must walk
            # the packet headers (they are embedded in the body).  The walk
            # is segmented: rank 0 broadcasts the index one super-batch
            # segment at a time AS IT WALKS, segments are owned round-robin
            # (segment s -> rank s % world), and every host starts decoding
            # after the FIRST segment — no full-archive read precedes
            # parallel work (round-2 VERDICT item 4; the pattern being
            # parallelized is the reference's serial header hop,
            # src/gpu_compressor.cpp:299-310).
            body = _BodyView(fin, container.HEADER_LENGTH)
            body_size = header.compressed_size - container.HEADER_LENGTH
            chunkp = self.backend.super_batch_packets
            # Only rank 0 displays, and segment raw offsets are GLOBAL
            # (from the walked index), so progress is reported globally:
            # the raw end offset of the last segment this rank finished
            # covers every earlier segment regardless of owner.  Owned
            # shares are unequal under round-robin ownership, so a
            # header/world denominator would over- or undershoot.
            local = CompressionInfo()
            local.uncompressed_file_size = header.uncompressed_size

            if rank == 0:
                with io, open(dst, "wb") as f:
                    f.truncate(info.uncompressed_file_size)
            _barrier("raw-file-sized")

            raw_total = 0
            with open(dst, "r+b") as fout, open(src, "rb") as fwalk:
                # Same submit-ahead overlap as the local drive loop: the
                # devices decode segment N+1 while this host splices and
                # writes segment N.  The index walk + its broadcasts run
                # on a prefetch thread with their OWN file handle (the
                # walker and _load_segment would otherwise race seeks on
                # one fd), so the per-segment collectives stay off the
                # decode critical path.
                walk_body = _BodyView(fwalk, container.HEADER_LENGTH)
                segs = _IterPrefetcher(_segment_stream(
                    walk_body, body_size, rank, world, chunkp))
                # Compacted-upload path when the backend supports it
                # (TPUCompressor): the segment loads as a row-aligned
                # blob, skipping the stride batch + splice/expand host
                # passes (see _load_segment_blob).
                blob_geom = getattr(self.backend,
                                    "decode_blob_geometry", None)
                pending = None  # (handle, raw_sizes, raw_lo, raw_hi)
                # Adaptive hull routing from decoded content (see
                # pipeline._hull_hint); None until the first owned
                # segment lands.
                hint = {"hull": None}

                def _drain(p):
                    h, raw_sizes, raw_lo, raw_hi = p
                    with process:
                        raw = self.backend.decode_fetch(h)
                        piece = _splice(raw, raw_sizes)
                        if blob_geom is not None:
                            hint["hull"] = _hull_hint(raw)
                    with io:
                        # Raw offsets come from the walked index, so
                        # short non-final packets land right.
                        fout.seek(raw_lo)
                        fout.write(piece)
                    local.processed_uncompressed_size = raw_hi
                    monitor.update(local)

                seg_no = 0
                while True:
                    with io:
                        seg = next(segs, None)
                    if seg is None:
                        break
                    raw_total = int(seg[1, -1])
                    if seg_no % world == rank:
                        # Pipeline over OWNED segments: fetch the previous
                        # owned segment only once the next one is
                        # submitted, so the device decodes N+world while
                        # this host splices and writes N.  (Fetching on
                        # the next loop iteration would expose the full
                        # device time whenever ownership is strided —
                        # non-owned iterations are near-free.)
                        if blob_geom is not None:
                            with io:
                                ublob, roff, clen, raw_sizes = \
                                    _load_segment_blob(body, seg,
                                                       *blob_geom())
                            with process:
                                handle = (
                                    self.backend.decode_submit_blob(
                                        ublob, roff, clen, raw_sizes,
                                        hull_hint=hint["hull"]),
                                    raw_sizes, int(seg[1, 0]),
                                    int(seg[1, -1]))
                        else:
                            with io:
                                packets, raw_sizes = _load_segment(body,
                                                                   seg)
                            with process:
                                handle = (
                                    self.backend.decode_submit(
                                        packets, raw_sizes),
                                    raw_sizes, int(seg[1, 0]),
                                    int(seg[1, -1]))
                        if pending is not None:
                            _drain(pending)
                        pending = handle
                    seg_no += 1
                if pending is not None:
                    _drain(pending)
            if raw_total != header.uncompressed_size:
                raise container.ContainerError(
                    "Incorrect file format: packet raw sizes total "
                    f"{raw_total}, header declares "
                    f"{header.uncompressed_size}"
                )
        _barrier("raw-bodies-written")
        # The final segments may be owned by other ranks; print the
        # remaining deciles before the closing line.
        local.processed_uncompressed_size = local.uncompressed_file_size
        monitor.update(local)
        monitor.finish()
        info.processed_uncompressed_size = info.uncompressed_file_size
        info.process_time = process.total
        info.io_time = io.total
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


def _load_segment(body: "_BodyView", seg: np.ndarray):
    """Load one walked index segment ([2, k+1] absolute offsets) into a
    fixed-stride batch: (packets [k, stride] u8, raw_sizes [k])."""
    from gpuar_tpu.config import COMPRESSED_PACKET_SIZE

    off = seg[0]
    n = off.shape[0] - 1
    packets = np.zeros((n, COMPRESSED_PACKET_SIZE), np.uint8)
    raw_sizes = np.diff(seg[1]).astype(np.int32)
    base = int(off[0])
    body.seek(base)
    blob = body.read(int(off[-1]) - base)
    if len(blob) < int(off[-1]) - base:
        # The index walk validates headers only (it hops header-to-header
        # without reading bodies), so a body cut off mid-packet is first
        # seen here.
        raise container.ContainerError(
            "Incorrect file format: truncated packet body"
        )
    for i in range(n):
        a = int(off[i]) - base
        b = int(off[i + 1]) - base
        packets[i, : b - a] = np.frombuffer(blob[a:b], np.uint8)
    return packets, raw_sizes


def _load_segment_blob(body: "_BodyView", seg: np.ndarray,
                       row_bytes: int, bucket_rows: int):
    """Load one walked index segment straight into the row-aligned device
    upload blob (the round-5 compacted path, pipeline.read_batch_blob's
    twin): the segment body read IS the dense packet concatenation, so a
    single native.expand_at scatter replaces the fixed-stride batch, the
    splice, and the per-packet Python loop.  Returns (blob, row_offsets,
    comp_len, raw_sizes) for backend.decode_submit_blob."""
    from gpuar_tpu import native

    off = seg[0]
    n = off.shape[0] - 1
    comp_len = np.diff(off).astype(np.int32)
    raw_sizes = np.diff(seg[1]).astype(np.int32)
    base = int(off[0])
    body.seek(base)
    data = body.read(int(off[-1]) - base)
    if len(data) < int(off[-1]) - base:
        raise container.ContainerError(
            "Incorrect file format: truncated packet body"
        )
    rcnt = (comp_len + row_bytes - 1) // row_bytes
    roff = np.zeros(n, np.int32)
    np.cumsum(rcnt[:-1], out=roff[1:])
    rows = int(roff[-1] + rcnt[-1]) if n else 0
    kb = -(-max(rows, 1) // bucket_rows) * bucket_rows
    blob = native.expand_at(
        np.frombuffer(data, np.uint8),
        roff.astype(np.int64) * row_bytes, comp_len, kb * row_bytes)
    return blob, roff, comp_len, raw_sizes


def _load_packets(body: "_BodyView", index: np.ndarray, lo: int, hi: int):
    """Load packets [lo, hi) into a fixed-stride batch."""
    from gpuar_tpu.config import COMPRESSED_PACKET_SIZE

    n = hi - lo
    packets = np.zeros((n, COMPRESSED_PACKET_SIZE), np.uint8)
    raw_sizes = np.zeros(n, np.int32)
    body.seek(int(index[lo]))
    blob = body.read(int(index[hi] - index[lo]))
    if len(blob) < int(index[hi] - index[lo]):
        # The index walk validates headers only (it hops header-to-header
        # without reading bodies), so a body cut off mid-packet is first
        # seen here.
        raise container.ContainerError(
            "Incorrect file format: truncated packet body"
        )
    for i in range(n):
        a = int(index[lo + i] - index[lo])
        b = int(index[lo + i + 1] - index[lo])
        packets[i, : b - a] = np.frombuffer(blob[a:b], np.uint8)
        _, raw_sizes[i] = container.packet_sizes(blob[a:a + 4])
    return packets, raw_sizes
