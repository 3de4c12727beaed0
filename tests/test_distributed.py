"""Multi-host planning math + the distributed drive loop on one process.

The collective exchange degrades to identity on a single process, so the
full compress/decompress path runs for real here (with the host backend);
true pod runs exercise the same code with jax.distributed initialized.
"""

import io
import os

import numpy as np
import pytest

from gpuar_tpu import container
from gpuar_tpu.config import UNCOMPRESSED_PACKET_SIZE as P
from gpuar_tpu.parallel import distributed as dist
from gpuar_tpu.pipeline import HostCompressor


def test_host_ranges_alignment_and_cover():
    for size in (0, 1, P - 1, P, P + 1, 10 * P + 17, 1000 * P):
        for hosts in (1, 2, 3, 8):
            rs = dist.host_ranges(size, hosts)
            assert len(rs) == hosts
            # Coverage, order, packet alignment of interior boundaries.
            assert rs[0][0] == 0
            assert rs[-1][1] == size
            for (a0, a1), (b0, b1) in zip(rs, rs[1:]):
                assert a1 == b0
                assert a0 <= a1
                if a1 != size:
                    assert a1 % P == 0
            # Balance within one packet.
            counts = [-(-(b - a) // P) if b > a else 0 for a, b in rs]
            assert max(counts) - min(counts) <= 1


def test_exclusive_scan():
    assert dist.exclusive_scan(np.array([5, 3, 7])).tolist() == [0, 5, 8]
    assert dist.exclusive_scan(np.array([4])).tolist() == [0]


def test_u32_halves_roundtrip_beyond_int32():
    # The collectives canonicalize int64 -> int32 (jax_enable_x64 is never
    # forced), so pod-scale sizes/offsets cross as u32 halves; the split
    # must round-trip values far beyond 2**31.
    vals = np.asarray([0, 1, 2**31 - 1, 2**31, 2**35 + 7, 2**62 + 12345],
                      dtype=np.int64)
    assert np.array_equal(dist._join_u32(dist._split_u32(vals)), vals)
    idx = np.asarray([[0, 2**33, 2**34 + 5], [0, 2**35, 2**36 + 9]],
                     dtype=np.int64)
    assert np.array_equal(dist._join_u32(dist._split_u32(idx)), idx)


def test_load_packets_truncated_body():
    # walk_packet_index validates headers only; a body cut off mid-packet
    # must surface as a clean ContainerError from _load_packets, matching
    # the single-host path for the same file.
    bodies = [b"\x11" * 10, b"\x22" * 5]
    blob = b""
    for b in bodies:
        total = len(b) + 4
        blob += total.to_bytes(2, "little") + len(b).to_bytes(2, "little") + b
    idx = dist.walk_packet_index(io.BytesIO(blob), len(blob))
    cut = dist._BodyView(io.BytesIO(blob[:-3]), 0)
    with pytest.raises(container.ContainerError, match="truncated packet"):
        dist._load_packets(cut, idx[0], 0, 2)


def test_walk_packet_index_and_truncation(rng):
    # Build a tiny body of 3 framed packets by hand (raw sizes 10, 5, 100).
    bodies = [b"\x11" * 10, b"\x22" * 5, b"\x33" * 100]
    blob = b""
    for b in bodies:
        total = len(b) + 4
        blob += total.to_bytes(2, "little") + len(b).to_bytes(2, "little") + b
    idx = dist.walk_packet_index(io.BytesIO(blob), len(blob))
    assert idx[0].tolist() == [0, 14, 23, 127]       # compressed offsets
    assert idx[1].tolist() == [0, 10, 15, 115]       # raw offsets

    with pytest.raises(container.ContainerError):
        dist.walk_packet_index(io.BytesIO(blob[:-1]), len(blob) + 3)


def _framed_blob(bodies):
    blob = b""
    for b in bodies:
        total = len(b) + 4
        blob += total.to_bytes(2, "little") + len(b).to_bytes(2, "little") + b
    return blob


def test_walk_packet_index_chunks_matches_full_walk(rng):
    bodies = [bytes([i]) * (10 + 7 * i) for i in range(11)]
    blob = _framed_blob(bodies)
    full = dist.walk_packet_index(io.BytesIO(blob), len(blob))
    for chunk in (1, 2, 3, 11, 100):
        segs = list(dist.walk_packet_index_chunks(
            io.BytesIO(blob), len(blob), chunk))
        # Segment sizes: all `chunk` except the tail; absolute offsets
        # chain exactly (each segment starts where the previous ended).
        assert all(s.shape[1] - 1 == chunk for s in segs[:-1])
        assert sum(s.shape[1] - 1 for s in segs) == 11
        joined = np.concatenate(
            [segs[0]] + [s[:, 1:] for s in segs[1:]], axis=1)
        assert np.array_equal(joined, full)
        for a, b in zip(segs, segs[1:]):
            assert a[0, -1] == b[0, 0] and a[1, -1] == b[1, 0]

    with pytest.raises(container.ContainerError):
        list(dist.walk_packet_index_chunks(
            io.BytesIO(blob[:-1]), len(blob) + 3, 4))


def test_load_segment_and_truncation():
    bodies = [b"\x11" * 10, b"\x22" * 5, b"\x33" * 100]
    blob = _framed_blob(bodies)
    segs = list(dist.walk_packet_index_chunks(io.BytesIO(blob), len(blob), 2))
    assert len(segs) == 2
    # Second segment starts mid-body: absolute offsets must load right.
    pk, raw = dist._load_segment(dist._BodyView(io.BytesIO(blob), 0), segs[1])
    assert raw.tolist() == [100]
    assert pk[0, 4:104].tobytes() == bodies[2]
    cut = dist._BodyView(io.BytesIO(blob[:-3]), 0)
    with pytest.raises(container.ContainerError, match="truncated packet"):
        dist._load_segment(cut, segs[1])


def test_distributed_single_process_roundtrip(tmp_path, rng):
    src = tmp_path / "in.bin"
    data = rng.integers(0, 256, 3 * P + 1234, np.uint8).tobytes()
    src.write_bytes(data)

    d = dist.DistributedCompressor(backend=HostCompressor())
    gip = tmp_path / "out.gip"
    info = d.compress(src, gip)
    assert info.uncompressed_file_size == len(data)
    assert info.compressed_file_size == os.path.getsize(gip)

    # The distributed writer must produce exactly the local pipeline's file.
    gip_local = tmp_path / "local.gip"
    HostCompressor().compress(src, gip_local)
    assert gip.read_bytes() == gip_local.read_bytes()

    back = tmp_path / "back.bin"
    d.decompress(gip, back)
    assert back.read_bytes() == data


def test_distributed_multi_host_splice_math(tmp_path, rng):
    """Simulate the 2-host splice with the pure helpers: each fake host
    encodes its range; offsets from the size scan splice to the exact
    single-host file."""
    data = rng.integers(0, 256, 7 * P + 99, np.uint8).tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    host = HostCompressor()

    ranges = dist.host_ranges(len(data), 2)
    bodies = []
    for a, b in ranges:
        raw = np.frombuffer(data[a:b], np.uint8)
        pk, ln = host.encode_batch(raw)
        bodies.append(
            b"".join(pk[i, : ln[i]].tobytes() for i in range(pk.shape[0]))
        )
    sizes = np.array([len(b) for b in bodies])
    offsets = dist.exclusive_scan(sizes) + container.HEADER_LENGTH
    total = container.HEADER_LENGTH + int(sizes.sum())

    blob = bytearray(total)
    blob[:container.HEADER_LENGTH] = container.FileHeader(
        uncompressed_size=len(data), compressed_size=total
    ).to_bytes()
    for off, body in zip(offsets, bodies):
        blob[int(off):int(off) + len(body)] = body

    ref = tmp_path / "ref.gip"
    host.compress(src, ref)
    assert bytes(blob) == ref.read_bytes()


def test_distributed_multi_batch_decompress(tmp_path, rng):
    """Regression: a decode span larger than one super-batch must loop
    (a variable-shadowing bug once crashed the second iteration)."""
    data = rng.integers(0, 256, 5 * P + 11, np.uint8).tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    d = dist.DistributedCompressor(
        backend=HostCompressor(super_batch_packets=2))
    gip = tmp_path / "c.gip"
    d.compress(src, gip)
    back = tmp_path / "back.bin"
    d.decompress(gip, back)
    assert back.read_bytes() == data


def test_distributed_decompress_progress_deciles(tmp_path, rng):
    """Progress is reported against GLOBAL raw offsets: every decile
    prints exactly once and ends at 100% + the closing line (the old
    header//world denominator over/undershot under round-robin segment
    ownership)."""
    import io as _io

    from gpuar_tpu.utils.stats import ProgressMonitor

    data = rng.integers(0, 256, 7 * P + 11, np.uint8).tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    d = dist.DistributedCompressor(
        backend=HostCompressor(super_batch_packets=2))
    gip = tmp_path / "c.gip"
    d.compress(src, gip)

    out = _io.StringIO()
    back = tmp_path / "back.bin"
    d.decompress(gip, back, monitor=ProgressMonitor(stream=out))
    assert back.read_bytes() == data
    text = out.getvalue()
    assert text == ("".join(f"{k}%.." for k in range(0, 101, 10))
                    + "Closing file..\n")


def test_iter_prefetcher_order_and_error():
    assert list(dist._IterPrefetcher(iter(range(100)), depth=3)) == \
        list(range(100))

    def boom():
        yield 1
        yield 2
        raise container.ContainerError("walk failed")

    it = dist._IterPrefetcher(boom())
    assert next(it) == 1 and next(it) == 2
    with pytest.raises(container.ContainerError, match="walk failed"):
        next(it)


def test_segment_stream_grouped_broadcast_protocol(rng, monkeypatch):
    """The grouped-broadcast protocol: rank 0 walks and broadcasts
    geometrically growing index groups; receivers re-slice locally into
    chunk-sized segments.  Simulated by recording rank 0's broadcast
    payloads and replaying them into a receiver-rank stream: both ranks
    must yield identical segment sequences (and the walker must emit the
    terminating empty broadcast)."""
    from jax.experimental import multihost_utils

    bodies = [bytes([7 * i % 256]) * (5 + 13 * i % 700) for i in range(23)]
    blob = _framed_blob(bodies)

    for chunk in (1, 2, 3, 23, 50):
        bus = []
        monkeypatch.setattr(
            multihost_utils, "broadcast_one_to_all",
            lambda x, _bus=bus: (_bus.append(np.array(x)), x)[1])
        sent = list(dist._segment_stream(
            dist._BodyView(io.BytesIO(blob), 0), len(blob),
            rank=0, world=2, chunk_packets=chunk, group_max=4))
        assert len(bus) >= 2  # at least one payload + the terminator
        assert int(dist._join_u32(bus[-1])[0, -1]) == 0

        replay = iter(bus)
        monkeypatch.setattr(
            multihost_utils, "broadcast_one_to_all",
            lambda _x, _it=replay: next(_it))
        got = list(dist._segment_stream(
            None, len(blob), rank=1, world=2, chunk_packets=chunk,
            group_max=4))

        assert len(got) == len(sent)
        for a, b in zip(sent, got):
            assert np.array_equal(a, b)
        # Group sizes grow 1, 2, 4, 4, ... (last group may be short).
        full = dist.walk_packet_index(io.BytesIO(blob), len(blob))
        nseg = full.shape[1] - 1  # packets
        expect_segments = -(-nseg // chunk)
        assert len(sent) == expect_segments


def test_segment_stream_chunk_mismatch_detected(rng, monkeypatch):
    from jax.experimental import multihost_utils

    blob = _framed_blob([b"\x55" * 100] * 6)
    bus = []
    monkeypatch.setattr(
        multihost_utils, "broadcast_one_to_all",
        lambda x: (bus.append(np.array(x)), x)[1])
    list(dist._segment_stream(dist._BodyView(io.BytesIO(blob), 0),
                              len(blob), rank=0, world=2, chunk_packets=2))
    replay = iter(bus)
    monkeypatch.setattr(
        multihost_utils, "broadcast_one_to_all", lambda _x: next(replay))
    with pytest.raises(RuntimeError, match="chunk mismatch"):
        list(dist._segment_stream(None, len(blob), rank=1, world=2,
                                  chunk_packets=3))


def test_load_segment_blob_matches_stride_loader():
    """The round-5 compacted segment loader must place exactly the bytes
    the stride loader reads, row-aligned and bucket-padded, and must
    surface mid-packet truncation as a container error (the index walk
    validates headers only)."""
    bodies = [bytes([i]) * (10 + 7 * i) for i in range(5)]
    blob = _framed_blob(bodies)
    idx = dist.walk_packet_index(io.BytesIO(blob), len(blob))
    row_bytes, bucket_rows = 96, 8

    ublob, roff, clen, raw = dist._load_segment_blob(
        dist._BodyView(io.BytesIO(blob), 0), idx, row_bytes, bucket_rows)
    packets, raw2 = dist._load_segment(
        dist._BodyView(io.BytesIO(blob), 0), idx)
    assert np.array_equal(raw, raw2)
    assert np.array_equal(clen, np.diff(idx[0]).astype(np.int32))
    for i in range(len(bodies)):
        a = int(roff[i]) * row_bytes
        assert ublob[a: a + clen[i]].tobytes() == \
            packets[i, : clen[i]].tobytes(), f"packet {i}"
    assert ublob.size % (bucket_rows * row_bytes) == 0

    with pytest.raises(container.ContainerError, match="truncated"):
        dist._load_segment_blob(
            dist._BodyView(io.BytesIO(blob[:-3]), 0), idx,
            row_bytes, bucket_rows)
