"""Multi-chip sharding on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from gpuar_tpu import native
from gpuar_tpu.parallel.mesh import MeshCodec, make_mesh


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_roundtrip_bit_identical(rng):
    P = 64
    codec = MeshCodec(make_mesh(), tile=8, packet_size=P, interpret=True)
    assert codec.lane_quantum == 64

    n = 80  # forces lane padding beyond one quantum
    data = rng.integers(0, 256, (n, P), np.uint8)
    sizes = np.full(n, P, np.int32)
    sizes[7] = 13
    data[7, 13:] = 0
    sizes[63] = 0

    packets, lengths = codec.encode(data, sizes)
    for i in range(n):
        exp = native.encode_packet(data[i, : sizes[i]].tobytes())
        assert packets[i, : lengths[i]].tobytes() == exp, f"lane {i}"

    out = codec.decode(packets, sizes)
    for i in range(n):
        assert out[i, : sizes[i]].tobytes() == data[i, : sizes[i]].tobytes()


def test_single_vs_multi_device_identical(rng):
    """Sharded output must be byte-identical to 1-device output."""
    P = 64
    n = 16
    data = rng.integers(0, 256, (n, P), np.uint8)
    sizes = np.full(n, P, np.int32)

    multi = MeshCodec(make_mesh(), tile=8, packet_size=P, interpret=True)
    single = MeshCodec(make_mesh(jax.devices()[:1]), tile=8, packet_size=P,
                       interpret=True)
    pm, lm = multi.encode(data, sizes)
    ps, ls = single.encode(data, sizes)
    assert np.array_equal(lm, ls)
    for i in range(n):
        assert pm[i, : lm[i]].tobytes() == ps[i, : ls[i]].tobytes()


def test_compacted_body_path_matches_stride_path(rng):
    """encode_body/decode_body (device-side compaction of the transfers)
    must produce exactly the stride path's spliced bytes and round-trip."""
    P = 64
    codec = MeshCodec(make_mesh(), tile=8, packet_size=P, interpret=True)

    n = 70  # lane padding + a short tail + an empty lane
    data = rng.integers(0, 256, (n, P), np.uint8)
    sizes = np.full(n, P, np.int32)
    sizes[3] = 9
    data[3, 9:] = 0
    sizes[-1] = 0
    # A compressible stretch so compacted lengths genuinely vary.
    data[10:30] = 7

    packets, lengths = codec.encode(data, sizes)
    expected = b"".join(
        packets[i, : lengths[i]].tobytes() for i in range(n))

    body, lengths2 = codec.encode_body(data, sizes)
    assert np.array_equal(lengths2, lengths)
    assert body.tobytes() == expected

    # Rebuild stride packets from the body (what the reader would see)
    # and decode through the compacted upload path.
    stride = np.zeros((n, packets.shape[1]), np.uint8)
    pos = 0
    for i in range(n):
        stride[i, : lengths[i]] = np.frombuffer(
            expected, np.uint8, lengths[i], pos)
        pos += lengths[i]
    out = codec.decode_body_wait(codec.decode_body_async(stride, sizes))
    for i in range(n):
        assert out[i, : sizes[i]].tobytes() == data[i, : sizes[i]].tobytes()

    # The reader-built blob path (round 5): _PacketReader.read_batch_blob
    # assembles the row-aligned upload blob straight from the framed
    # stream — no fixed-stride batch, no splice/expand host passes — and
    # decode_blob_async must decode it identically.
    import io

    from gpuar_tpu.pipeline import _PacketReader

    reader = _PacketReader(io.BytesIO(expected))
    batch = reader.read_batch_blob(n + 5, codec.row_words * 4, 64)
    assert reader.read_batch_blob(n + 5, codec.row_words * 4, 64) is None
    blob, roff, comp_len, raw2 = batch
    assert np.array_equal(comp_len, lengths)
    assert np.array_equal(raw2, sizes)
    assert blob.size % (64 * codec.row_words * 4) == 0
    out2 = codec.decode_body_wait(
        codec.decode_blob_async(blob, roff, comp_len, raw2))
    for i in range(n):
        assert out2[i, : sizes[i]].tobytes() == \
            data[i, : sizes[i]].tobytes(), f"blob lane {i}"

    # Adaptive hull routing (round 5): a pipeline-supplied hull_hint
    # overrides the density route, and a WRONG hint must only cost
    # speed, never bits — both kernel variants decode identically.
    for hint in (True, False):
        out3 = codec.decode_body_wait(codec.decode_blob_async(
            blob, roff, comp_len, raw2, hull_hint=hint))
        for i in range(n):
            assert out3[i, : sizes[i]].tobytes() == \
                data[i, : sizes[i]].tobytes(), f"hint={hint} lane {i}"


def test_compacted_body_fixup_rare_path(rng):
    """An error-flagged lane (adversarial underflow run past the kernel
    budget) must be host re-encoded inside encode_body_wait and the
    assembled body must still match the stride path byte-for-byte."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_pallas_encode import _adversarial_underflow_packet
    from gpuar_tpu.parallel import mesh as mesh_mod

    codec = MeshCodec(make_mesh(jax.devices()[:1]), tile=8,
                      packet_size=8192, interpret=True)
    n = 8
    data = rng.integers(0, 256, (n, 8192), np.uint8)
    data[2] = _adversarial_underflow_packet()
    sizes = np.full(n, 8192, np.int32)

    calls = {"n": 0}
    orig = mesh_mod._host_reencode

    def counting(row):
        calls["n"] += 1
        return orig(row)

    mesh_mod._host_reencode = counting
    try:
        body, lengths = codec.encode_body(data, sizes)
    finally:
        mesh_mod._host_reencode = orig
    assert calls["n"] >= 1, "adversarial lane did not take the rare path"

    packets, lengths2 = codec.encode(data, sizes)
    assert np.array_equal(lengths, lengths2)
    expected = b"".join(packets[i, : lengths2[i]].tobytes()
                        for i in range(n))
    assert body.tobytes() == expected


def test_hull_route_by_density(rng):
    """Decode routes incompressible batches to the full-range kernel
    variant and compressible batches to the speculative hull variant
    (mesh._route_hull; PROBES_r4.md hull A/B: random −3.6% under the
    bet, proxy +13–25% with it).  Both variants must round-trip
    bit-exactly and the router must pick by median density."""
    from gpuar_tpu.parallel.mesh import MeshCodec

    assert MeshCodec._route_hull(np.array([8260, 8270, 8255])) is False
    assert MeshCodec._route_hull(np.array([4600, 4700, 210])) is True
    # Mixed batch: median decides.
    assert MeshCodec._route_hull(np.array([8260, 4600, 4700])) is True
    assert MeshCodec._route_hull(np.array([], np.int64)) is True

    P = 64
    codec = MeshCodec(make_mesh(), tile=8, packet_size=P, interpret=True)
    # 64-symbol packets barely adapt the order-0 model, so "compressible"
    # here needs a tiny alphabet (2 symbols ≈ 1.3 bits/byte after
    # warmup); full-range ASCII at this packet size codes at ~8 bits/byte
    # and correctly routes full-range like random.
    for body in (rng.integers(0, 256, (64, P), np.uint8),      # routes off
                 rng.integers(97, 99, (64, P), np.uint8)):     # routes on
        sizes = np.full(64, P, np.int32)
        packets, lengths = codec.encode(body, sizes)
        out = codec.decode(packets, sizes)
        for i in range(64):
            assert out[i, :P].tobytes() == body[i].tobytes(), i
    # Both variants got compiled and cached by the two routes.
    assert set(codec._dec_sorted_v) == {True, False}
