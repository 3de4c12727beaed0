"""Container format: header fields, version rejection, truncation, CLI."""

import io
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from gpuar_tpu import container
from gpuar_tpu.pipeline import HostCompressor, generate_random_file


def test_header_layout():
    h = container.FileHeader(uncompressed_size=123456, compressed_size=7890)
    raw = h.to_bytes()
    assert len(raw) == 20
    assert raw[0:3] == bytes((0, 1, 0))
    assert struct.unpack_from("<I", raw, 4)[0] == 123456
    assert struct.unpack_from("<I", raw, 12)[0] == 7890
    back = container.FileHeader.from_bytes(raw, actual_file_size=7890)
    assert back.uncompressed_size == 123456
    assert back.compressed_size == 7890


def test_header_reads_reference_style_garbage():
    """Reference leaves bytes 3, 8-11, 16-19 uninitialised; reader must cope."""
    raw = bytearray(20)
    raw[0:3] = bytes((0, 1, 0))
    raw[3] = 0xDE
    struct.pack_into("<I", raw, 4, 1000)
    raw[8:12] = b"\xca\xfe\xba\xbe"  # garbage upper half
    struct.pack_into("<I", raw, 12, 520)
    raw[16:20] = b"\xde\xad\xbe\xef"
    h = container.FileHeader.from_bytes(bytes(raw), actual_file_size=520)
    assert h.compressed_size == 520
    assert h.uncompressed_size == 1000


def test_header_version_rejected():
    raw = bytearray(container.FileHeader(1, 1).to_bytes())
    raw[1] = 9
    with pytest.raises(container.ContainerError):
        container.FileHeader.from_bytes(bytes(raw), actual_file_size=20)


def test_header_64bit_sizes():
    big = 5 * (1 << 32)  # > 4 GiB
    h = container.FileHeader(uncompressed_size=big, compressed_size=big + 20)
    back = container.FileHeader.from_bytes(h.to_bytes(), actual_file_size=big + 20)
    assert back.uncompressed_size == big
    assert back.compressed_size == big + 20


def test_packet_validation():
    with pytest.raises(container.ContainerError):
        container.validate_packet_header(3, 0, 8192)  # < header length
    with pytest.raises(container.ContainerError):
        container.validate_packet_header(9000, 0, 8192)  # > max packet


def test_truncated_packet_body():
    stream = io.BytesIO(struct.pack("<HH", 100, 50) + b"\0" * 10)
    with pytest.raises(container.ContainerError):
        list(container.read_packets(stream))


def test_host_file_roundtrip(tmp_path, rng):
    src = tmp_path / "input.bin"
    data = rng.integers(0, 256, 3 * 8192 + 500, np.uint8).tobytes()
    src.write_bytes(data)
    gip = tmp_path / "out.gip"
    back = tmp_path / "back.bin"

    comp = HostCompressor()
    info = comp.compress(src, gip)
    assert info.uncompressed_file_size == len(data)
    assert info.compressed_file_size == gip.stat().st_size

    info2 = comp.decompress(gip, back)
    assert back.read_bytes() == data
    assert info2.uncompressed_file_size == len(data)


def test_empty_file_roundtrip(tmp_path):
    src = tmp_path / "empty.bin"
    src.write_bytes(b"")
    gip = tmp_path / "e.gip"
    back = tmp_path / "eb.bin"
    comp = HostCompressor()
    comp.compress(src, gip)
    comp.decompress(gip, back)
    assert back.read_bytes() == b""


def test_cli_host_roundtrip(tmp_path):
    src = tmp_path / "in.bin"
    generate_random_file(src, 100_000, seed=7)
    gip = tmp_path / "c.gip"
    back = tmp_path / "r.bin"
    env_src = Path(__file__).resolve().parents[1]

    r1 = subprocess.run(
        [sys.executable, "-m", "gpuar_tpu.cli", "c", f"--in={src}",
         f"--out={gip}", "--host", "--nointeractive", "--json"],
        capture_output=True, text=True, cwd=env_src,
    )
    assert r1.returncode == 0, r1.stderr
    r2 = subprocess.run(
        [sys.executable, "-m", "gpuar_tpu.cli", "d", f"--in={gip}",
         f"--out={back}", "--host", "--nointeractive", "--json"],
        capture_output=True, text=True, cwd=env_src,
    )
    assert r2.returncode == 0, r2.stderr
    assert back.read_bytes() == src.read_bytes()


def test_corrupted_container_never_crashes(tmp_path, rng):
    """Random single-byte corruptions must either raise ContainerError or
    decode to (possibly wrong) output — never crash or hang."""
    src = tmp_path / "in.bin"
    src.write_bytes(rng.integers(0, 256, 3 * 8192, np.uint8).tobytes())
    gip = tmp_path / "c.gip"
    comp = HostCompressor()
    comp.compress(src, gip)
    blob = bytearray(gip.read_bytes())

    for trial in range(20):
        pos = int(rng.integers(0, len(blob)))
        orig = blob[pos]
        blob[pos] = int(rng.integers(0, 256))
        bad = tmp_path / "bad.gip"
        bad.write_bytes(bytes(blob))
        try:
            comp.decompress(bad, tmp_path / "out.bin")
        except container.ContainerError:
            pass  # rejected cleanly
        blob[pos] = orig
