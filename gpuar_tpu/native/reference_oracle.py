"""Compile and load the REFERENCE codec's host path as a test oracle.

The reference (jiahansu/GPUAR) compiles its codec ``__host__ __device__``
so the CPU path is bit-identical to the GPU path by construction
(src/gpuar_kernel.cu:256,487,848).  This module builds that host path
with plain g++ — the CUDA qualifiers erased by a stub header
(``ref_stub/cuda_runtime.h``) and the file trimmed at the first
``__global__`` kernel (the only code using launch syntax) — so the
rebuilt codec can be asserted byte-for-byte compatible with real GPUAR
bitstreams, not merely self-consistent (VERDICT.md round-1 item 2).

The reference tree (/root/reference) is read, never modified, and never
vendored; when it is absent the oracle reports unavailable and the
cross-validation tests skip (the frozen fixtures they generated still
run).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import struct
import subprocess
import threading
from pathlib import Path

import numpy as np

from gpuar_tpu.config import (
    EXTRA_COMPRESSED_SIZE,
    PACKET_HEADER_LENGTH,
    UNCOMPRESSED_PACKET_SIZE,
)

REFERENCE_KERNEL = Path(
    os.environ.get("GPUAR_REFERENCE", "/root/reference")
) / "src" / "gpuar_kernel.cu"

_WRAP = Path(__file__).with_name("ref_oracle_wrap.cpp")
_STUBS = Path(__file__).with_name("ref_stub")
_BUILD_DIR = Path(__file__).with_name("_build")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None


def available() -> bool:
    return REFERENCE_KERNEL.is_file()


# The reference defines extern-C `read`/`write` bit helpers whose names
# collide with the POSIX syscalls; without -Bsymbolic the dynamic linker
# preempts the library's internal calls with libc's, so the packet header
# write becomes write(2) to a random fd.
_FLAGS = ("-std=c++14", "-O2", "-fPIC", "-shared", "-w", "-Wl,-Bsymbolic")


def _trim_host_only(source: str) -> str:
    """Everything above the first __global__ kernel: the complete
    __host__ __device__ codec (coder, model, bit I/O), none of the CUDA
    launch machinery."""
    cut = source.index("__global__")
    return source[:cut]


def _build() -> Path:
    ref_text = REFERENCE_KERNEL.read_bytes()
    key = hashlib.sha256(
        ref_text + _WRAP.read_bytes()
        + (_STUBS / "cuda_runtime.h").read_bytes()
        + repr(_FLAGS).encode()
    ).hexdigest()[:16]
    out = _BUILD_DIR / f"libref_oracle_{key}.so"
    if out.exists():
        return out
    _BUILD_DIR.mkdir(exist_ok=True)
    trimmed = _BUILD_DIR / f"gpuar_kernel_host_{key}.inc"
    trimmed.write_text(_trim_host_only(ref_text.decode()))
    tmp = out.with_suffix(".so.tmp")
    cmd = [
        "g++", *_FLAGS,
        f"-DREF_KERNEL_HOST_INC=\"{trimmed}\"",
        f"-I{_STUBS}", f"-I{REFERENCE_KERNEL.parent}",
        str(_WRAP), "-o", str(tmp),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, out)
    return out


def _load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(str(_build()))
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.ref_encode_packet.argtypes = [u8p, ctypes.c_int, u8p]
            lib.ref_encode_packet.restype = ctypes.c_int
            lib.ref_decode_packet.argtypes = [u8p, u8p]
            lib.ref_decode_packet.restype = ctypes.c_int
            _LIB = lib
        return _LIB


def _u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def encode_packet(data: bytes) -> bytes:
    """One packet through the reference encoder (header + bitstream)."""
    lib = _load()
    assert len(data) <= UNCOMPRESSED_PACKET_SIZE
    # arCompress loads 16-byte ulonglong2 elements past a short tail
    # (src/gpuar_kernel.cu:496-518): zero-pad like every real caller's
    # packet-stride buffers.
    src = np.zeros(UNCOMPRESSED_PACKET_SIZE + 16, dtype=np.uint8)
    src[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    out = np.zeros(
        UNCOMPRESSED_PACKET_SIZE + EXTRA_COMPRESSED_SIZE + 16, dtype=np.uint8
    )
    n = lib.ref_encode_packet(_u8p(src), len(data), _u8p(out))
    return out[:n].tobytes()


def decode_packet(packet: bytes) -> bytes:
    """One framed packet through the reference decoder."""
    lib = _load()
    src = np.frombuffer(packet, dtype=np.uint8).copy()
    out = np.zeros(UNCOMPRESSED_PACKET_SIZE + 16, dtype=np.uint8)
    n = lib.ref_decode_packet(_u8p(src), _u8p(out))
    return out[:n].tobytes()


def make_reference_gip(data: bytes, garbage: int = 0xCD) -> bytes:
    """A .gip exactly as the reference would write it, including the
    uninitialised header bytes its writer leaves behind.

    FileHeader (src/file_header.hpp:28-72) initialises bytes 0-2 and
    writes u32 sizes at offsets 4 and 12; bytes 3, 8-11 and 16-19 are
    whatever the stack held.  A deterministic `garbage` byte stands in
    for that uninitialised memory — the worst case for a reader — so
    the container's u32 fallback (container.py) is tested against a
    faithful reference-written header, followed by reference-encoded
    packets.
    """
    body = b"".join(
        encode_packet(data[i: i + UNCOMPRESSED_PACKET_SIZE])
        for i in range(0, len(data), UNCOMPRESSED_PACKET_SIZE)
    )
    header = bytearray(bytes([garbage]) * 20)
    header[0:3] = bytes([0, 1, 0])
    struct.pack_into("<I", header, 4, len(data))
    struct.pack_into("<I", header, 12, 20 + len(body))
    return bytes(header) + body
