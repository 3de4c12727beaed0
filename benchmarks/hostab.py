"""Interleaved in-process A/B for the native host codec.

This box's cross-session timing noise is +-2.5x (PROBES_r3.md), so the
ONLY trustworthy comparison is two .so builds loaded into one process and
timed in alternation, best-of-N per arm.  This harness builds golden.cpp
twice (arm A = baseline flags, arm B = baseline + -D<flag>), verifies both
arms decode bit-exactly, then interleaves timing rounds A,B,A,B,...

Usage:
  python benchmarks/hostab.py --flag TG_MASKPOP [--mib 32] [--best 5]
                              [--corpus random|text] [--mode enc|dec|both]
"""

from __future__ import annotations

import argparse
import ctypes
import hashlib
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpuar_tpu.config import COMPRESSED_PACKET_SIZE, UNCOMPRESSED_PACKET_SIZE

SRC = Path(__file__).resolve().parent.parent / "gpuar_tpu/native/golden.cpp"
BUILD = SRC.parent / "_build"


def build(defines: tuple[str, ...]) -> ctypes.CDLL:
    tag = hashlib.sha256(
        SRC.read_bytes() + repr(sorted(defines)).encode()).hexdigest()[:16]
    out = BUILD / f"ab_{tag}.so"
    if not out.exists():
        BUILD.mkdir(exist_ok=True)
        cmd = ["g++", "-std=c++17", "-O3", "-march=native", "-fPIC",
               "-shared", *[f"-D{d}" for d in defines], str(SRC),
               "-o", str(out)]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(out))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.tg_encode_batch.argtypes = [u8p, ctypes.c_long, ctypes.c_int, u8p,
                                    ctypes.c_long, i32p]
    lib.tg_encode_batch.restype = ctypes.c_long
    lib.tg_decode_batch.argtypes = [u8p, ctypes.c_long, ctypes.c_long, u8p,
                                    ctypes.c_long, i32p]
    lib.tg_decode_batch.restype = None
    return lib


def corpus(mib: int, kind: str) -> np.ndarray:
    n = mib << 20
    if kind == "text":
        from benchmarks import enwik_proxy
        return np.frombuffer(enwik_proxy.generate(n), np.uint8).copy()
    rng = np.random.default_rng(0xAB5EED)
    return rng.integers(0, 256, n, np.uint8)


def u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flag", action="append", default=[],
                    help="-D macro(s) distinguishing arm B")
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--best", type=int, default=5)
    ap.add_argument("--corpus", choices=["random", "text"], default="random")
    ap.add_argument("--mode", choices=["enc", "dec", "both"], default="both")
    args = ap.parse_args()
    if not args.flag:
        ap.error("--flag required (at least one -D macro for arm B)")

    arms = {"A(base)": build(()), "B(" + ",".join(args.flag) + ")":
            build(tuple(args.flag))}
    data = corpus(args.mib, args.corpus)
    psize = UNCOMPRESSED_PACKET_SIZE
    npk = -(-data.size // psize)
    stride = COMPRESSED_PACKET_SIZE

    # Encode once per arm; assert identical bitstreams, then per-arm decode
    # must round-trip.  Buffers are per-arm so timing runs don't alias.
    bufs = {}
    ref_pk = None
    for name, lib in arms.items():
        pk = np.zeros((npk, stride), np.uint8)
        lens = np.zeros(npk, np.int32)
        cnt = lib.tg_encode_batch(u8p(data), data.size, psize, u8p(pk),
                                  stride, i32p(lens))
        assert cnt == npk
        if ref_pk is None:
            ref_pk = pk.copy()
        else:
            assert np.array_equal(ref_pk, pk), f"{name}: bitstream diff vs A"
        out = np.zeros((npk, psize), np.uint8)
        rl = np.zeros(npk, np.int32)
        lib.tg_decode_batch(u8p(pk), stride, npk, u8p(out), psize, i32p(rl))
        assert np.array_equal(out.reshape(-1)[:data.size], data), \
            f"{name}: decode mismatch"
        bufs[name] = (pk, lens, out, rl)
    print(f"bit-exact ok ({npk} packets, {args.mib} MiB {args.corpus})",
          flush=True)

    def t_enc(name):
        lib, (pk, lens, _, _) = arms[name], bufs[name]
        t0 = time.perf_counter()
        lib.tg_encode_batch(u8p(data), data.size, psize, u8p(pk), stride,
                            i32p(lens))
        return time.perf_counter() - t0

    def t_dec(name):
        lib, (pk, _, out, rl) = arms[name], bufs[name]
        t0 = time.perf_counter()
        lib.tg_decode_batch(u8p(pk), stride, npk, u8p(out), psize, i32p(rl))
        return time.perf_counter() - t0

    jobs = []
    if args.mode in ("enc", "both"):
        jobs.append(("encode", t_enc))
    if args.mode in ("dec", "both"):
        jobs.append(("decode", t_dec))

    for jname, fn in jobs:
        best = {n: float("inf") for n in arms}
        for r in range(args.best):
            for n in arms:          # interleave: A,B per round
                best[n] = min(best[n], fn(n))
        mbs = {n: data.size / best[n] / 1e6 for n in arms}
        line = "  ".join(f"{n}: {v:.1f} MB/s" for n, v in mbs.items())
        vals = list(mbs.values())
        print(f"{jname}: {line}   B/A = {vals[1] / vals[0]:.3f}", flush=True)


if __name__ == "__main__":
    main()
