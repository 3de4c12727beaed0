"""Randomized end-to-end soak: random file sizes and content mixes through
the real compressor backends, cross-checked between TPU and host paths.

Usage: python benchmarks/soak.py [--iters 8] [--host-only]
"""
import argparse
import hashlib
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(rng, size):
    parts = []
    left = size
    while left > 0:
        n = int(min(left, rng.integers(1, 1 << 22)))
        kind = rng.integers(0, 5)
        if kind == 0:
            parts.append(rng.integers(0, 256, n, np.uint8).tobytes())
        elif kind == 1:
            parts.append(bytes(n))
        elif kind == 2:
            parts.append((b"The quick brown fox jumps over the lazy dog. "
                          * (n // 46 + 1))[:n])
        elif kind == 3:
            parts.append(rng.integers(0, 4, n, np.uint8).tobytes())
        else:
            parts.append(bytes([int(rng.integers(0, 256))]) * n)
        left -= n
    return b"".join(parts)


def md5(path):
    h = hashlib.md5()
    with open(path, "rb") as f:
        while blk := f.read(1 << 22):
            h.update(blk)
    return h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--host-only", action="store_true")
    ap.add_argument("--seed", type=int, default=0xF00D)
    args = ap.parse_args()

    from gpuar_tpu.pipeline import HostCompressor

    host = HostCompressor()
    tpu = None
    if not args.host_only:
        from gpuar_tpu.parallel.runner import TPUCompressor

        tpu = TPUCompressor()

    rng = np.random.default_rng(args.seed)
    edge_sizes = [0, 1, 8191, 8192, 8193, 16 * 8192, 8192 * 1024 + 5]
    for it in range(args.iters):
        if it < len(edge_sizes):
            size = edge_sizes[it]
        else:
            size = int(rng.integers(0, 48 << 20))
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.bin")
            with open(src, "wb") as f:
                f.write(make_corpus(rng, size))
            ref = md5(src)

            gh = os.path.join(td, "h.gip")
            host.compress(src, gh)
            out = os.path.join(td, "h.out")
            host.decompress(gh, out)
            assert md5(out) == ref, f"iter {it}: host round-trip"

            if tpu is not None:
                gt = os.path.join(td, "t.gip")
                tpu.compress(src, gt)
                assert md5(gt) == md5(gh), f"iter {it}: TPU/host .gip mismatch"
                out2 = os.path.join(td, "t.out")
                tpu.decompress(gh, out2)
                assert md5(out2) == ref, f"iter {it}: TPU decode of host file"
            print(f"iter {it}: {size} bytes OK", flush=True)
    print("soak PASSED")


if __name__ == "__main__":
    main()
