"""Randomized end-to-end soak: random file sizes and content mixes through
the real compressor backends, cross-checked between TPU and host paths.

Iteration 0 (after the size-edge cases) embeds an adversarial-underflow
packet (>MAX_RUN_BITS pending run) in the corpus, so every soak proves
the kernel error-flag -> host-fixup path on the actual hardware, not
just in interpreter tests; the flag firing is recorded in the JSON
summary (--json).

Usage: python benchmarks/soak.py [--iters 8] [--host-only] [--json OUT]
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
    ap.add_argument("--json", default=None,
                    help="write a run summary (sizes, fixup evidence) here")
    args = ap.parse_args()

    from gpuar_tpu.pipeline import HostCompressor

    host = HostCompressor()
    tpu = None
    if not args.host_only:
        from gpuar_tpu.parallel.runner import TPUCompressor

        tpu = TPUCompressor()

    # Count kernel error-flag fixups (the >MAX_RUN_BITS underflow path)
    # actually exercised during the soak.
    from gpuar_tpu.ops import pallas_encode
    fixups = {"lanes": 0}
    orig_fixup = pallas_encode.fixup_errors

    def counting_fixup(packets, lengths, errs, data, sizes):
        fixups["lanes"] += int(np.count_nonzero(errs))
        return orig_fixup(packets, lengths, errs, data, sizes)

    pallas_encode.fixup_errors = counting_fixup

    rng = np.random.default_rng(args.seed)
    edge_sizes = [0, 1, 8191, 8192, 8193, 16 * 8192, 8192 * 1024 + 5]
    summary = []
    for it in range(args.iters):
        if it < len(edge_sizes):
            size = edge_sizes[it]
        else:
            size = int(rng.integers(0, 48 << 20))
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "in.bin")
            with open(src, "wb") as f:
                blob = make_corpus(rng, size)
                if it == len(edge_sizes):
                    # Embed a packet engineered to overflow the in-kernel
                    # underflow-run budget: forces the error-flag ->
                    # golden-codec fixup path on real hardware.
                    sys.path.insert(0, os.path.join(os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))), "tests"))
                    from test_pallas_encode import \
                        _adversarial_underflow_packet
                    adv = _adversarial_underflow_packet().tobytes()
                    blob = adv + blob[len(adv):] if len(blob) >= len(adv) \
                        else adv
                f.write(blob)
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
            print(f"iter {it}: {size} bytes OK "
                  f"(fixup lanes so far: {fixups['lanes']})", flush=True)
            summary.append({"iter": it, "bytes": size, "ok": True})
    print(f"soak PASSED (kernel fixup lanes exercised: {fixups['lanes']})")
    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"iters": summary, "fixup_lanes": fixups["lanes"],
                       "backend": "host-only" if tpu is None else
                       "tpu+host"}, f, indent=1)


if __name__ == "__main__":
    main()
