"""Round-2 decode kernel probes: sweep knobs on the real chip.

Usage: python benchmarks/probe_decode_r2.py [--reps N]

Knobs swept (module globals of ops/pallas_decode.py, monkeypatched):
  * UNROLL_WORDS 2 vs 4 (loop-iteration amortisation)
  * refill window padding (WIN = (GROW + pad) & ~7): 39 vs 23 vs 15
  * tile 1024 vs 2048

Each config decodes the same 64 MiB random corpus (pre-encoded once) and
reports min-of-N GB/s; bit-exactness is asserted against the raw data.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from gpuar_tpu.ops import pallas_decode, pallas_encode


def corpus(n_packets=8192, psize=8192):
    rng = np.random.default_rng(0xBE7C)
    data = rng.integers(0, 256, (n_packets, psize), np.uint8)
    sizes = np.full(n_packets, psize, np.int32)
    og, _ = pallas_encode.out_geometry(psize)
    wd = jnp.asarray(np.ascontiguousarray(data).view(np.int32))
    sz = jnp.asarray(sizes.reshape(1, -1))
    pk32, lens, errs = pallas_encode._encode_call(
        wd, sz, tile=1024, packet_size=psize, out_groups=og)
    assert not np.asarray(errs).any()
    packets = np.ascontiguousarray(np.asarray(pk32)).view(np.uint8)
    return data, packets, sizes


def time_decode(packets, sizes, data, *, tile, reps):
    psize = data.shape[1]
    og, ow = pallas_encode.out_geometry(psize)
    bd = jnp.asarray(packets.view(np.int32))
    sz = jnp.asarray(sizes.reshape(1, -1))
    # fresh jit cache per config (knobs are globals, not traced args)
    pallas_decode._decode_call.clear_cache()
    out = pallas_decode._decode_call(
        bd, sz, tile=tile, packet_size=psize, out_groups=og)
    np.asarray(out[0:1, 0:1])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = pallas_decode._decode_call(
            bd, sz, tile=tile, packet_size=psize, out_groups=og)
        np.asarray(out[0:1, 0:1])
        ts.append(time.time() - t0)
    raw = np.ascontiguousarray(np.asarray(out)).view(np.uint8)[:, :psize]
    assert np.array_equal(raw, data), "bit mismatch"
    total = data.size
    return total / min(ts) / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    data, packets, sizes = corpus()
    base_unroll = pallas_decode.UNROLL_WORDS

    for unroll in (2, 4):
        for pad in (39, 23, 15):
            for tile in (1024, 2048):
                pallas_decode.UNROLL_WORDS = unroll
                pallas_decode.WIN_PAD = pad
                try:
                    g = time_decode(packets, sizes, data,
                                    tile=tile, reps=args.reps)
                    print(f"unroll={unroll} pad={pad} tile={tile}: "
                          f"{g:.4f} GB/s", flush=True)
                except Exception as e:
                    print(f"unroll={unroll} pad={pad} tile={tile}: "
                          f"FAIL {type(e).__name__}: {e}", flush=True)
    pallas_decode.UNROLL_WORDS = base_unroll


if __name__ == "__main__":
    main()
