"""Round-4 follow-up probes (after benchmarks/_r4_pipeline.sh).

What the unattended sweeps established (benchmarks/PIPELINE_r4.log):
OFFSET_STATE (-4%), XDIV (-3%) and STACK_SCALAR (neutral) are all
measured-negative — coupling or re-shaping the scalar chains costs as
much as the issue savings buy.  The one positive signal was plain
streams=3 @ tile=1536 (same w=512 slice width, 0.9776 vs 0.968/0.971
anchors), and the streams=4 @ w=512 point never ran (the 9216-packet
corpus is not divisible by tile 2048).

This script answers the remaining scheduling questions on a 6144-packet
corpus (divisible by tiles 768/1024/1536/2048 alike) with the configs
interleaved TWICE in one process so session drift is visible:

  * decode: streams 2/3/4 at constant w=512; w=768/1024 at streams 2;
  * encode: tile 1024/1536/2048 (tile is shared by both kernels in
    MeshCodec, so a decode-side tile adoption needs encode not to
    regress);
  * encode: OFFSET_STATE A/B, re-run with the fixed valid-prefix
    comparison (the r3-queued A/B crashed on comparing uninitialized
    output-buffer tails).

Usage: python benchmarks/probe_r4b.py [--reps N] [--skip-encode]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from benchmarks.probe_decode_r3 import corpus, time_decode  # noqa: E402
from gpuar_tpu.ops import pallas_decode, pallas_encode  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--skip-encode", action="store_true")
    ap.add_argument("--skip-decode", action="store_true")
    args = ap.parse_args()

    D, E = pallas_decode, pallas_encode
    data, packets, sizes, plens, perr = corpus(n_packets=6144)
    D.PAIRED_DIV, D.FREE_RUN = True, True

    if not args.skip_decode:
        configs = (
            (2, 1024),   # w=512, adopted baseline
            (3, 1536),   # w=512, 3 chains (r4 sweep's best point)
            (4, 2048),   # w=512, 4 chains (never ran: divisibility)
            (2, 1536),   # w=768
            (2, 2048),   # w=1024 (r2: negative; re-anchor on this box)
        )
        for rnd in (1, 2):
            for streams, tile in configs:
                D.STREAMS = streams
                try:
                    g = time_decode(packets, sizes, data, tile=tile,
                                    reps=args.reps)
                    print(f"dec[{rnd}] streams={streams} tile={tile} "
                          f"w={tile // streams}: {g:.4f} GB/s", flush=True)
                except Exception as e:
                    print(f"dec[{rnd}] streams={streams} tile={tile}: "
                          f"FAIL {type(e).__name__}: {e}", flush=True)
        D.STREAMS = 2

    if args.skip_encode:
        return

    psize = data.shape[1]
    og, _ = E.out_geometry(psize)
    wd = jnp.asarray(np.ascontiguousarray(data).view(np.int32))
    sz = jnp.asarray(sizes.reshape(1, -1))

    def time_enc(tag, tile):
        E._encode_call.clear_cache()
        out = E._encode_call(wd, sz, tile=tile, packet_size=psize,
                             out_groups=og)
        np.asarray(out[1][0:1, 0:1])
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = E._encode_call(wd, sz, tile=tile, packet_size=psize,
                                 out_groups=og)
            np.asarray(out[1][0:1, 0:1])
            ts.append(time.time() - t0)
        # Lanes error-flagged in either run are excluded from the
        # bit-compare (their kernel rows are pre-fixup; production
        # golden-re-encodes them) — matching probe_decode_r3's checker.
        errs_new = np.asarray(out[2]).reshape(-1).astype(bool)
        ok = ~(perr | errs_new)
        lens_new = np.asarray(out[1]).reshape(-1)
        assert np.array_equal(lens_new[ok], plens[ok]), "length diff"
        got = np.ascontiguousarray(np.asarray(out[0])).view(np.uint8)
        mask = (np.arange(got.shape[1])[None, :] < plens[:, None]) \
            & ok[:, None]
        assert np.array_equal(np.where(mask, got, 0),
                              np.where(mask, packets, 0)), "bitstream diff"
        print(f"{tag}: {data.size / min(ts) / 1e9:.4f} GB/s", flush=True)

    for rnd in (1, 2):
        for tile in (1024, 1536, 2048):
            try:
                time_enc(f"enc[{rnd}] tile={tile}", tile)
            except Exception as e:
                print(f"enc[{rnd}] tile={tile}: FAIL "
                      f"{type(e).__name__}: {e}", flush=True)

    # OFFSET_STATE A/B at the production tile, valid-prefix compared.
    for rnd in (1, 2):
        for off in (False, True):
            E.OFFSET_STATE = off
            try:
                time_enc(f"encOFF[{rnd}] {'OFFSET' if off else 'base  '}",
                         1024)
            except Exception as e:
                print(f"encOFF[{rnd}] off={off}: FAIL "
                      f"{type(e).__name__}: {e}", flush=True)
            finally:
                E.OFFSET_STATE = False


if __name__ == "__main__":
    main()
