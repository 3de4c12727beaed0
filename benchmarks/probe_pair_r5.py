"""Round-5 PAIR_STEP A/B: two-symbol encode/decode steps vs the r4
per-symbol baselines (VERDICT r4 next #1/#2).

Usage: python benchmarks/probe_pair_r5.py [--only N] [--reps N]
       [--corpus random|proxy|text]

Configs (one per --only index, so each run is one compile in one process
— the tunnel-discipline pattern from PROBES_r4):

  0 decode base  (PAIR_STEP=False)         3 table passes/symbol
  1 decode pair  (PAIR_STEP=True)          merged update, shared window
  2 decode base  re-anchor (A/B/A bracket)
  3 encode base  (PAIR_STEP=False)
  4 encode pair  (PAIR_STEP=True)
  5 encode base  re-anchor
  6 decode pair  re-run (A/B/A)

Every config asserts bit-exactness: decode against the raw corpus,
encode against the frozen default-knob bitstreams (flagged lanes
excluded, flag-set shifts surfaced) — the pair step is exact by
construction, so any diff is a bug, not a speculation miss.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from benchmarks.probe_decode_r3 import corpus, time_decode  # noqa: E402
from gpuar_tpu.ops import pallas_decode, pallas_encode  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--only", type=int, default=None)
    ap.add_argument("--corpus", choices=["random", "proxy", "text"],
                    default="random")
    args = ap.parse_args()
    D, E = pallas_decode, pallas_encode

    data, packets, sizes, plens, perr = corpus(kind=args.corpus)
    psize = data.shape[1]
    og, _ = E.out_geometry(psize)
    wd = jnp.asarray(np.ascontiguousarray(data).view(np.int32))
    sz = jnp.asarray(sizes.reshape(1, -1))

    def time_enc(tag):
        E._encode_call.clear_cache()
        out = E._encode_call(wd, sz, tile=1024, packet_size=psize,
                             out_groups=og)
        np.asarray(out[1][0:1, 0:1])
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = E._encode_call(wd, sz, tile=1024, packet_size=psize,
                                 out_groups=og)
            np.asarray(out[1][0:1, 0:1])
            ts.append(time.time() - t0)
        errs_new = np.asarray(out[2]).reshape(-1).astype(bool)
        if not np.array_equal(errs_new, perr):
            print(f"  note: error-flag set shifted "
                  f"{int(perr.sum())} -> {int(errs_new.sum())} lanes",
                  flush=True)
        ok = ~(perr | errs_new)
        lens_new = np.asarray(out[1]).reshape(-1)
        assert np.array_equal(lens_new[ok], plens[ok]), "length diff"
        got = np.ascontiguousarray(np.asarray(out[0])).view(np.uint8)
        mask = (np.arange(got.shape[1])[None, :] < plens[:, None]) \
            & ok[:, None]
        assert np.array_equal(np.where(mask, got, 0),
                              np.where(mask, packets, 0)), "bitstream diff"
        print(f"{tag}: {data.size / min(ts) / 1e9:.4f} GB/s", flush=True)

    def dec(tag):
        g = time_decode(packets, sizes, data, tile=1024, reps=args.reps)
        print(f"{tag}: {g:.4f} GB/s", flush=True)

    def dec3(tag):
        g = time_decode(packets, sizes, data, tile=1536, reps=args.reps)
        print(f"{tag}: {g:.4f} GB/s", flush=True)

    cfgs = {
        0: ("dec base ", lambda: (setattr(D, "PAIR_STEP", False),
                                  dec("dec[0] base  PAIR=off"))),
        1: ("dec pair ", lambda: (setattr(D, "PAIR_STEP", True),
                                  dec("dec[1] pair  PAIR=on "))),
        2: ("dec baseA", lambda: (setattr(D, "PAIR_STEP", False),
                                  dec("dec[2] base  PAIR=off (re-anchor)"))),
        3: ("enc base ", lambda: (setattr(E, "PAIR_STEP", False),
                                  time_enc("enc[3] base  PAIR=off"))),
        4: ("enc pair ", lambda: (setattr(E, "PAIR_STEP", True),
                                  time_enc("enc[4] pair  PAIR=on "))),
        5: ("enc baseA", lambda: (setattr(E, "PAIR_STEP", False),
                                  time_enc("enc[5] base  PAIR=off (re-anchor)"))),
        6: ("dec pairA", lambda: (setattr(D, "PAIR_STEP", True),
                                  dec("dec[6] pair  PAIR=on  (re-run)"))),
        # VERDICT r4 next #8: re-sweep streams under the pair kernels —
        # the pair's table write lands later in the chain (after symbol
        # 2's search), so extra independent chains may pay where they
        # did not for the per-symbol layout (PROBES_r4 streams A/B/A).
        7: ("dec pair s3", lambda: (setattr(D, "PAIR_STEP", True),
                                    setattr(D, "STREAMS", 3),
                                    dec3("dec[7] pair  streams=3 tile=1536"))),
        8: ("dec base s3", lambda: (setattr(D, "PAIR_STEP", False),
                                    setattr(D, "STREAMS", 3),
                                    dec3("dec[8] base  streams=3 tile=1536"))),
        # Split-write pair: baseline's pass count, but the write->read
        # edge between the big VMEM passes is gone for odd symbols.
        9: ("dec pairW", lambda: (setattr(D, "PAIR_STEP", True),
                                  setattr(D, "PAIR_SPLITW", True),
                                  dec("dec[9] pair  SPLITW"))),
        # Window-only pair: baseline table ops, shared bit-window
        # bookkeeping (one ring gather per pair) — isolates the
        # scalar-sharing term with no held table value.
        10: ("dec pairO", lambda: (setattr(D, "PAIR_STEP", True),
                                   setattr(D, "PAIR_WINONLY", True),
                                   dec("dec[10] pair WINONLY"))),
    }
    only = [args.only] if args.only is not None else sorted(cfgs)
    defaults = (D.PAIR_STEP, D.PAIR_SPLITW, D.PAIR_WINONLY,
                D.STREAMS, E.PAIR_STEP)
    for i in only:
        # Reset every knob a config may have left behind (cfg 7/8 set
        # STREAMS=3; a later tile=1024 config would otherwise run a
        # non-dividing stream count).
        (D.PAIR_STEP, D.PAIR_SPLITW, D.PAIR_WINONLY,
         D.STREAMS, E.PAIR_STEP) = defaults
        try:
            cfgs[i][1]()
        except Exception as e:
            print(f"cfg[{i}] {cfgs[i][0]}: FAIL {type(e).__name__}: {e}",
                  flush=True)
    (D.PAIR_STEP, D.PAIR_SPLITW, D.PAIR_WINONLY,
     D.STREAMS, E.PAIR_STEP) = defaults


if __name__ == "__main__":
    main()
