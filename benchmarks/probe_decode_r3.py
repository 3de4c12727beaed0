"""Round-3 decode kernel probes: the table-pass floor and the fused update.

Usage: python benchmarks/probe_decode_r3.py [--reps N] [--floor-only]

What is measured (module globals of ops/pallas_decode.py, monkeypatched;
every config decodes the same pre-encoded 64 MiB random corpus at the
production shape — tile 1024, 8192-B packets):

  * FLOOR — ABLATE_SCALAR + ABLATE_REFILL + DECODE_HULL off: only the
    per-symbol table passes remain (search read + update write).  WRONG
    OUTPUT by design, honest timing: this is the measured algorithmic
    ceiling the real kernel is chasing (VERDICT r2 item 1).
  * FUSE_UPDATE off/on x FUSE_K 1/2/4/8 — the deferred-update fold:
    pending updates ride the search read (index-byte compares commute),
    table write-back every K symbols.
  * STREAMS 2 vs 3 (tile 1152 = 3 x 384 keeps whole-vreg slices) on the
    best FUSE config.

Bit-exactness is asserted for every non-floor config.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from gpuar_tpu.ops import pallas_decode, pallas_encode
from gpuar_tpu.parallel.mesh import enable_compilation_cache

enable_compilation_cache()  # probe configs recompile ~minutes on the
                            # tunnel without the persistent cache


def corpus(n_packets=9216, psize=8192, kind="random"):
    # 9216 = 9 x 1024 = 8 x 1152 = 12 x 768 = 6 x 1536: divisible by
    # every probed tile, so no inactive pad lanes skew any config's GB/s.
    if kind == "proxy":
        from benchmarks import enwik_proxy
        data = np.frombuffer(
            enwik_proxy.generate(n_packets * psize), np.uint8
        ).reshape(n_packets, psize).copy()
    elif kind == "text":
        # The machine-text corpus run.py benches, entropy-sorted like
        # the production pipeline (run.py:94-97) so tiles group by
        # content class — the shape in which its decode row measures
        # anomalously slow (0.89 vs random 0.96 / proxy 1.21).
        from benchmarks.run import _text_corpus
        from gpuar_tpu.parallel.mesh import _entropy_order
        data = np.frombuffer(
            _text_corpus(n_packets * psize), np.uint8
        ).reshape(n_packets, psize).copy()
        data = data[_entropy_order(data)]
    else:
        rng = np.random.default_rng(0xBE7C)
        data = rng.integers(0, 256, (n_packets, psize), np.uint8)
    sizes = np.full(n_packets, psize, np.int32)
    og, _ = pallas_encode.out_geometry(psize)
    wd = jnp.asarray(np.ascontiguousarray(data).view(np.int32))
    sz = jnp.asarray(sizes.reshape(1, -1))
    pk32, lens, errs = pallas_encode._encode_call(
        wd, sz, tile=1024, packet_size=psize, out_groups=og)
    packets = np.ascontiguousarray(np.asarray(pk32)).view(np.uint8)
    lens = np.asarray(lens).reshape(-1).copy()
    # Lanes can legitimately flag (underflow run past MAX_RUN_BITS /
    # ring-span guard) on compressible corpora; production re-encodes
    # them with the golden codec (mesh._host_reencode) — do the same
    # here so decode timings run on valid bitstreams, and report the
    # count.  Encode A/B comparisons must skip flagged lanes (their
    # kernel rows are not the final bytes).
    errmask = np.asarray(errs).reshape(-1).astype(bool)
    if errmask.any():
        print(f"corpus({kind}): {int(errmask.sum())}/{n_packets} lanes "
              "error-flagged -> golden re-encode (production fixup path)",
              flush=True)
        pallas_encode.fixup_errors(packets, lens, errmask, data, sizes)
    # Per-packet framed lengths: bytes past lens[i] in row i are
    # uninitialized kernel-output tail, NOT part of the bitstream —
    # encode re-run checks must compare valid prefixes only.
    return data, packets, sizes, lens, errmask


def time_decode(packets, sizes, data, *, tile, reps, check=True):
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
    if check:
        raw = np.ascontiguousarray(np.asarray(out)).view(np.uint8)[:, :psize]
        assert np.array_equal(raw, data), "bit mismatch"
    return data.size / min(ts) / 1e9


def run(name, packets, sizes, data, *, tile=1024, reps=5, check=True):
    if packets.shape[0] % tile:
        # A non-divisor tile would need pad lanes that run the full
        # 8192-step loop and skew GB/s; size the corpus to the tile
        # (see corpus() docstring) instead of padding here.
        print(f"{name}: SKIP corpus {packets.shape[0]} packets not "
              f"divisible by tile {tile}", flush=True)
        return None
    try:
        g = time_decode(packets, sizes, data, tile=tile, reps=reps,
                        check=check)
        print(f"{name}: {g:.4f} GB/s", flush=True)
        return g
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--corpus", choices=["random", "proxy", "text"],
                    default="random",
                    help="proxy = pinned enwik stand-in (exercises the "
                         "speculative hull-window path); text = the "
                         "entropy-sorted machine corpus (the anomalous "
                         "decode row)")
    ap.add_argument("--floor-only", action="store_true")
    ap.add_argument("--skip-floor", action="store_true")
    ap.add_argument("--encode-floor", action="store_true")
    ap.add_argument("--stack", action="store_true",
                    help="STACK_SCALAR sweep: merged full-width scalar "
                         "chains vs the per-stream baseline")
    ap.add_argument("--only", type=int, default=None,
                    help="run a single --stack/--offset config by index "
                         "(chunked runs: one compile per invocation)")
    ap.add_argument("--offset", action="store_true",
                    help="OFFSET_STATE sweep: (lower, R, D) coder state "
                         "vs the (lower, upper, code) baseline, decode "
                         "then encode")
    ap.add_argument("--r4", action="store_true",
                    help="round-4 grid: XDIV (cross-stream paired div) "
                         "x OFFSET_STATE x streams/tile, plus an unroll "
                         "re-sweep under OFFSET_STATE")
    ap.add_argument("--chunk", action="store_true",
                    help="CHUNK_WORDS 32 vs 64 A/B, decode + encode "
                         "(grid time-chunk count halving)")
    ap.add_argument("--hull", action="store_true",
                    help="DECODE_HULL on/off A/B on the chosen corpus "
                         "(the text-row anomaly probe)")
    ap.add_argument("--enc-r4", action="store_true",
                    help="encode residual sweep (VERDICT r3 next #8): "
                         "dump cadence re-sweep under PAIRED_DIV, "
                         "OFFSET_STATE x unroll")
    args = ap.parse_args()
    D = pallas_decode

    data, packets, sizes, plens, perr = corpus(kind=args.corpus)

    def assert_bitstream_equal(out):
        # Bit-exactness vs the frozen default-knob encode: lengths match
        # and every valid byte matches; tail bytes past each packet's
        # length are uninitialized output-buffer memory on both sides.
        # Lanes error-flagged in EITHER run are excluded (their kernel
        # rows are pre-fixup; production replaces them with golden
        # re-encodes, bit-identical by construction) — but flag sets
        # must agree so a knob can't silently push lanes onto the
        # host path.
        errs_new = np.asarray(out[2]).reshape(-1).astype(bool)
        if not np.array_equal(errs_new, perr):
            # A knob may move lanes on/off the host-fixup path (e.g.
            # dump cadence changes ring pressure).  Compare the lanes
            # both runs coded in-kernel; surface the shift so a knob
            # that dumps work onto the host is visible in the log.
            print(f"  note: error-flag set shifted "
                  f"{int(perr.sum())} -> {int(errs_new.sum())} lanes",
                  flush=True)
        ok = ~(perr | errs_new)
        lens_new = np.asarray(out[1]).reshape(-1)
        assert np.array_equal(lens_new[ok], plens[ok]), "length diff"
        got = np.ascontiguousarray(np.asarray(out[0])).view(np.uint8)
        mask = (np.arange(got.shape[1])[None, :] < plens[:, None]) & ok[:, None]
        assert np.array_equal(np.where(mask, got, 0),
                              np.where(mask, packets, 0)), "bitstream diff"
    saved = dict(FUSE_UPDATE=D.FUSE_UPDATE, FUSE_K=D.FUSE_K,
                 STREAMS=D.STREAMS, DECODE_HULL=D.DECODE_HULL,
                 ABLATE_SCALAR=D.ABLATE_SCALAR,
                 ABLATE_REFILL=D.ABLATE_REFILL,
                 PAIR14=D.PAIR14, UNROLL_WORDS=D.UNROLL_WORDS,
                 PAIRED_DIV=D.PAIRED_DIV, FREE_RUN=D.FREE_RUN,
                 STACK_SCALAR=D.STACK_SCALAR,
                 OFFSET_STATE=D.OFFSET_STATE, XDIV=D.XDIV)
    try:
        # --- the floor: table passes only, full-range, no speculation ---
        if not args.skip_floor:
            D.ABLATE_SCALAR = True
            D.ABLATE_REFILL = True
            D.DECODE_HULL = False
            run("FLOOR (search+update only)", packets, sizes, data,
                reps=args.reps, check=False)
            D.ABLATE_REFILL = False
            run("FLOOR+refill (scalar ablated only)", packets, sizes, data,
                reps=args.reps, check=False)
            D.ABLATE_SCALAR = saved["ABLATE_SCALAR"]
            D.ABLATE_REFILL = saved["ABLATE_REFILL"]
            D.DECODE_HULL = saved["DECODE_HULL"]
            if args.floor_only:
                return

        if args.encode_floor:
            E = pallas_encode
            og, _ = E.out_geometry(data.shape[1])
            wd = jnp.asarray(np.ascontiguousarray(data).view(np.int32))
            sz = jnp.asarray(sizes.reshape(1, -1))

            def time_enc(tag):
                E._encode_call.clear_cache()
                out = E._encode_call(wd, sz, tile=1024,
                                     packet_size=data.shape[1],
                                     out_groups=og)
                np.asarray(out[1][0:1, 0:1])
                ts = []
                for _ in range(args.reps):
                    t0 = time.time()
                    out = E._encode_call(wd, sz, tile=1024,
                                         packet_size=data.shape[1],
                                         out_groups=og)
                    np.asarray(out[1][0:1, 0:1])
                    ts.append(time.time() - t0)
                print(f"{tag}: {data.size / min(ts) / 1e9:.4f} GB/s",
                      flush=True)

            E.ABLATE_SCALAR = True
            try:
                time_enc("ENCODE FLOOR (model query+update only)")
            finally:
                E.ABLATE_SCALAR = False
            time_enc("ENCODE real")
            return

        if args.enc_r4:
            # --- encode residual: dump cadence under PAIRED_DIV,
            # OFFSET_STATE, unroll (bitstreams unchanged by all knobs:
            # checked against the frozen default-knob packets). ---
            E = pallas_encode
            og, _ = E.out_geometry(data.shape[1])
            wd = jnp.asarray(np.ascontiguousarray(data).view(np.int32))
            sz = jnp.asarray(sizes.reshape(1, -1))
            esaved = (E.DUMP_WORDS, E.UNROLL_WORDS, E.OFFSET_STATE)

            def time_enc(tag):
                E._encode_call.clear_cache()
                out = E._encode_call(wd, sz, tile=1024,
                                     packet_size=data.shape[1],
                                     out_groups=og)
                np.asarray(out[1][0:1, 0:1])
                ts = []
                for _ in range(args.reps):
                    t0 = time.time()
                    out = E._encode_call(wd, sz, tile=1024,
                                         packet_size=data.shape[1],
                                         out_groups=og)
                    np.asarray(out[1][0:1, 0:1])
                    ts.append(time.time() - t0)
                assert_bitstream_equal(out)
                print(f"{tag}: {data.size / min(ts) / 1e9:.4f} GB/s",
                      flush=True)

            configs = (
                # (offset, dump_words, unroll)
                (False, 2, 4),   # 0: adopted baseline re-anchor
                (False, 1, 4),   # 1: dump every word
                (False, 4, 4),   # 2: dump every 4 words
                (True,  2, 4),   # 3: OFFSET_STATE
                (True,  1, 4),   # 4: OFFSET + dump=1
                (False, 2, 8),   # 5: unroll=8 re-check
                (True,  2, 8),   # 6: OFFSET + unroll=8
            )
            sel = range(len(configs)) if args.only is None else [args.only]
            try:
                for i, (off, dump, unroll) in enumerate(configs):
                    if i not in sel:
                        continue
                    E.OFFSET_STATE = off
                    E.DUMP_WORDS = dump
                    E.UNROLL_WORDS = unroll
                    try:
                        time_enc(f"enc-r4[{i}] {'OFFSET ' if off else ''}"
                                 f"dump={dump} unroll={unroll}")
                    except Exception as e:
                        print(f"enc-r4[{i}]: FAIL {type(e).__name__}: {e}",
                              flush=True)
            finally:
                (E.DUMP_WORDS, E.UNROLL_WORDS, E.OFFSET_STATE) = esaved
            return

        if args.r4:
            # --- round-4 grid (VERDICT r3 next #2): cross-stream paired
            # div, streams/tile re-sweep under the shorter OFFSET chain,
            # unroll re-sweep (always re-sweep unroll after chain edits).
            D.PAIRED_DIV, D.FREE_RUN = True, True
            configs = (
                # (xdiv, offset, streams, tile, unroll)
                (False, False, 2, 1024, 2),   # 0: r3 adopted re-anchor
                (True,  False, 2, 1024, 2),   # 1: XDIV alone
                (True,  True,  2, 1024, 2),   # 2: XDIV + OFFSET
                (True,  True,  3, 1536, 2),   # 3: XDIV + OFFSET, 3 chains
                (False, True,  2, 1024, 4),   # 4: unroll=4 under OFFSET
                (True,  True,  2, 1024, 4),   # 5: XDIV+OFFSET unroll=4
                (False, True,  4, 2048, 2),   # 6: 4 chains @ w=512
                (True,  True,  4, 2048, 2),   # 7: XDIV, 4 chains @ w=512
            )
            sel = range(len(configs)) if args.only is None else [args.only]
            for i, (xd, off, streams, tile, unroll) in enumerate(configs):
                if i not in sel:
                    continue
                D.XDIV = xd
                D.OFFSET_STATE = off
                D.STREAMS = streams
                D.UNROLL_WORDS = unroll
                run(f"r4[{i}] {'XDIV ' if xd else ''}"
                    f"{'OFFSET ' if off else ''}streams={streams} "
                    f"tile={tile} unroll={unroll}",
                    packets, sizes, data, tile=tile, reps=args.reps)
            return

        if args.chunk:
            # --- CHUNK_WORDS 32 vs 64, both kernels: halves the grid's
            # time-chunk count (fewer per-chunk overheads: refill-hull
            # recompute + speculation snapshot on decode, hull dispatch
            # + mid-stream finish on encode) at unchanged loop-iteration
            # count.  Aligned with the r4 issue-bound finding: these are
            # op-count cuts, not scheduling changes. ---
            D.PAIRED_DIV, D.FREE_RUN = True, True
            E = pallas_encode
            og2, _ = E.out_geometry(data.shape[1])
            wd = jnp.asarray(np.ascontiguousarray(data).view(np.int32))
            sz = jnp.asarray(sizes.reshape(1, -1))

            def time_enc(tag):
                E._encode_call.clear_cache()
                out = E._encode_call(wd, sz, tile=1024,
                                     packet_size=data.shape[1],
                                     out_groups=og2)
                np.asarray(out[1][0:1, 0:1])
                ts = []
                for _ in range(args.reps):
                    t0 = time.time()
                    out = E._encode_call(wd, sz, tile=1024,
                                         packet_size=data.shape[1],
                                         out_groups=og2)
                    np.asarray(out[1][0:1, 0:1])
                    ts.append(time.time() - t0)
                assert_bitstream_equal(out)
                print(f"{tag}: {data.size / min(ts) / 1e9:.4f} GB/s",
                      flush=True)

            # Indices: 0/1 decode chunk 32/64, 2/3 encode chunk 32/64.
            sel = range(4) if args.only is None else [args.only]
            dsave, esave = D.CHUNK_WORDS, E.CHUNK_WORDS
            try:
                for i, cw in ((0, 32), (1, 64)):
                    if i not in sel:
                        continue
                    D.CHUNK_WORDS = cw
                    run(f"decode chunk={cw} streams=2 tile=1024",
                        packets, sizes, data, tile=1024, reps=args.reps)
                for i, cw in ((2, 32), (3, 64)):
                    if i not in sel:
                        continue
                    E.CHUNK_WORDS = cw
                    time_enc(f"encode chunk={cw} dump={E.DUMP_WORDS} "
                             f"unroll={E.UNROLL_WORDS}")
            finally:
                D.CHUNK_WORDS, E.CHUNK_WORDS = dsave, esave
            return

        if args.hull:
            # --- DECODE_HULL A/B on the chosen corpus: is the
            # speculative low-window bet (snapshot copies + per-symbol
            # miss checks + discarded chunks) paying on this content
            # class?  Both variants are bit-exact (run() asserts). ---
            D.PAIRED_DIV, D.FREE_RUN = True, True
            sel = range(2) if args.only is None else [args.only]
            for i, hull in enumerate((True, False)):
                if i not in sel:
                    continue
                D.DECODE_HULL = hull
                run(f"{args.corpus} HULL={'on ' if hull else 'off'} "
                    "streams=2 tile=1024",
                    packets, sizes, data, tile=1024, reps=args.reps)
            D.DECODE_HULL = saved["DECODE_HULL"]
            return

        if args.offset:
            # --- OFFSET_STATE: (lower, R, D) vs (lower, upper, code) ---
            D.PAIRED_DIV, D.FREE_RUN = True, True
            # Indices for --only: 0-3 decode configs, 4-5 encode A/B.
            configs = (
                (False, 2, 1024, False),   # adopted r3 baseline
                (True, 2, 1024, False),
                (True, 3, 1536, False),    # offset + third chain
                (True, 2, 1024, True))     # offset + stacked scalar
            sel = range(6) if args.only is None else [args.only]
            for i, (off, streams, tile, stk) in enumerate(configs):
                if i not in sel:
                    continue
                D.OFFSET_STATE = off
                D.STREAMS = streams
                D.STACK_SCALAR = stk
                run(f"{'OFFSET' if off else 'base  '} streams={streams} "
                    f"tile={tile}{' STACK' if stk else ''}",
                    packets, sizes, data, tile=tile, reps=args.reps)
            D.OFFSET_STATE = saved["OFFSET_STATE"]
            D.STREAMS = saved["STREAMS"]
            D.STACK_SCALAR = saved["STACK_SCALAR"]

            # Encode: same state change, same A/B.
            E = pallas_encode
            og, _ = E.out_geometry(data.shape[1])
            wd = jnp.asarray(np.ascontiguousarray(data).view(np.int32))
            sz = jnp.asarray(sizes.reshape(1, -1))

            def time_enc(tag, check=True):
                E._encode_call.clear_cache()
                out = E._encode_call(wd, sz, tile=1024,
                                     packet_size=data.shape[1],
                                     out_groups=og)
                np.asarray(out[1][0:1, 0:1])
                ts = []
                for _ in range(args.reps):
                    t0 = time.time()
                    out = E._encode_call(wd, sz, tile=1024,
                                         packet_size=data.shape[1],
                                         out_groups=og)
                    np.asarray(out[1][0:1, 0:1])
                    ts.append(time.time() - t0)
                if check:
                    # Bit-exactness vs the frozen default-knob encode.
                    assert_bitstream_equal(out)
                print(f"{tag}: {data.size / min(ts) / 1e9:.4f} GB/s",
                      flush=True)

            for i, off in ((4, False), (5, True)):
                if i not in sel:
                    continue
                E.OFFSET_STATE = off
                try:
                    time_enc(f"ENCODE {'OFFSET' if off else 'base  '}")
                finally:
                    E.OFFSET_STATE = False
            return

        if args.stack:
            # --- STACK_SCALAR: streams' scalar chains merged full-width ---
            D.PAIRED_DIV, D.FREE_RUN = True, True
            configs = (
                (False, 2, 2, 1024),   # adopted r3 baseline
                (True, 2, 2, 1024),
                (True, 4, 2, 1024),
                (True, 2, 4, 1024),    # 4 streams, one merged chain
                (True, 1, 2, 1024),
                (False, 2, 3, 1536))   # 3 chains at the SAME w=512 slice
                                       # width as the s2@1024 baseline
            if args.only is not None:
                configs = configs[args.only: args.only + 1]
            for stack, unroll, streams, tile in configs:
                D.STACK_SCALAR = stack
                D.UNROLL_WORDS = unroll
                D.STREAMS = streams
                run(f"{'STACK' if stack else 'base '} unroll={unroll} "
                    f"streams={streams} tile={tile}",
                    packets, sizes, data, tile=tile, reps=args.reps)
            D.STACK_SCALAR = False
            return

        # --- final decode sweep: unroll / chunk on the pdiv winner ---
        D.PAIRED_DIV, D.FREE_RUN = True, True
        for unroll, streams, tile in ((2, 2, 1024), (4, 2, 1024),
                                      (2, 3, 1152), (4, 3, 1152)):
            D.UNROLL_WORDS = unroll
            D.STREAMS = streams
            run(f"REAL pdiv unroll={unroll} streams={streams} tile={tile}",
                packets, sizes, data, tile=tile, reps=args.reps)
    finally:
        for k, v in saved.items():
            setattr(D, k, v)


if __name__ == "__main__":
    main()
