"""Pallas TPU decode kernel: batch-parallel adaptive arithmetic decoding.

Mirror of ops/pallas_encode.py (reference: jiahansu/GPUAR
src/gpuar_kernel.cu garDecompress :916-934 / arDecompress :848-892).  Same
layouts: model C [256, TILE] with one-hot search/queries, packets in the
big2d [groups, 8*TILE] word layout.

Measured design rules (benchmarks/probe_model.py, iterbench.py,
probe_decode_r2.py):

  * the scalar loop costs ~470 ns/iteration regardless of body, so
    UNROLL_WORDS words are decoded per iteration;
  * the per-lane bit cursor advances at most 16 bits/symbol, so an 8-word
    lookahead ring refilled every REFILL_WORDS=2 words is always safe —
    no data-dependent refill condition (a jnp.any() sync) is needed;
  * the refill gather normally scans only a WIN-row window around the
    scalar hull of the per-lane cursors (computed once per chunk);
    divergent batches fall back to the full-range scan;
  * the decoded-byte store row is uniform per word, so a dynamic
    single-row store replaces a masked full-column pass;
  * the symbol search is fused with the range query: C is strictly
    increasing, so one pass yields sym, low = max{C <= unscaled} and
    high = min{C > unscaled};
  * STREAMS: ablation timing (round 2) showed the per-symbol scalar
    chain (renorm + exact-div, ~150 dependent [1,TILE] ops) is LATENCY
    bound — with every table/window stage removed the kernel still ran
    at only ~2x full speed.  The tile is therefore split into STREAMS
    independent column slices with separate coder carries, interleaved
    per symbol, so one stream's dependency stalls hide under the
    others' work (and under the table passes);
  * an int16 table would halve table-pass traffic but the v5e VPU lowers
    neither 16-bit reductions nor 16-bit ordered compares (measured);
  * DECODE_HULL: the speculative low-window bet (see the constant's
    comment and ARCHITECTURE.md) — text-class tiles decode with half
    the table traffic, misses are detected exactly and re-run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuar_tpu.config import UNCOMPRESSED_PACKET_SIZE
from gpuar_tpu.ops.pallas_encode import _exact_div, out_geometry

CHUNK_WORDS = 32   # output words per grid time-chunk (refill-window pacing)

U16 = 0xFFFF
DUAL_TABLE = False  # half-height table probe: row r packs C[2r] |
                    # C[2r+1] << 16 so every pass touches 128 rows.
                    # MEASURED WORSE (random 0.71 vs 0.87, proxy neutral):
                    # the symbol needs a count reduction (leL+leH) again
                    # and three half-height chains + parity selects cost
                    # more than the fused 2-chain 256-row form saves.
                    # Kept as a documented negative-result probe knob.
DECODE_HULL = True  # speculative low-window decode: chunks are first run
                    # with table ops on rows [0,128) only, with a
                    # per-symbol miss check (unscaled >= C[128], C[128]
                    # carried incrementally); any miss discards the chunk,
                    # restores the table from a snapshot, re-runs it
                    # full-range and makes the TILE sticky-full.  ASCII
                    # tiles decode with half the table traffic; random
                    # tiles pay one discarded chunk (1/64 of the work).
STREAMS = 2        # independent interleaved lane-slices per kernel
PAIR_STEP = False  # two-symbol decode step (round 5; the algorithm-level
                   # exit named by PROBES_r4's residual analysis).  EXACT,
                   # not speculative: with the index-packed table
                   # (row i = C[i] << 8 | i), symbol 2's search on the
                   # STALE table (before symbol 1's suffix increment) is
                   # made post-update-exact by folding the update into the
                   # threshold's low byte —
                   #   C'[i] <= u2  <=>  P[i] <= (u2 << 8) | sym1
                   # (rows with C == u2 qualify iff i <= sym1, exactly the
                   # rows the increment has not pushed past u2) — and the
                   # true bounds need only closed-form fixups
                   # low2 += (sym2 > sym1), high2 += (sym2 >= sym1).
                   # Per pair this saves one whole table read-modify-write
                   # (both symbols' suffix increments land in ONE merged
                   # pass, 3 -> 2.5 table passes/symbol), shares one
                   # 32-bit bit-extraction window (s1 + s2 <= 32 bits),
                   # and does the carried-window advance once.  No miss
                   # detection, no re-run: bit-exact by construction.
                   # MEASURED NEGATIVE, default off (PROBES_r5.md): random
                   # 0.88-0.93 vs base 0.94 (streams=2), 0.94 vs 1.00
                   # (streams=3), proxy/win-mode 1.24 vs 1.28 — the merged
                   # pass saves ~0.5 of ~9 table stages/symbol while the
                   # pair's LATE table write (after symbol 2's search)
                   # serializes against the next pair's read.  Covered by
                   # tests/test_pair_step.py either way.
PAIR_WINONLY = False  # PAIR_STEP variant isolating the SCALAR-sharing
                   # term alone: table ops stay exactly baseline (fresh
                   # read per symbol, plain |255 threshold, immediate
                   # update write — no held stale value, no fixups), and
                   # only the bit-window bookkeeping pairs up (one window
                   # build and ONE ring gather per pair instead of two —
                   # a pair's word cursor advances at most 1).
PAIR_SPLITW = False  # PAIR_STEP variant probing WHERE the pair loses:
                   # keep baseline's two update writes (write symbol 1's
                   # increment right after its search) but still search
                   # symbol 2 on the HELD stale value via the threshold
                   # trick — so the write->read edge between the big
                   # [rows, w] VMEM passes disappears for every odd
                   # symbol while the pass count stays baseline's.  The
                   # second update pass re-reads the table (a true
                   # read-after-write keeps the first store live) and
                   # bumps rows above the POST-update-1 packed row of
                   # symbol 2.
FUSE_UPDATE = False  # fold the model update into the NEXT symbol's search
                    # traversal: the packed table row is C[i] << 8 | i and
                    # the update condition "bump every row i > sym" tests
                    # only the IMMUTABLE index byte, so pending updates
                    # commute — they are re-applied in registers on top of
                    # the stale table read (idx = Cs & 255; one
                    # compare+add per pending) and the write-back is
                    # deferred to every FUSE_K symbols.  MEASURED WORSE
                    # (random 0.80 vs 0.876 at k=1, monotonically worse
                    # with k; even the scalar-ablated floor drops 1.40 ->
                    # 0.89 at k=4): Mosaic materialises each pending
                    # compare+add as its own [256, w] traversal instead of
                    # fusing it into the search read, so "free" per-element
                    # ops cost full passes — round 2's K-batching lesson
                    # again (benchmarks/PROBES_r3.md).  Probe knob only.
FUSE_K = 4          # symbols between table write-backs (clamped to the
                    # symbols per unrolled loop iteration so no pending
                    # crosses a fori_loop carry)
PAIRED_DIV = True   # stack the two exact-divs by cum (for lo2/up2) into
                    # one [2, w] op: same dependency depth, half the issue
                    # count for the div section of the scalar chain
OFFSET_STATE = False  # carry (lower, R = span, D = code - lower) instead
                    # of (lower, upper, code).  Every renorm shift maps
                    # R -> 2R and D -> 2D | bit (the straddle's -0x4000
                    # cancels in code - lower), so the closed form loses
                    # the span recompute (upper - lower + 1), the up3
                    # reconstruction ((ua << k) | mask | 0x8000) and the
                    # data-dependent straddle xor on code — ~6 issue ops
                    # and ~3 levels off the per-symbol serial chain.  The
                    # state rows 1/2 hold R/D end to end (nothing outside
                    # the symbol step reads upper/code; the debug final
                    # cursor is row 3).  Search/update and speculation are
                    # untouched.  Measured on-chip before adoption
                    # (benchmarks/probe_decode_r3.py --offset).
XDIV = False        # cross-stream PAIRED_DIV: concatenate ALL streams'
                    # (low*span, high*span) rows into one [2*STREAMS, w]
                    # exact-div per symbol position instead of one [2, w]
                    # div per stream — the div section's issue count drops
                    # by another factor of STREAMS at unchanged depth,
                    # without coupling the rest of the scalar chains the
                    # way STACK_SCALAR does.  Requires PAIRED_DIV.
                    # Measured on-chip before adoption
                    # (benchmarks/probe_decode_r3.py --r4).
STACK_SCALAR = False  # merge the STREAMS scalar chains into full-width
                    # [1, tile] ops: the streams' renorm/div sequences are
                    # op-for-op identical, so stacking them column-wise
                    # halves the scalar section's ISSUE count (the
                    # PAIRED_DIV lesson applied to the whole chain) at the
                    # price of coupling the two dependency chains — the
                    # merged chain's latency is no longer hidden by the
                    # other stream.  Table passes stay per-stream
                    # [256, tile/STREAMS].  Measured on-chip before
                    # adoption (benchmarks/probe_decode_r3.py --stack)
FREE_RUN = True     # release mode only: drop the per-symbol
                    # where(active, ...) selects on lower/upper/code and
                    # let finished lanes free-run — their garbage state is
                    # provably harmless (bounded by the & U16 masks, rows
                    # excluded from the refill hull by alive0, ring reads
                    # beyond the buffer read zeros, output beyond
                    # raw_size is sliced off by the host splice); debug
                    # mode keeps the masks so the final bit cursor stays
                    # exact for the overrun check
PAIR14 = False      # pair-packed table: row i = C[i] << 14 | C[i+1]
                    # (counts < 2**14 = MAX_PROBABILITY).  One max chain
                    # over `row <= (unscaled << 14 | 0x3FFF)` yields BOTH
                    # range bounds (the encode-side trick, adapted), so
                    # decode's min chain for C[sym+1] — and its sentinel
                    # and carried-C[128] bookkeeping — disappear; the
                    # symbol index moves to a sum chain over the same
                    # compare mask.  MEASURED MUCH WORSE (random 0.60 vs
                    # 0.92, benchmarks/PROBES_r3.md): on decode the sum
                    # chain + the two-compare update cost more than the
                    # min chain they replace — "reduction CHAIN COUNT
                    # beats per-pass op count" cuts both ways.  Probe
                    # knob only; bit-exact, covered by interpret tests.
INTERPRET_STREAMS = False  # test knob: honor STREAMS (and STACK_SCALAR)
                           # in interpret mode too — tiny tiles only
ABLATE_SCALAR = False  # probe knob: replace the serial renorm/unscale
                       # chain with 1-op state updates — WRONG OUTPUT,
                       # honest timing — to measure the table-pass floor
                       # (the algorithmic ceiling; benchmarks/probe_decode_r3)
ABLATE_REFILL = False  # probe knob: skip ring refills for the same floor
PHASE_SPLIT = False  # search/search/scalar/scalar phase layout: measured
                     # WORSE than full-step interleave (0.82 vs 0.85 GB/s,
                     # same-session A/B) — Mosaic schedules the plain
                     # per-stream step order better; kept as a probe knob
UNROLL_WORDS = 2   # words decoded per scalar-loop iteration (with 2
                   # interleaved streams the loop body already carries 16
                   # symbol steps; swept 2/4/8/16 on-chip, 2 edges out 4)
REFILL_WORDS = 2   # ring refill cadence: one refill serves REFILL_WORDS*4
# symbols consuming at most REFILL_WORDS*2 words; the carried window's
# +2-word lookahead (same bound for the per-symbol and PAIR_STEP paths —
# a pair's word cursor advances at most 1, see pair_step) must stay
# STRICTLY inside the 8-word ring (slot (rb+8)&7 aliases word rb), so
# the furthest fetched word rb + REFILL_WORDS*2 + 2 must be < rb + 8.
assert REFILL_WORDS * 2 + 2 < 8
WIN_PAD = 7        # refill hull-window padding rows (see refill_win);
                   # swept 39/23/15/7 on-chip: with the mid-tier window
                   # as the spillover, the tightest fast window wins
                   # (tiers only change how many rows the passes scan)
# The word loop runs (chunk_words / unroll) iterations; a non-divisor would
# silently drop the tail words of every chunk.
assert CHUNK_WORDS % UNROLL_WORDS == 0
assert UNROLL_WORDS % REFILL_WORDS == 0


def _fuse_k(unroll: int) -> int:
    """Deferred-update flush cadence: FUSE_K clamped so it divides the
    symbols per loop iteration (pending lists must empty each iteration)."""
    per_iter = 4 * unroll
    k = min(FUSE_K, per_iter)
    while per_iter % k:
        k -= 1
    return k


def _clz16(x):
    return jax.lax.clz(x) - 16


def _shr_u(x, n):
    return jax.lax.shift_right_logical(x, n)


def _decode_kernel(sizes_ref, in_ref, *refs,
                   tile, steps_per_chunk, n_chunks, out_groups, unroll,
                   streams, debug, fuse_k, stacked, hull, pair):
    if debug:
        out_ref, flag_ref, st, *scratch = refs
    else:
        out_ref, st, *scratch = refs
        flag_ref = None
    t_chunk = pl.program_id(1)
    i32 = jnp.int32
    w = tile // streams  # lanes per stream slice
    if stacked:
        # STACK_SCALAR: one full-width ring (streams occupy column
        # slices) so the carried bit-window ops run once at [*, tile].
        ring_fw = scratch[0]
        Cs_all = scratch[1: 1 + streams]
        snaps = scratch[1 + streams:]
        rings = None
    else:
        # Per-stream table/ring scratch buffers: SEPARATE buffers (not
        # column slices of one) so Mosaic sees the streams' loads/stores
        # as disjoint and can interleave their dependency chains freely.
        ring_fw = None
        Cs_all = scratch[:streams]
        rings = scratch[streams: 2 * streams]
        snaps = scratch[2 * streams:]
    iota256 = jax.lax.broadcasted_iota(i32, (256, w), 0)
    iota128 = jax.lax.broadcasted_iota(i32, (128, w), 0)
    iota8 = jax.lax.broadcasted_iota(i32, (8, w), 0)
    iota8f = jax.lax.broadcasted_iota(i32, (8, tile), 0)
    grows = jax.lax.broadcasted_iota(i32, (out_groups, w), 0)
    zeros = jnp.zeros((1, w), i32)
    zeros_f = jnp.zeros((1, tile), i32)
    los = [s * w for s in range(streams)]

    def ring_write(s, j, val):
        if stacked:
            ring_fw[j: j + 1, los[s]: los[s] + w] = val
        else:
            rings[s][j: j + 1, :] = val

    def ring_read(s):
        if stacked:
            return ring_fw[:, los[s]: los[s] + w]
        return rings[s][:]

    def refill_full(s, rb):
        """Load per-lane words [rb, rb+8) into the ring (slot = word & 7):
        one masked column-sum per slot over the full group range."""
        lo = los[s]
        for j in range(8):
            colj = in_ref[:, j * tile + lo: j * tile + lo + w]
            wj = grows * 8 + j
            inr = (wj >= rb) & (wj < rb + 8)
            ring_write(s, j, jnp.sum(
                jnp.where(inr, colj, 0), axis=0, keepdims=True
            ))

    @pl.when(t_chunk == 0)
    def _init():
        # Index-packed model: row i holds C[i] << 8 | i (counts < 2**14,
        # indices < 2**8 -> fits i32 and preserves order).  One max chain
        # over the search mask then yields BOTH the range bound C[sym] and
        # the symbol itself, eliminating a whole sum-reduction per step.
        for s, lo in enumerate(los):
            if DUAL_TABLE:
                # C[i] = i initially: row r = 2r | (2r+1) << 16.
                base = jnp.arange(128, dtype=i32)
                Cs_all[s][:] = jnp.broadcast_to(
                    (2 * base | ((2 * base + 1) << 16))[:, None], (128, w)
                )
            elif PAIR14:
                # C[i] = i initially: row i = i << 14 | (i + 1).
                base = jnp.arange(256, dtype=i32)
                Cs_all[s][:] = jnp.broadcast_to(
                    ((base << 14) | (base + 1))[:, None], (256, w)
                )
            else:
                Cs_all[s][:] = jnp.broadcast_to(
                    (jnp.arange(256, dtype=i32) * 257)[:, None], (256, w)
                )
            refill_full(s, zeros)
            # initializeDecoder (src/gpuar_kernel.cu:582-603): code = the
            # first 16 stream bits; the stream starts after the 4-byte
            # header (word 1).
            w1 = jnp.sum(
                jnp.where(iota8 == 1, ring_read(s), 0),
                axis=0, keepdims=True)
            st[0:1, lo: lo + w] = zeros            # lower
            # OFFSET_STATE: row 1 = R (span, init 0x10000), row 2 = D =
            # code - lower (init lower = 0 -> D = code either way).
            st[1:2, lo: lo + w] = zeros + (
                0x10000 if OFFSET_STATE else U16)  # upper / R
            st[2:3, lo: lo + w] = _shr_u(w1, 16)   # code / D
            st[3:4, lo: lo + w] = zeros + 48       # bitpos (word 0 + 16)
            st[4:5, lo: lo + w] = zeros            # debug flag
            st[5:6, lo: lo + w] = zeros            # sticky full-table mode

    raw_sizes = sizes_ref[:]

    # Windowed refill (see encode's windowed dump): scalar hull of the
    # per-lane cursor rows, taken once per chunk over ALL streams.
    # Worst-case cursor growth within one chunk: <= 16 bits/symbol =
    # steps_per_chunk/16 rows, +3 rows of ring lookahead/alignment slack.
    # Two window tiers: heterogeneous batches (e.g. mixed text files)
    # spread the hull past the tight window but usually not to the full
    # range — the mid tier catches them before the full-range fallback.
    GROW = steps_per_chunk // 16 + 3
    WIN = min((GROW + WIN_PAD) & ~7, out_groups)
    WIN_MID = min(((GROW + WIN_PAD) * 4) & ~7, out_groups)
    alive0 = (t_chunk * steps_per_chunk) < raw_sizes
    rows0 = st[3:4, :] >> 8          # bitpos -> word -> group row
    klo0 = jnp.min(jnp.where(alive0, rows0, jnp.int32(1 << 20)))
    khi = jnp.max(jnp.where(alive0, rows0, jnp.int32(0)))

    def clamp(k, win):
        k = jnp.clip(k, 0, out_groups - win) & ~7
        return pl.multiple_of(k, 8)

    klo = clamp(klo0, WIN)
    klo_m = clamp(klo0, WIN_MID)
    fast = (khi + GROW) <= (klo + WIN)
    mid = (khi + GROW) <= (klo_m + WIN_MID)

    def refill_win(s, rb, base, win):
        lo = los[s]
        wrows = jax.lax.broadcasted_iota(i32, (win, w), 0)
        for j in range(8):
            colj = in_ref[pl.ds(base, win), j * tile + lo: j * tile + lo + w]
            wj = (base + wrows) * 8 + j
            inr = (wj >= rb) & (wj < rb + 8)
            ring_write(s, j, jnp.sum(
                jnp.where(inr, colj, 0), axis=0, keepdims=True
            ))

    def refill(s, rb):
        if ABLATE_REFILL:
            return

        @pl.when(fast)
        def _():
            refill_win(s, rb, klo, WIN)

        @pl.when(jnp.logical_not(fast) & mid)
        def _():
            refill_win(s, rb, klo_m, WIN_MID)

        @pl.when(jnp.logical_not(fast) & jnp.logical_not(mid))
        def _():
            refill_full(s, rb)

    def search_step(si, sizes_s, t, carry, mode, pend, fuse_k):
        """Table half of a symbol step: unscale, fused search, update.

        Split from scalar_step so the two streams' phases can be laid out
        search/search/scalar/scalar (a measured-worse probe layout); in
        'win' mode the table ops touch only rows [0,128) and record a
        per-lane miss flag when the true symbol lies above (see
        DECODE_HULL).

        With FUSE_UPDATE, `pend` is this stream's Python-level list of
        not-yet-written symbol updates (each a [1, w] masked symbol
        vector); they are re-applied in registers on the stale table read
        and flushed to VMEM every `fuse_k` symbols.  fuse_k divides the
        symbols per fori_loop iteration, so the list is always empty at
        iteration (and chunk) boundaries — no pending ever crosses a
        loop carry.
        """
        lower, upper, code, bitpos, w0, w1, flag, c128, miss, wacc = carry
        active = t < sizes_s
        cum = 256 + t

        # Symbol search (getUnscaledCode + getSymbolFromProbability,
        # :703-763) fused with the range query: C is strictly increasing,
        # so over the single pass that counts entries <= unscaled,
        # low = C[sym] = max{C[i] <= unscaled} and
        # high = C[sym+1] = min{C[i] > unscaled} come for free.
        # OFFSET_STATE: the `upper` slot holds R = span and the `code`
        # slot holds D = code - lower, so both the span recompute and the
        # code - lower subtract vanish from the chain head.
        span = upper if OFFSET_STATE else upper - lower + 1
        cum_s = jnp.int32(cum)
        if ABLATE_SCALAR:
            # Floor probe: data-varying stand-in, no div chain.
            unscaled = (code + t) & 0x3FFF
        else:
            num0 = code + 1 if OFFSET_STATE else code - lower + 1
            unscaled = _exact_div(num0 * cum - 1, span)
        # Index-packed compare: Cp[i] <= (u<<8 | 255) <=> C[i] <= u.
        # The compare is recomputed inside each consumer (instead of a
        # shared materialized mask) so every table traversal is a single
        # fused compare+select+reduce read.
        if DUAL_TABLE:
            if mode == "win":
                miss = miss | (active & (unscaled >= c128))
                rows, top = 64, c128
                c128 = c128 + active.astype(i32)
            else:
                rows, top = 128, cum_s
            P = Cs_all[si][0:rows, :]
            Plow = P & U16
            Phigh = _shr_u(P, 16)
            leL = Plow <= unscaled       # 2r <= sym
            leH = Phigh <= unscaled      # 2r + 1 <= sym
            # Pair row at the symbol: P monotone, leL is a prefix mask.
            maxP = jnp.max(jnp.where(leL, P, -1), axis=0, keepdims=True)
            # sym + 1 = #{j: C[j] <= unscaled} over both packed halves.
            sym = jnp.sum(leL.astype(i32) + leH.astype(i32),
                          axis=0, keepdims=True) - 1
            # Odd sym: C[sym+1] = next row's LOW half = min low over
            # rows whose high entry lies above the symbol; its default
            # (`top`) also covers sym == 2*rows-1 (C[2*rows] implicit).
            nxt = jnp.min(jnp.where(leH, 0x7FFFFFFF, Plow),
                          axis=0, keepdims=True)
            nxt = jnp.minimum(nxt, top)
            odd = sym & 1
            low = jnp.where(odd > 0, _shr_u(maxP, 16), maxP & U16)
            high = jnp.where(odd > 0, nxt, _shr_u(maxP, 16))
            # Inactive lanes carry garbage through the search; clamp so
            # the downstream products stay within i32 (active lanes are
            # untouched: low <= high <= cum < 2**14).
            low = jnp.where(active, low, 0)
            high = jnp.where(active, high, 0)
            # Suffix update from r* = sym >> 1 (closed form — see
            # DUAL_TABLE): low halves bump for r > r*, high halves for
            # r > r* or (r == r* and sym even); inactive lanes get the
            # out-of-range sentinel.
            rstarA = jnp.where(active, _shr_u(sym, 1), rows)
            # A fresh iota at the window shape: slicing a materialized
            # (128, w) iota crashes Mosaic's layout pass (round 2).
            iotaR = jax.lax.broadcasted_iota(i32, (rows, w), 0)
            gt = (iotaR > rstarA).astype(i32)
            geH = gt | ((iotaR == rstarA) & (odd == 0)).astype(i32)
            Cs_all[si][0:rows, :] = P + (gt | (geH << 16))
        elif PAIR14:
            # Pair-packed search: one compare mask `P <= up` feeds a max
            # chain (-> C[sym] << 14 | C[sym+1]: BOTH bounds, no min
            # chain, no sentinel) and a sum chain (-> sym).  The update
            # tests the packed halves' values directly: high half bumps
            # iff C[i] > u (whole-row compare, low bits can't flip it),
            # low half iff C[i+1] > u.
            up = (unscaled << 14) | 0x3FFF
            if mode == "win":
                # unscaled >= C[128] means the symbol is outside the
                # window: this lane's chunk output is garbage from here
                # on — flag it; the chunk is discarded and re-run full.
                # (C[128] rides row 127's low half, but carrying it costs
                # no table traffic.)
                miss = miss | (active & (unscaled >= c128))
                c128 = c128 + active.astype(i32)
                Cs = Cs_all[si][0:128, :]
            else:
                Cs = Cs_all[si][:]
            le = Cs <= up
            packed = jnp.max(jnp.where(le, Cs, -1), axis=0, keepdims=True)
            sym = jnp.sum(le.astype(i32), axis=0, keepdims=True) - 1
            low = _shr_u(packed, 14)
            high = packed & 0x3FFF
            # Adaptive update (applySymbolRange tail, :286-288): row i
            # adds (C[i] > u) << 14 | (C[i+1] > u); inactive lanes add 0.
            upd = jnp.where(
                active,
                ((Cs > up).astype(i32) << 14)
                + ((Cs & 0x3FFF) > unscaled).astype(i32),
                0)
            if mode == "win":
                Cs_all[si][0:128, :] = Cs + upd
            else:
                Cs_all[si][:] = Cs + upd
        else:
            up = (unscaled << 8) | 255
            inc = active.astype(i32) << 8
            if mode == "win":
                # unscaled >= C[128] means the symbol is outside the
                # window: this lane's chunk output is garbage from here
                # on — flag it; the chunk is discarded and re-run full.
                miss = miss | (active & (unscaled >= c128))
                # sym == 127 falls through to the carried C[128] (taken
                # BEFORE this symbol's own increment).
                sent = (c128 << 8) | 128
                c128 = c128 + active.astype(i32)
                Cs0 = Cs_all[si][0:128, :]
            else:
                # Sentinel (cum<<8)|255 >= every packed entry, so the
                # sym == 255 case (high = implicit C[256] = cum) falls
                # out of the same min.
                sent = (cum_s << 8) | 255
                Cs0 = Cs_all[si][:]
            if FUSE_UPDATE:
                # Pending updates ride the search read: the condition
                # "row i > sym" tests only the immutable index byte, so
                # deferred updates commute against the stale read.
                idx = Cs0 & 255
                if pend:
                    upd = (idx > pend[0]).astype(i32)
                    for sp in pend[1:]:
                        upd = upd + (idx > sp).astype(i32)
                    Cs = Cs0 + (upd << 8)
                else:
                    Cs = Cs0
                packed = jnp.max(jnp.where(Cs <= up, Cs, -1),
                                 axis=0, keepdims=True)
                high = _shr_u(
                    jnp.min(jnp.where(Cs > up, Cs, sent),
                            axis=0, keepdims=True),
                    8)
                # Adaptive update (applySymbolRange tail, :286-288),
                # deferred: i > sym (index byte), inactive lanes use the
                # out-of-range sentinel 256.
                symA = jnp.where(active, packed & 255, 256)
                pend.append(symA)
                if len(pend) == fuse_k:
                    Cs = Cs + ((idx > symA).astype(i32) << 8)
                    if mode == "win":
                        Cs_all[si][0:128, :] = Cs
                    else:
                        Cs_all[si][:] = Cs
                    pend.clear()
            else:
                Cs = Cs0
                packed = jnp.max(jnp.where(Cs <= up, Cs, -1),
                                 axis=0, keepdims=True)
                high = _shr_u(
                    jnp.min(jnp.where(Cs > up, Cs, sent),
                            axis=0, keepdims=True),
                    8)
                # Adaptive update (applySymbolRange tail, :286-288):
                # i > sym is exactly "not le" (C strictly increasing);
                # the packed count increment is 1 << 8.
                if mode == "win":
                    Cs_all[si][0:128, :] = Cs + jnp.where(Cs > up, inc, 0)
                else:
                    Cs_all[si][:] = Cs + jnp.where(Cs > up, inc, 0)
            low = _shr_u(packed, 8)      # C[sym] = max{C <= unscaled}
            sym = packed & 255           # its index IS the symbol
        sym = jnp.where(active, sym, 0)
        # low <= high <= cum holds for every lane (active or stale), so the
        # downstream range math cannot overflow; inactive lanes are masked
        # out of the carried state below.  The updated c128/miss travel in
        # `part` — scalar_step folds them into the carry it returns.
        return (active, cum, cum_s, span, unscaled, low, high, sym,
                c128, miss)

    def scalar_step(si, t, part, carry, q_pre=None):
        """Renormalisation / bit-window half of a symbol step.

        q_pre: precomputed [2, w] quotients (XDIV — the div was issued
        cross-stream as one [2*STREAMS, w] op in step())."""
        lower, upper, code, bitpos, w0, w1, flag, _, _, wacc = carry
        (active, cum, cum_s, span, unscaled, low, high, sym,
         c128, miss) = part

        if ABLATE_SCALAR:
            # Floor probe: keep the symbol store and a 1-op code update
            # (data stays varying), drop the whole renorm/bit-window
            # chain.  WRONG OUTPUT by design.
            wacc = wacc | (sym << ((t & 3) * 8))
            code = (code + low) & U16
            return (lower, upper, code, bitpos, w0, w1, flag, c128,
                    miss, wacc)

        if q_pre is not None or PAIRED_DIV:
            # One [2, w] div covers both bounds: same chain depth, half
            # the issue count for the div section.  Under XDIV the div
            # already happened cross-stream; q_pre carries this stream's
            # two rows.
            if q_pre is not None:
                q = q_pre
            else:
                num = jnp.concatenate([low * span, high * span], axis=0)
                q = _exact_div(num, cum_s)
            lo2 = (lower + q[0:1, :]) & U16
            if OFFSET_STATE:
                r2 = q[1:2, :] - q[0:1, :]
                d2 = code - q[0:1, :]
                up2 = (lo2 + r2 - 1) & U16
            else:
                up2 = (lower + q[1:2, :] - 1) & U16
        else:
            qlo = _exact_div(low * span, cum_s)
            qhi = _exact_div(high * span, cum_s)
            lo2 = (lower + qlo) & U16
            if OFFSET_STATE:
                r2 = qhi - qlo
                d2 = code - qlo
                up2 = (lo2 + r2 - 1) & U16
            else:
                up2 = (lower + qhi - 1) & U16

        if debug:
            # The reference's -D_DEBUG checks (src/gpuar_kernel.cu):
            # unknown symbol — unscaled beyond the table, the binary
            # search would fail (:758-762); range inversion after
            # applySymbolRange (:290-298).  Corrupt-but-well-framed
            # packets decode to silent garbage in release mode (same as
            # the reference); with debug=True the lane is flagged.
            flag = flag | (active & ((unscaled >= cum)
                                     | (unscaled < 0))).astype(i32)
            # Range inversion: in offset form lower > upper <=> R2 <= 0
            # (the up2 reconstruction wraps mod 2**16, so compare R).
            inv = (r2 <= 0) if OFFSET_STATE else (lo2 > up2)
            flag = flag | (active & inv).astype(i32)

        # Closed-form renormalisation; decode consumes s = m + k bits.
        m = _clz16(lo2 ^ up2)
        la = (lo2 << m) & U16
        ua = ((up2 << m) | ((1 << m) - 1)) & U16
        a = (la << 1) & U16
        b = ((ua << 1) | 1) & U16
        k = _clz16((~(a & ~b)) & U16)
        lo3 = (la << k) & 0x7FFF
        if OFFSET_STATE:
            # Every renorm shift doubles the range exactly, so R' falls
            # out of one shift — the whole up3 reconstruction disappears.
            # Active lanes have m + k <= 16 (R2 << s <= 0x10000); the
            # mask only bounds FREE_RUN garbage lanes.
            up3 = (r2 << (m + k)) & 0x1FFFF
        else:
            up3 = (((ua << k) | ((1 << k) - 1)) | 0x8000) & U16
        s = jnp.where(active, m + k, 0)

        # Extract s bits from the CARRIED two-word window [widx, widx+2)
        # (the per-symbol cursor advances <= 16 bits, so the window slides
        # by at most one word per step: one one-hot ring fetch of the
        # incoming word replaces two full window reads).
        boff = bitpos & 31
        win = (w0 << boff) | jnp.where(
            boff > 0, _shr_u(w1, (32 - boff) & 31), 0
        )
        bits = jnp.where(s > 0, _shr_u(win, (32 - s) & 31), 0)
        if OFFSET_STATE:
            # D' = (D2 << s) | bits exactly: the straddle's -0x4000 hits
            # code and lower alike and cancels in D — no xor select.
            code2 = ((d2 << s) | bits) & U16
        else:
            code2 = (((code << s) | bits)
                     ^ jnp.where(k >= 1, 0x8000, 0)) & U16
        widx = bitpos >> 5
        bitpos = bitpos + s
        adv = (bitpos >> 5) > widx
        nxt = jnp.sum(
            ring_read(si) * (iota8 == ((widx + 2) & 7)).astype(i32),
            axis=0, keepdims=True)
        w0 = jnp.where(adv, w1, w0)
        w1 = jnp.where(adv, nxt, w1)

        wacc = wacc | (sym << ((t & 3) * 8))
        if FREE_RUN and not debug:
            # Finished lanes free-run (see the FREE_RUN constant comment):
            # three selects per symbol gone from the issue-bound chain.
            lower, upper, code = lo3, up3, code2
        else:
            lower = jnp.where(active, lo3, lower)
            upper = jnp.where(active, up3, upper)
            code = jnp.where(active, code2, code)
        return (lower, upper, code, bitpos, w0, w1, flag, c128, miss, wacc)

    def pair_step(si, sizes_s, t, carry, mode):
        """Two-symbol decode step (PAIR_STEP — see the knob comment).

        Decodes symbols t and t+1 in one pass over the table value read:
        symbol 1 searches normally; symbol 2 searches the SAME (stale)
        read with the post-update-exact threshold (u2 << 8) | sym1 and
        closed-form +0/1 bound fixups; both suffix increments land in one
        merged read-modify-write.  The bit windows are shared: the pair
        consumes s1 + s2 <= 32 bits, exactly one 32-bit extraction window,
        and the carried two-word window advances once (lookahead reaches
        widx + 3 — covered by the REFILL_WORDS assert).  Reference analog:
        the per-symbol loop being restructured, src/gpuar_kernel.cu
        :727-763 (symbol search) and :787-836 (renorm).
        """
        lower, upper, code, bitpos, w0, w1, flag, c128, miss, wacc = carry
        active1 = t < sizes_s
        active2 = (t + 1) < sizes_s
        cum1 = 256 + t
        cum1_s = jnp.int32(cum1)
        cum2_s = jnp.int32(cum1 + 1)

        # ---- symbol 1: fused search on the committed table ----
        span1 = upper - lower + 1
        u1 = _exact_div((code - lower + 1) * cum1 - 1, span1)
        up1 = (u1 << 8) | 255
        if mode == "win":
            miss = miss | (active1 & (u1 >= c128))
            sent1 = (c128 << 8) | 128
            c128_stale = c128        # the stale table's C[128], packed low
            c128 = c128 + active1.astype(i32)
            Cs = Cs_all[si][0:128, :]
        else:
            sent1 = (cum1_s << 8) | 255
            Cs = Cs_all[si][:]
        packed1 = jnp.max(jnp.where(Cs <= up1, Cs, -1),
                          axis=0, keepdims=True)
        high1 = _shr_u(jnp.min(jnp.where(Cs > up1, Cs, sent1),
                               axis=0, keepdims=True), 8)
        low1 = _shr_u(packed1, 8)
        sym1 = packed1 & 255
        if PAIR_SPLITW or PAIR_WINONLY:
            # Early write of symbol 1's increment: under SPLITW nothing
            # downstream in this pair reads the table ref (symbol 2
            # searches the HELD stale value); under WINONLY symbol 2
            # re-reads it — exactly the baseline table schedule.
            up1w = jnp.where(active1, up1, jnp.int32(0x7FFFFFFF))
            if mode == "win":
                Cs_all[si][0:128, :] = Cs + jnp.where(Cs > up1w, 0x100, 0)
            else:
                Cs_all[si][:] = Cs + jnp.where(Cs > up1w, 0x100, 0)

        # ---- symbol 1: scalar half (narrow, renorm, bits) ----
        q = _exact_div(jnp.concatenate([low1 * span1, high1 * span1],
                                       axis=0), cum1_s)
        lo2 = (lower + q[0:1, :]) & U16
        up2 = (lower + q[1:2, :] - 1) & U16
        if debug:
            flag = flag | (active1 & ((u1 >= cum1)
                                      | (u1 < 0))).astype(i32)
            flag = flag | (active1 & (lo2 > up2)).astype(i32)
        m1 = _clz16(lo2 ^ up2)
        la = (lo2 << m1) & U16
        ua = ((up2 << m1) | ((1 << m1) - 1)) & U16
        a = (la << 1) & U16
        b = ((ua << 1) | 1) & U16
        k1 = _clz16((~(a & ~b)) & U16)
        lo3 = (la << k1) & 0x7FFF
        up3 = (((ua << k1) | ((1 << k1) - 1)) | 0x8000) & U16
        s1 = jnp.where(active1, m1 + k1, 0)
        # One 32-bit window serves the whole pair: active lanes consume
        # m + k <= 16 bits per symbol, so s1 + s2 <= 32 fits exactly.
        boff = bitpos & 31
        win = (w0 << boff) | jnp.where(
            boff > 0, _shr_u(w1, (32 - boff) & 31), 0
        )
        bits1 = jnp.where(s1 > 0, _shr_u(win, (32 - s1) & 31), 0)
        code2 = (((code << s1) | bits1)
                 ^ jnp.where(k1 >= 1, 0x8000, 0)) & U16
        if not FREE_RUN or debug:
            lo3 = jnp.where(active1, lo3, lower)
            up3 = jnp.where(active1, up3, upper)
            code2 = jnp.where(active1, code2, code)

        # ---- symbol 2: post-update-exact search on the STALE read ----
        # (PAIR_WINONLY instead re-reads the now-updated table and runs
        # the plain baseline search: no held value, no fixups.)
        span2 = up3 - lo3 + 1
        u2 = _exact_div((code2 - lo3 + 1) * (cum1 + 1) - 1, span2)
        if PAIR_WINONLY:
            up2p = (u2 << 8) | 255
            CsB = Cs_all[si][0:128, :] if mode == "win" else Cs_all[si][:]
        else:
            up2p = (u2 << 8) | sym1
            CsB = Cs
        if mode == "win":
            miss = miss | (active2 & (u2 >= c128))
            sent2 = ((c128 if PAIR_WINONLY else c128_stale) << 8) | 128
            c128 = c128 + active2.astype(i32)
        elif PAIR_WINONLY:
            sent2 = (cum2_s << 8) | 255
        else:
            sent2 = sent1          # stale C[256] = cum1, same packed form
        packed2 = jnp.max(jnp.where(CsB <= up2p, CsB, -1),
                          axis=0, keepdims=True)
        sym2 = packed2 & 255
        # True bounds = stale values + the rows symbol 1's increment moved:
        # C'[sym2] = C[sym2] + (sym2 > sym1), C'[sym2+1] = C[sym2+1] +
        # (sym2+1 > sym1).  (active2 implies active1, so the increment is
        # real on every lane whose result is kept.)  WINONLY read the
        # updated table, so its values need no fixups.
        fix = 0 if PAIR_WINONLY else 1
        low2 = _shr_u(packed2, 8) \
            + fix * (sym2 > sym1).astype(i32)
        high2 = _shr_u(jnp.min(jnp.where(CsB > up2p, CsB, sent2),
                               axis=0, keepdims=True), 8) \
            + fix * (sym2 >= sym1).astype(i32)

        # ---- merged update: both suffix increments, one pass ----
        # Written as ONE nested-where traversal over sorted thresholds
        # (rows above both get +2<<8, rows between +1<<8): summing two
        # separate compare masks materialises each as its own full-table
        # pass (the round-3 FUSE_UPDATE lesson; first-cut A/B measured
        # that form -13%).  Inactive symbols ride the sentinel threshold.
        big = jnp.int32(0x7FFFFFFF)
        up1e = jnp.where(active1, up1, big)
        up2e = jnp.where(active2, up2p, big)
        if PAIR_WINONLY:
            # Baseline per-symbol update on the fresh read (symbol 1's
            # was already written after its search).
            if mode == "win":
                Cs_all[si][0:128, :] = CsB + jnp.where(CsB > up2e,
                                                       0x100, 0)
            else:
                Cs_all[si][:] = CsB + jnp.where(CsB > up2e, 0x100, 0)
        elif PAIR_SPLITW:
            # Split-write variant (see the knob): symbol 1's increment
            # was already written right after its search; apply symbol
            # 2's on a FRESH read.  i > sym2 on the post-update-1 table
            # <=> P1[i] > P1[sym2] = stale packed2 + (fixup << 8).
            thr2 = jnp.where(active2,
                             packed2 + ((sym2 > sym1).astype(i32) << 8),
                             big)
            if mode == "win":
                T1 = Cs_all[si][0:128, :]
                Cs_all[si][0:128, :] = T1 + jnp.where(T1 > thr2, 0x100, 0)
            else:
                T1 = Cs_all[si][:]
                Cs_all[si][:] = T1 + jnp.where(T1 > thr2, 0x100, 0)
        else:
            hi_t = jnp.maximum(up1e, up2e)
            lo_t = jnp.minimum(up1e, up2e)
            upd = jnp.where(Cs > hi_t, 0x200,
                            jnp.where(Cs > lo_t, 0x100, 0))
            if mode == "win":
                Cs_all[si][0:128, :] = Cs + upd
            else:
                Cs_all[si][:] = Cs + upd

        # ---- symbol 2: scalar half ----
        q2 = _exact_div(jnp.concatenate([low2 * span2, high2 * span2],
                                        axis=0), cum2_s)
        lo2b = (lo3 + q2[0:1, :]) & U16
        up2b = (lo3 + q2[1:2, :] - 1) & U16
        if debug:
            flag = flag | (active2 & ((u2 >= cum1 + 1)
                                      | (u2 < 0))).astype(i32)
            flag = flag | (active2 & (lo2b > up2b)).astype(i32)
        m2 = _clz16(lo2b ^ up2b)
        la2 = (lo2b << m2) & U16
        ua2 = ((up2b << m2) | ((1 << m2) - 1)) & U16
        a2 = (la2 << 1) & U16
        b2 = ((ua2 << 1) | 1) & U16
        k2 = _clz16((~(a2 & ~b2)) & U16)
        lo4 = (la2 << k2) & 0x7FFF
        up4 = (((ua2 << k2) | ((1 << k2) - 1)) | 0x8000) & U16
        s2 = jnp.where(active2, m2 + k2, 0)
        win2 = win << (s1 & 31)   # & 31 bounds FREE_RUN garbage lanes only
        bits2 = jnp.where(s2 > 0, _shr_u(win2, (32 - s2) & 31), 0)
        code3 = (((code2 << s2) | bits2)
                 ^ jnp.where(k2 >= 1, 0x8000, 0)) & U16

        # ---- carried-window advance, once per pair (0 or 1 words) ----
        # adv <= 1 for active lanes: boff <= 31 and s1 + s2 <= 32 give
        # (boff + s1 + s2) >> 5 <= 63 >> 5 = 1 — the pair consumes two
        # symbols' bits but the WORD cursor still advances at most one,
        # so one fetched word (widx + 2 lookahead, same as the
        # per-symbol path) suffices.  (A first cut fetched widx + 3 for
        # an unreachable adv == 2 arm — one dead [8, w] gather per pair.)
        widx = bitpos >> 5
        bitpos = bitpos + s1 + s2
        adv = (bitpos >> 5) > widx
        nxtA = jnp.sum(
            ring_read(si) * (iota8 == ((widx + 2) & 7)).astype(i32),
            axis=0, keepdims=True)
        w0 = jnp.where(adv, w1, w0)
        w1 = jnp.where(adv, nxtA, w1)

        wacc = wacc | ((jnp.where(active1, sym1, 0)
                        | (jnp.where(active2, sym2, 0) << 8))
                       << ((t & 3) * 8))
        if FREE_RUN and not debug:
            lower, upper, code = lo4, up4, code3
        else:
            lower = jnp.where(active2, lo4, lo3)
            upper = jnp.where(active2, up4, up3)
            code = jnp.where(active2, code3, code2)
        return (lower, upper, code, bitpos, w0, w1, flag, c128, miss,
                wacc)

    sizes_s = [raw_sizes[:, lo: lo + w] for lo in los]

    def step(it, carries, mode):
        carries = list(carries)
        # Per-stream deferred-update lists (FUSE_UPDATE): flushed every
        # fuse_k symbols, so they are empty again by the iteration end —
        # nothing crosses the fori_loop carry.
        pends = [[] for _ in range(streams)]
        for wi in range(unroll):
            # Fixed-cadence refill: [cursor, cursor+8) covers the next
            # REFILL_WORDS * 4 symbols (<= 16 bits each) plus the carried
            # 2-word window.  Streams refill on STAGGERED words (stream s
            # at wi % REFILL_WORDS == s % REFILL_WORDS) so the refill
            # bursts spread across symbol steps instead of bunching; when
            # unroll is not a REFILL_WORDS multiple (interpret unroll=1)
            # the wi parity never reaches some streams — refill all.
            for s in range(streams):
                if (unroll % REFILL_WORDS != 0
                        or wi % REFILL_WORDS == s % REFILL_WORDS):
                    refill(s, carries[s][3] >> 5)
            wt = it * unroll + wi
            for s in range(streams):
                carries[s] = carries[s][:9] + (zeros,)
            # Phase layout per symbol position (PHASE_SPLIT: all streams'
            # table searches, then all scalar halves — see search_step;
            # otherwise each stream's full step in turn).  PAIR_STEP
            # walks the word in two-symbol steps instead.
            for j in ((0, 2) if pair else range(4)):
                t = t_chunk * steps_per_chunk + wt * 4 + j
                if pair:
                    for s in range(streams):
                        carries[s] = pair_step(s, sizes_s[s], t,
                                               carries[s], mode)
                elif XDIV and streams > 1 and not ABLATE_SCALAR:
                    # Cross-stream paired div: all table searches, then
                    # ONE [2*S, w] exact-div for every stream's bounds,
                    # then the per-stream scalar chains with their
                    # quotient rows pre-supplied.
                    parts = [search_step(s, sizes_s[s], t, carries[s],
                                         mode, pends[s], fuse_k)
                             for s in range(streams)]
                    nums, dens = [], []
                    for s in range(streams):
                        (_, _, cum_s, span, _, low, high,
                         _, _, _) = parts[s]
                        nums.append(jnp.concatenate(
                            [low * span, high * span], axis=0))
                        dens.append(jnp.broadcast_to(
                            cum_s, nums[-1].shape))
                    q_all = _exact_div(jnp.concatenate(nums, axis=0),
                                       jnp.concatenate(dens, axis=0))
                    for s in range(streams):
                        carries[s] = scalar_step(
                            s, t, parts[s], carries[s],
                            q_pre=q_all[2 * s: 2 * s + 2, :])
                elif PHASE_SPLIT:
                    parts = [search_step(s, sizes_s[s], t, carries[s],
                                         mode, pends[s], fuse_k)
                             for s in range(streams)]
                    for s in range(streams):
                        carries[s] = scalar_step(s, t, parts[s],
                                                 carries[s])
                else:
                    for s in range(streams):
                        part = search_step(s, sizes_s[s], t, carries[s],
                                           mode, pends[s], fuse_k)
                        carries[s] = scalar_step(s, t, part, carries[s])
            # The store row is uniform across lanes: plain dynamic store.
            for s in range(streams):
                out_ref[pl.ds(wt, 1), los[s]: los[s] + w] = carries[s][9]
        return tuple(carries)

    def step_stacked(it, carry, mode):
        """STACK_SCALAR loop body: one symbol step for ALL streams, the
        scalar half executed once at full width.

        The carry is a single full-width state tuple (lower, upper, code,
        bitpos, w0, w1, flag, c128, miss, wacc), each [1, tile].  Per
        symbol: the unscale div and the renorm/bit-window chain run as
        [1, tile] / [2, tile] ops (one issue where the per-stream layout
        paid STREAMS); only the table search+update stays per-stream
        [256, tile/STREAMS], stitched with static column concats."""
        (lower, upper, code, bitpos, w0, w1, flag, c128, miss,
         wacc) = carry
        for wi in range(unroll):
            # Staggered refill cadence (see step()); when unroll is not a
            # multiple of REFILL_WORDS (interpret mode's unroll=1) the wi
            # parity never reaches some streams — refill all, every word.
            for s in range(streams):
                if (unroll % REFILL_WORDS != 0
                        or wi % REFILL_WORDS == s % REFILL_WORDS):
                    refill(s, bitpos[:, los[s]: los[s] + w] >> 5)
            wt = it * unroll + wi
            wacc = zeros_f
            for j in range(4):
                t = t_chunk * steps_per_chunk + wt * 4 + j
                active = t < raw_sizes
                cum = 256 + t
                cum_s = jnp.int32(cum)
                # OFFSET_STATE: slots hold R/D (see scalar_step's twin).
                span = upper if OFFSET_STATE else upper - lower + 1
                num0 = code + 1 if OFFSET_STATE else code - lower + 1
                unscaled = _exact_div(num0 * cum - 1, span)
                if mode == "win":
                    # Full-width hull bookkeeping (hoisted out of the
                    # per-stream search): miss + C[128] carry.  sym==127
                    # falls through to the PRE-increment C[128].
                    miss = miss | (active & (unscaled >= c128))
                    c128_pre = c128
                    c128 = c128 + active.astype(i32)
                lows, highs, syms = [], [], []
                for s in range(streams):
                    lo = los[s]
                    u_s = unscaled[:, lo: lo + w]
                    up = (u_s << 8) | 255
                    inc = active[:, lo: lo + w].astype(i32) << 8
                    if mode == "win":
                        sent = (c128_pre[:, lo: lo + w] << 8) | 128
                        Cs = Cs_all[s][0:128, :]
                    else:
                        sent = (cum_s << 8) | 255
                        Cs = Cs_all[s][:]
                    packed = jnp.max(jnp.where(Cs <= up, Cs, -1),
                                     axis=0, keepdims=True)
                    high_s = _shr_u(
                        jnp.min(jnp.where(Cs > up, Cs, sent),
                                axis=0, keepdims=True),
                        8)
                    if mode == "win":
                        Cs_all[s][0:128, :] = Cs + jnp.where(Cs > up,
                                                             inc, 0)
                    else:
                        Cs_all[s][:] = Cs + jnp.where(Cs > up, inc, 0)
                    lows.append(_shr_u(packed, 8))
                    highs.append(high_s)
                    syms.append(packed & 255)
                low = jnp.concatenate(lows, axis=1)
                high = jnp.concatenate(highs, axis=1)
                sym = jnp.where(active,
                                jnp.concatenate(syms, axis=1), 0)

                # Scalar half, full width (mirror of scalar_step).
                num = jnp.concatenate([low * span, high * span], axis=0)
                q = _exact_div(num, cum_s)
                lo2 = (lower + q[0:1, :]) & U16
                if OFFSET_STATE:
                    r2 = q[1:2, :] - q[0:1, :]
                    d2 = code - q[0:1, :]
                    up2 = (lo2 + r2 - 1) & U16
                else:
                    up2 = (lower + q[1:2, :] - 1) & U16
                if debug:
                    flag = flag | (active & ((unscaled >= cum)
                                             | (unscaled < 0))).astype(i32)
                    inv = (r2 <= 0) if OFFSET_STATE else (lo2 > up2)
                    flag = flag | (active & inv).astype(i32)
                m = _clz16(lo2 ^ up2)
                la = (lo2 << m) & U16
                ua = ((up2 << m) | ((1 << m) - 1)) & U16
                a = (la << 1) & U16
                b = ((ua << 1) | 1) & U16
                k = _clz16((~(a & ~b)) & U16)
                lo3 = (la << k) & 0x7FFF
                if OFFSET_STATE:
                    up3 = (r2 << (m + k)) & 0x1FFFF
                else:
                    up3 = (((ua << k) | ((1 << k) - 1)) | 0x8000) & U16
                s_bits = jnp.where(active, m + k, 0)
                boff = bitpos & 31
                win = (w0 << boff) | jnp.where(
                    boff > 0, _shr_u(w1, (32 - boff) & 31), 0
                )
                bits = jnp.where(s_bits > 0,
                                 _shr_u(win, (32 - s_bits) & 31), 0)
                if OFFSET_STATE:
                    code2 = ((d2 << s_bits) | bits) & U16
                else:
                    code2 = (((code << s_bits) | bits)
                             ^ jnp.where(k >= 1, 0x8000, 0)) & U16
                widx = bitpos >> 5
                bitpos = bitpos + s_bits
                adv = (bitpos >> 5) > widx
                nxt = jnp.sum(
                    ring_fw[:] * (iota8f == ((widx + 2) & 7)).astype(i32),
                    axis=0, keepdims=True)
                w0 = jnp.where(adv, w1, w0)
                w1 = jnp.where(adv, nxt, w1)
                wacc = wacc | (sym << ((t & 3) * 8))
                if FREE_RUN and not debug:
                    lower, upper, code = lo3, up3, code2
                else:
                    lower = jnp.where(active, lo3, lower)
                    upper = jnp.where(active, up3, upper)
                    code = jnp.where(active, code2, code)
            out_ref[pl.ds(wt, 1), :] = wacc
        return (lower, upper, code, bitpos, w0, w1, flag, c128, miss,
                wacc)

    def run_chunk_stacked(mode):
        """run_chunk for STACK_SCALAR: the carried state is one
        full-width tuple seeded/saved directly from st's rows."""
        for s, lo in enumerate(los):
            refill(s, st[3:4, lo: lo + w] >> 5)
        bp0 = st[3:4, :]
        wi0 = bp0 >> 5
        rs = ring_fw[:]
        w0_0 = jnp.sum(rs * (iota8f == (wi0 & 7)).astype(i32),
                       keepdims=True, axis=0)
        w1_0 = jnp.sum(rs * (iota8f == ((wi0 + 1) & 7)).astype(i32),
                       axis=0, keepdims=True)
        if mode == "win":
            c128_0 = jnp.concatenate(
                [_shr_u(Cs_all[s][128:129, :], 8) for s in range(streams)],
                axis=1)
        else:
            c128_0 = zeros_f
        carry = (st[0:1, :], st[1:2, :], st[2:3, :], bp0, w0_0, w1_0,
                 st[4:5, :] if debug else zeros_f, c128_0, zeros_f,
                 zeros_f)
        carry = jax.lax.fori_loop(
            0, (steps_per_chunk // 4) // unroll,
            functools.partial(step_stacked, mode=mode), carry)

        def save_st():
            st[0:1, :] = carry[0]
            st[1:2, :] = carry[1]
            st[2:3, :] = carry[2]
            st[3:4, :] = carry[3]
            if debug:
                st[4:5, :] = carry[6]

        if mode == "win":
            missed = jnp.max(carry[8].astype(i32))

            @pl.when(missed == 0)
            def _commit():
                save_st()
                for s, lo in enumerate(los):
                    cnt = jnp.clip(
                        sizes_s[s] - t_chunk * steps_per_chunk,
                        0, steps_per_chunk)
                    Cs_all[s][128:256, :] = (Cs_all[s][128:256, :]
                                             + (cnt << 8))

            @pl.when(missed != 0)
            def _discard():
                st[5:6, :] = jnp.ones((1, tile), i32)
                for s in range(streams):
                    Cs_all[s][:] = snaps[s][:]
        else:
            save_st()

    def run_chunk(mode):
        """The chunk's whole symbol loop, state bridged through st (the
        hull branches below cannot pass values directly).

        Seeds each stream's carried bit window [widx, widx+2) (the ring
        still covers it: the last refill of the previous chunk was at
        most 4 consumed words behind the cursor), runs the symbol loop,
        then writes back st — unconditionally for 'full'; for 'win' only
        when no lane missed the window (else the sticky row is set, the
        table restored from its snapshot, and the caller re-runs full).
        """
        carries = []
        for s, lo in enumerate(los):
            # Refresh the ring at the committed cursor BEFORE seeding the
            # carried window: after a discarded speculative run the ring
            # holds words from the discarded cursors, not these.
            refill(s, st[3:4, lo: lo + w] >> 5)
        for s, lo in enumerate(los):
            bp0 = st[3:4, lo: lo + w]
            wi0 = bp0 >> 5
            rs = ring_read(s)
            w0_0 = jnp.sum(rs * (iota8 == (wi0 & 7)).astype(i32),
                           keepdims=True, axis=0)
            w1_0 = jnp.sum(rs * (iota8 == ((wi0 + 1) & 7)).astype(i32),
                           axis=0, keepdims=True)
            if mode == "win":
                if DUAL_TABLE:
                    c128_0 = Cs_all[s][64:65, :] & U16
                elif PAIR14:
                    c128_0 = _shr_u(Cs_all[s][128:129, :], 14)
                else:
                    c128_0 = _shr_u(Cs_all[s][128:129, :], 8)
            else:
                c128_0 = zeros
            carries.append((st[0:1, lo: lo + w], st[1:2, lo: lo + w],
                            st[2:3, lo: lo + w], bp0, w0_0, w1_0,
                            st[4:5, lo: lo + w] if debug else zeros,
                            c128_0, zeros, zeros))
        carries = jax.lax.fori_loop(
            0, (steps_per_chunk // 4) // unroll,
            functools.partial(step, mode=mode), tuple(carries))

        def save_st():
            for s, lo in enumerate(los):
                st[0:1, lo: lo + w] = carries[s][0]
                st[1:2, lo: lo + w] = carries[s][1]
                st[2:3, lo: lo + w] = carries[s][2]
                st[3:4, lo: lo + w] = carries[s][3]
                if debug:
                    st[4:5, lo: lo + w] = carries[s][6]

        if mode == "win":
            missed = jnp.int32(0)
            for s in range(streams):
                missed = missed | jnp.max(carries[s][8].astype(i32))

            @pl.when(missed == 0)
            def _commit():
                save_st()
                # Deferred high-row update: every active symbol of this
                # chunk incremented every row >= 128 by 1 << 8.
                for s, lo in enumerate(los):
                    cnt = jnp.clip(
                        sizes_s[s] - t_chunk * steps_per_chunk,
                        0, steps_per_chunk)
                    if DUAL_TABLE:
                        Cs_all[s][64:128, :] = (Cs_all[s][64:128, :]
                                                + cnt * 0x10001)
                    elif PAIR14:
                        # Row i >= 128 holds C[i] << 14 | C[i+1]; every
                        # active in-window symbol incremented both halves
                        # (C[128] itself rode row 127's low half live).
                        Cs_all[s][128:256, :] = (Cs_all[s][128:256, :]
                                                 + cnt * 0x4001)
                    else:
                        Cs_all[s][128:256, :] = (Cs_all[s][128:256, :]
                                                 + (cnt << 8))

            @pl.when(missed != 0)
            def _discard():
                st[5:6, :] = jnp.ones((1, tile), i32)
                for s in range(streams):
                    Cs_all[s][:] = snaps[s][:]
        else:
            save_st()

    rc = run_chunk_stacked if stacked else run_chunk
    if hull:
        sticky0 = jnp.max(st[5:6, :]) > 0

        @pl.when(jnp.logical_not(sticky0))
        def _try_windowed():
            for s in range(streams):
                snaps[s][:] = Cs_all[s][:]
            rc("win")

        redo = jnp.max(st[5:6, :]) > 0

        @pl.when(redo)
        def _full():
            rc("full")
    else:
        rc("full")

    if debug:
        @pl.when(t_chunk == n_chunks - 1)
        def _flags():
            # Row 0: invariant flags; row 1: final bit cursor, which the
            # host compares against the framed packet length to catch
            # streams that ran dry (corrupt-but-well-framed packets
            # cannot violate the coder invariants — AC decodes any bit
            # string — but they CAN overrun).
            flag_ref[0:1, :] = st[4:5, :]
            flag_ref[1:2, :] = st[3:4, :]


@functools.partial(
    jax.jit,
    static_argnames=("tile", "packet_size", "out_groups", "interpret",
                     "debug", "hull"),
)
def _decode_call(packets32, sizes, *, tile, packet_size, out_groups,
                 interpret=False, debug=False, hull=None):
    """Decode packets32 [n_lanes, out_words] i32 (u8 view = the framed
    bitstreams) -> raw words [n_lanes, p_words] i32 (u8 view = the bytes);
    with debug=True returns (raw_words, flags [2, n_lanes]): row 0 flags
    the reference's -D_DEBUG conditions (range inversion / symbol-search
    failure, src/gpuar_kernel.cu:290-298,758-762), row 1 is the final bit
    cursor for the host-side overrun check (check_debug_flags).

    hull selects the speculative low-window variant (None = the
    DECODE_HULL module default at trace time).  Both variants are
    bit-exact; hull=False skips the speculation bet (its miss checks,
    snapshot copies and discarded chunks), which measures faster on
    content that would miss anyway — incompressible batches route here
    (mesh.MeshCodec._route_hull, PROBES_r4.md hull A/B: random 0.942 vs
    0.909 GB/s).  As a static arg, both variants coexist in the jit
    cache for per-batch routing.

    Layout work (byte order, tile interleave, output transpose) runs on
    the device — the host only reinterprets dtypes.
    """
    from gpuar_tpu.ops.pallas_encode import _bswap32

    if hull is None:
        hull = DECODE_HULL
    n_lanes = packets32.shape[0]
    n_tiles = n_lanes // tile
    g = out_groups
    big = _bswap32(packets32).reshape(n_tiles, tile, g, 8) \
        .transpose(2, 0, 3, 1).reshape(g, 8 * n_lanes)
    out = _decode_big2d(big, sizes, tile=tile, packet_size=packet_size,
                        out_groups=out_groups, interpret=interpret,
                        debug=debug, hull=hull)
    if debug:
        return out[0].T, out[1]
    return out.T


def _decode_big2d(big, sizes, *, tile, packet_size, out_groups,
                  interpret=False, debug=False, hull=True):
    n_lanes = sizes.shape[1]
    n_tiles = n_lanes // tile
    p_words = packet_size // 4
    n_chunks = max(p_words // CHUNK_WORDS, 1)
    chunk_words = min(CHUNK_WORDS, p_words)
    # A multi-chunk packet must split into whole chunks, or the chunk grid
    # would silently drop its tail words.
    assert n_chunks * chunk_words == p_words, (
        f"packet_size {p_words * 4} B is not a multiple of the "
        f"{CHUNK_WORDS * 4}-byte chunk")
    assert chunk_words % (1 if interpret else UNROLL_WORDS) == 0
    steps_per_chunk = chunk_words * 4
    # Stream slices must stay whole vregs (128 lanes) wide.  Interpret
    # mode normally forces 1 stream (XLA-CPU compile cost scales with the
    # duplicated body); INTERPRET_STREAMS lets correctness tests exercise
    # the multi-stream/stacked paths on tiny shapes.
    streams = STREAMS if (tile % (STREAMS * 128) == 0
                          and (not interpret or INTERPRET_STREAMS)) \
        else 1
    stacked = (STACK_SCALAR and streams > 1
               and not (DUAL_TABLE or PAIR14 or FUSE_UPDATE or PHASE_SPLIT
                        or ABLATE_SCALAR))
    # PAIR_STEP: default-config-only fast path (the probe knobs keep the
    # per-symbol layout; the floor ablations measure the old op stream).
    pair = (PAIR_STEP and not stacked
            and not (DUAL_TABLE or PAIR14 or FUSE_UPDATE or PHASE_SPLIT
                     or XDIV or STACK_SCALAR or OFFSET_STATE
                     or ABLATE_SCALAR))

    kernel = functools.partial(
        _decode_kernel,
        tile=tile,
        steps_per_chunk=steps_per_chunk,
        n_chunks=n_chunks,
        out_groups=out_groups,
        # The interpreter pays XLA-CPU compile time proportional to the
        # unrolled body; only the compiled TPU path wants the unroll.
        unroll=1 if interpret else UNROLL_WORDS,
        streams=streams,
        debug=debug,
        fuse_k=_fuse_k(1 if interpret else UNROLL_WORDS),
        stacked=stacked,
        hull=hull,
        pair=pair,
    )
    out_specs = pl.BlockSpec((chunk_words, tile), lambda i, t: (t, i),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((p_words, n_lanes), jnp.int32)
    if debug:
        out_specs = [out_specs,
                     pl.BlockSpec((2, tile), lambda i, t: (0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((2, n_lanes), jnp.int32)]
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_groups, 8 * tile), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((8, tile), jnp.int32)]
            + ([pltpu.VMEM((8, tile), jnp.int32)] if stacked else [])
            + [pltpu.VMEM((128 if DUAL_TABLE else 256,
                           tile // streams), jnp.int32)
               for _ in range(streams)]
            + ([] if stacked
               else [pltpu.VMEM((8, tile // streams), jnp.int32)
                     for _ in range(streams)])
            # Speculation snapshots: only the hull variant restores the
            # table on a missed window; the full-range variant frees the
            # VMEM (256 x (tile/streams) x 4 B per stream).
            + ([pltpu.VMEM((128 if DUAL_TABLE else 256,
                            tile // streams), jnp.int32)
                for _ in range(streams)] if hull else [])
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sizes, big)


def pad_packets32(packets: np.ndarray, tile: int, out_words: int):
    """Fixed-stride packets [n, >=out_words*4] u8 -> [n_pad, out_words] i32
    (LE byte view), padded to a tile multiple (+ returns n_pad)."""
    n = packets.shape[0]
    n_pad = -(-max(n, 1) // tile) * tile
    byts = np.zeros((n_pad, out_words * 4), np.uint8)
    byts[:n, : packets.shape[1]] = packets[:, : out_words * 4]
    return byts.view(np.int32), n_pad


def decode_batch_pallas(packets: np.ndarray, raw_sizes: np.ndarray, *,
                        tile: int = 1024,
                        packet_size: int = UNCOMPRESSED_PACKET_SIZE,
                        interpret: bool = False,
                        debug: bool = False,
                        hull: bool | None = None) -> np.ndarray:
    """Decode fixed-stride packets -> padded raw [B, packet_size] u8.

    With debug=True the kernel additionally evaluates the reference's
    -D_DEBUG assertions per lane (range inversion, failed symbol search —
    src/gpuar_kernel.cu:290-298,758-762) and raises ContainerError naming
    the corrupt packets; release mode decodes garbage silently, exactly
    like the reference.
    """
    n = packets.shape[0]
    out_groups, out_words = out_geometry(packet_size)
    packets32, n_pad = pad_packets32(packets, tile, out_words)
    sz = np.zeros((1, n_pad), np.int32)
    sz[0, :n] = raw_sizes

    out = _decode_call(
        jnp.asarray(packets32), jnp.asarray(sz),
        tile=tile, packet_size=packet_size, out_groups=out_groups,
        interpret=interpret, debug=debug, hull=hull,
    )
    if debug:
        out, flags = out
        comp_len = (packets[:, 0].astype(np.int64)
                    | (packets[:, 1].astype(np.int64) << 8))
        check_debug_flags(np.asarray(flags), comp_len, n)
    raw = np.ascontiguousarray(np.asarray(out)).view(np.uint8)[:, : packet_size]
    return raw[:n].copy()


def check_debug_flags(flags: np.ndarray, comp_len: np.ndarray,
                      n: int) -> None:
    """Raise ContainerError for lanes whose debug flags fired.

    flags row 0: in-kernel invariant violations (the reference's -D_DEBUG
    checks).  Row 1: final bit cursor — compared against the framed packet
    length (`comp_len` bytes): the decoder legitimately reads up to 16
    lookahead bits past the written stream (initializeDecoder primes a
    16-bit code window; writeRemaining flushes fewer tail bits — measured
    clean slack 7..13 bits), so anything beyond +16 means the stream ran
    dry: the detectable signature of a corrupt well-framed packet.
    """
    overrun = flags[1, :n] > np.asarray(comp_len, np.int64)[:n] * 8 + 16
    bad = np.nonzero((flags[0, :n] != 0) | overrun)[0]
    if bad.size:
        from gpuar_tpu import container

        raise container.ContainerError(
            "Corrupt packet data: coder invariant violation or "
            f"bitstream overrun in packets {bad[:8].tolist()}"
            f"{'...' if bad.size > 8 else ''}"
        )
