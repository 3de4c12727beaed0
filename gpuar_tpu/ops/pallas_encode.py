"""Pallas TPU encode kernel: batch-parallel adaptive arithmetic coding.

One kernel program codes TILE lanes (= packets) simultaneously; the serial
8192-symbol coder loop runs on the VPU with every per-packet quantity held
as a [1, TILE] vector.  This is the TPU-native replacement for the
reference's thread-per-packet CUDA kernel (jiahansu/GPUAR
src/gpuar_kernel.cu garCompress :894-914 / arCompress :487-531) — same
bitstreams, completely different machine mapping (SURVEY.md §7.1).

Layouts (chosen from measured Mosaic constraints — see
benchmarks/probe_layouts.py):

  * model C [256, TILE] i32 in VMEM scratch: C[i, p] = cumulative count of
    symbols < i in lane p (entry 256 is implicitly cumprob, which is the
    uniform scalar 256 + t).  Range queries are one-hot masked column sums;
    the adaptive update is a masked suffix increment.  Dynamic per-lane
    gathers along sublanes are not available, one-hot sums are.
  * input: raw packet bytes packed little-endian into u32 words, laid out
    [words, lanes] in HBM; the grid's second dimension streams time-chunks
    of CHUNK_WORDS rows through VMEM; uniform dynamic sublane row loads are
    cheap.
  * output big2d [groups, 8*TILE] i32: bitstream word w of lane l lives at
    (w >> 3, (w & 7) * TILE + l), i.e. groups of 8 words on sublanes and a
    word-in-group-major lane axis.  Per-lane scattered writes become one
    full-array masked select per 8-word ring dump (dynamic stores are
    ~16 us on this hardware; masked passes are ~2 us and amortised over
    32 output bytes).
  * bit emission per symbol is computed closed-form (see ops/xla_codec.py
    for the renormalisation derivation) and appended into a per-lane
    32-bit left-aligned accumulator; full words go through a 16-slot ring
    (one-hot writes) that dumps to big2d when any lane has 8+ pending.
    Underflow runs longer than one word take a rare @pl.when path that
    flushes the ring and writes whole repeated-bit words with one masked
    range pass — any run length in O(1) passes.

The packet header [u16 total][u16 raw] is word 0 (written at final flush),
matching the container framing (src/gpuar_kernel.cu:527-528).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuar_tpu.config import UNCOMPRESSED_PACKET_SIZE

U16 = 0xFFFF
RING = 16          # ring slots (words) per lane
CHUNK_WORDS = 256  # input words per grid time-chunk (= 1024 symbols)


def _clz16(x):
    return jax.lax.clz(x) - 16


def _append(acc, nbuf, val, n):
    """Append n (<=31) bits of val into the left-aligned 32-bit accumulator.

    Returns (acc', nbuf', flush_word, flushing) — at most one full word is
    produced per append.
    """
    newn = nbuf + n
    over = jnp.maximum(newn - 32, 0)
    flushing = newn >= 32
    # Word completed: old acc plus the top (n - over) bits of val.
    word = jnp.where(flushing, acc | (val >> over), 0)
    # Remaining low `over` bits restart the accumulator, left-aligned.
    rem = val & ((1 << over) - 1)
    acc_flush = rem << ((32 - over) & 31)
    acc_keep = acc | (val << jnp.clip(32 - newn, 0, 31))
    acc2 = jnp.where(flushing, acc_flush, acc_keep)
    nbuf2 = jnp.where(flushing, over, newn)
    return acc2, nbuf2, word, flushing


def _ring_write(ring_ref, lane16, word, wcur, flushing, tile):
    """One-hot write of `word` into ring slot wcur & 15 for flushing lanes."""
    jrep = pltpu.repeat(jnp.where(flushing, wcur & (RING - 1), -1), RING, axis=1)
    wrep = pltpu.repeat(word, RING, axis=1)
    ring_ref[:] = jnp.where(lane16 == jrep, wrep, ring_ref[:])


def _dump_range(out_ref, ring_ref, rw, lo, hi, tile):
    """Copy ring words [lo, hi) (hi - lo <= 16, per-lane bounds) to big2d."""
    lorep = pltpu.repeat(lo, 8, axis=1)
    hirep = pltpu.repeat(hi, 8, axis=1)
    inr = (rw >= lorep) & (rw < hirep)
    # slot(w) = w & 15 = (g & 1) * 8 + j  ->  parity-select ring halves.
    par = (rw >> 3) & 1
    val = jnp.where(par == 0, ring_ref[:, : 8 * tile], ring_ref[:, 8 * tile :])
    out_ref[:] = jnp.where(inr, val, out_ref[:])


def _encode_kernel(sizes_ref, in_ref, out_ref, len_ref, C, st,
                   ring, *, tile, steps_per_chunk, n_chunks, out_groups):
    t_chunk = pl.program_id(1)
    i32 = jnp.int32
    iota256 = jax.lax.broadcasted_iota(i32, (256, tile), 0)
    lane16 = jax.lax.broadcasted_iota(i32, (1, RING * tile), 1) // tile
    rows = jax.lax.broadcasted_iota(i32, (out_groups, 8 * tile), 0)
    jrep8 = jax.lax.broadcasted_iota(i32, (1, 8 * tile), 1) // tile
    rw = rows * 8 + jrep8
    zeros = jnp.zeros((1, tile), i32)

    @pl.when(t_chunk == 0)
    def _init():
        C[:] = jnp.broadcast_to(
            jnp.arange(256, dtype=i32)[:, None], (256, tile)
        )
        st[0:1, :] = zeros            # lower
        st[1:2, :] = zeros + U16      # upper
        st[2:3, :] = zeros            # underflow
        st[3:4, :] = zeros            # acc (left-aligned bit buffer)
        st[4:5, :] = zeros            # nbuf
        st[5:6, :] = zeros + 1        # wcur: word 0 reserved for the header
        st[6:7, :] = zeros + 1        # wbase: first un-dumped ring word

    sizes = sizes_ref[:]

    def emit(state, b0, u_drain, pat, npat, has):
        """Emit [b0] + [~b0]*u_drain + pat(npat bits) for all lanes."""
        acc, nbuf, wcur, wbase = state
        runbit = jnp.where(has, 1 - b0, 0)

        # P1: the first settled bit.
        acc, nbuf, w, f = _append(acc, nbuf, b0, has.astype(jnp.int32))
        _ring_write(ring, lane16, w, wcur, f, tile)
        wcur = wcur + f

        # P2a: run bits up to the current word edge only, so that any
        # overflowing run continues word-aligned (r1 = 0 when the
        # accumulator is empty — already aligned).
        r1 = jnp.minimum(u_drain, (32 - nbuf) & 31)
        rv = jnp.where(runbit > 0, (1 << r1) - 1, 0)
        acc, nbuf, w, f = _append(acc, nbuf, rv, r1)
        _ring_write(ring, lane16, w, wcur, f, tile)
        wcur = wcur + f
        left = u_drain - r1

        # P2b (rare): whole words of repeated run bits, any count, via one
        # masked range pass after draining the ring.
        runw = left >> 5
        rare = jnp.any(runw > 0)

        @pl.when(rare)
        def _():
            _dump_range(out_ref, ring, rw, wbase, wcur, tile)
            fill = jnp.where(runbit > 0, jnp.int32(-1), 0)
            lorep = pltpu.repeat(wcur, 8, axis=1)
            hirep = pltpu.repeat(wcur + runw, 8, axis=1)
            inr = (rw >= lorep) & (rw < hirep)
            out_ref[:] = jnp.where(inr, pltpu.repeat(fill, 8, axis=1), out_ref[:])

        wcur = wcur + runw
        wbase = jnp.where(rare, wcur, wbase)
        left = left - (runw << 5)

        # P2c: run remainder (word-aligned when P2b fired, fits otherwise).
        rv = jnp.where(runbit > 0, (1 << left) - 1, 0)
        acc, nbuf, w, f = _append(acc, nbuf, rv, left)
        _ring_write(ring, lane16, w, wcur, f, tile)
        wcur = wcur + f

        # P3: remaining pattern bits.
        acc, nbuf, w, f = _append(acc, nbuf, pat, npat)
        _ring_write(ring, lane16, w, wcur, f, tile)
        wcur = wcur + f
        return acc, nbuf, wcur, wbase

    def maybe_dump(state):
        acc, nbuf, wcur, wbase = state
        pend = wcur - wbase
        cond = jnp.any(pend >= 8)

        @pl.when(cond)
        def _():
            drained = jnp.where(pend >= 8, wbase + 8, wbase)
            _dump_range(out_ref, ring, rw, wbase, drained, tile)

        wbase = jnp.where(pend >= 8, wbase + 8, wbase)
        return acc, nbuf, wcur, wbase

    def step(tt, carry):
        lower, upper, under, acc, nbuf, wcur, wbase = carry
        t = t_chunk * steps_per_chunk + tt

        w_in = in_ref[pl.ds(tt >> 2, 1), :]
        sym = (w_in >> ((tt & 3) * 8)) & 0xFF
        active = t < sizes
        sym = jnp.where(active, sym, 0)

        # Model query + update (applySymbolRange, src/gpuar_kernel.cu:256).
        cum = 256 + t  # uniform: every active lane has coded t symbols
        low = jnp.sum(jnp.where(iota256 == sym, C[:], 0), axis=0, keepdims=True)
        high = jnp.sum(
            jnp.where(iota256 == sym + 1, C[:], 0), axis=0, keepdims=True
        ) + jnp.where(sym == 255, cum, 0)
        C[:] = C[:] + (active & (iota256 > sym)).astype(i32)

        span = upper - lower + 1
        up2 = (lower + (high * span) // cum - 1) & U16
        lo2 = (lower + (low * span) // cum) & U16

        # Closed-form renormalisation (derivation: ops/xla_codec.py).
        m = _clz16(lo2 ^ up2)
        la = (lo2 << m) & U16
        ua = ((up2 << m) | ((1 << m) - 1)) & U16
        a = (la << 1) & U16
        b = ((ua << 1) | 1) & U16
        k = _clz16((~(a & ~b)) & U16)
        lo3 = (la << k) & 0x7FFF
        up3 = (((ua << k) | ((1 << k) - 1)) | 0x8000) & U16

        topm = (up2 >> (16 - m)) & ((1 << m) - 1)
        has = (m > 0) & active
        m_e = jnp.where(has, m, 0)
        b0 = jnp.where(has, topm >> jnp.maximum(m - 1, 0), 0)
        u_drain = jnp.where(has, under, 0)
        npat = jnp.maximum(m_e - 1, 0)
        pat = jnp.where(has, topm & ((1 << npat) - 1), 0)
        under2 = jnp.where(has, 0, under) + jnp.where(active, k, 0)

        acc, nbuf, wcur, wbase = emit(
            (acc, nbuf, wcur, wbase), b0, u_drain, pat, npat, has
        )

        lower = jnp.where(active, lo3, lower)
        upper = jnp.where(active, up3, upper)

        acc, nbuf, wcur, wbase = maybe_dump((acc, nbuf, wcur, wbase))
        return (lower, upper, under2, acc, nbuf, wcur, wbase)

    carry = (st[0:1, :], st[1:2, :], st[2:3, :], st[3:4, :], st[4:5, :],
             st[5:6, :], st[6:7, :])
    carry = jax.lax.fori_loop(0, steps_per_chunk, step, carry)
    lower, upper, under, acc, nbuf, wcur, wbase = carry

    @pl.when(t_chunk < n_chunks - 1)
    def _save():
        st[0:1, :] = lower
        st[1:2, :] = upper
        st[2:3, :] = under
        st[3:4, :] = acc
        st[4:5, :] = nbuf
        st[5:6, :] = wcur
        st[6:7, :] = wbase

    @pl.when(t_chunk == n_chunks - 1)
    def _finish():
        ones = jnp.ones((1, tile), i32)
        # writeRemaining (src/gpuar_kernel.cu:379-388): lower's second bit,
        # then underflow+1 complements — same emit machinery.
        tail = (lower >> 14) & 1
        a2, n2, w2, b2 = emit(
            (acc, nbuf, wcur, wbase), tail, under + 1,
            jnp.zeros((1, tile), i32), jnp.zeros((1, tile), i32),
            ones.astype(jnp.bool_),
        )
        # writeClose: left-aligned zero pad to a byte boundary.
        n2 = (n2 + 7) & ~7
        body_bytes = (w2 - 1) * 4 + (n2 >> 3)
        total = body_bytes + 4

        # Flush the final partial word, then dump everything left.
        f = n2 > 0
        _ring_write(ring, lane16, a2, w2, f, tile)
        w3 = w2 + f
        _dump_range(out_ref, ring, rw, b2, w3, tile)

        # Header word (bytes: total_lo, total_hi, raw_lo, raw_hi -> BE word).
        raw = sizes
        hdr = ((total & 0xFF) << 24) | (((total >> 8) & 0xFF) << 16) | \
              ((raw & 0xFF) << 8) | ((raw >> 8) & 0xFF)
        out_ref[0:1, 0:tile] = hdr
        len_ref[:] = total


@functools.partial(
    jax.jit, static_argnames=("tile", "packet_size", "out_groups", "interpret")
)
def _encode_call(words, sizes, *, tile, packet_size, out_groups,
                 interpret=False):
    n_lanes = words.shape[1]
    n_tiles = n_lanes // tile
    p_words = packet_size // 4
    n_chunks = max(p_words // CHUNK_WORDS, 1)
    chunk_words = min(CHUNK_WORDS, p_words)
    steps_per_chunk = chunk_words * 4

    kernel = functools.partial(
        _encode_kernel,
        tile=tile,
        steps_per_chunk=steps_per_chunk,
        n_chunks=n_chunks,
        out_groups=out_groups,
    )
    grid = (n_tiles, n_chunks)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_words, tile), lambda i, t: (t, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((out_groups, 8 * tile), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i, t: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_groups, 8 * n_lanes), jnp.int32),
            jax.ShapeDtypeStruct((1, n_lanes), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((256, tile), jnp.int32),
            pltpu.VMEM((8, tile), jnp.int32),
            pltpu.VMEM((1, RING * tile), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sizes, words)


def out_geometry(packet_size: int) -> tuple[int, int]:
    """(out_groups, out_words) for a packet size: capacity packet+512+4
    rounded up to a whole 8-word group."""
    cap_words = -(-(packet_size + 512 + 4) // 4)
    groups = -(-cap_words // 8)
    return groups, groups * 8


def encode_batch_pallas(data: np.ndarray, sizes: np.ndarray, *,
                        tile: int = 512,
                        packet_size: int = UNCOMPRESSED_PACKET_SIZE,
                        interpret: bool = False):
    """Encode padded raw packets [B, packet_size] u8 (true lengths `sizes`)
    -> (packets [B, out_words*4] u8, lengths [B] i32).

    Lanes are padded to a tile multiple; callers slice the first B rows.
    """
    n = data.shape[0]
    n_pad = -(-max(n, 1) // tile) * tile
    out_groups, out_words = out_geometry(packet_size)

    words = np.zeros((n_pad, packet_size // 4), dtype=np.int32)
    words[:n] = np.ascontiguousarray(data).view(np.int32)  # LE packing
    sz = np.zeros((1, n_pad), np.int32)
    sz[0, :n] = sizes

    big, lens = _encode_call(
        jnp.asarray(np.ascontiguousarray(words.T)), jnp.asarray(sz),
        tile=tile, packet_size=packet_size, out_groups=out_groups,
        interpret=interpret,
    )
    big = np.asarray(big)      # [groups, 8 * n_pad], lane-major j*tile + l
    lens = np.asarray(lens)[0, :n]

    # [groups, tiles, 8, tile] -> [tiles, tile, groups, 8] -> bytes
    n_tiles = n_pad // tile
    big = big.reshape(out_groups, n_tiles, 8, tile)
    big = np.ascontiguousarray(big.transpose(1, 3, 0, 2)).reshape(n_pad, out_words)
    packets = big.view(np.uint32).byteswap().view(np.uint8)  # BE words
    return packets.reshape(n_pad, out_words * 4)[:n], lens
