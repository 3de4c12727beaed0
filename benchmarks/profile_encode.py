"""Isolate encode-kernel phase costs: model / renorm / emission / ring / dump.

Each level adds one phase; deltas show where the time goes. Levels produce
garbage output (except the full kernel) — this is a profiler, not a codec.

NOTE: historical snapshot — phase-cost levels of an earlier kernel
revision (pre windowed-dump/unroll); kept for the measurement record.
Use iterbench.py/probe_model.py against the production kernels.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U16 = 0xFFFF
RING = 16


def make_kernel(level, tile, steps, out_groups):
    i32 = jnp.int32

    def kernel(sizes_ref, in_ref, out_ref, len_ref, C, st, ring):
        iota256 = jax.lax.broadcasted_iota(i32, (256, tile), 0)
        lane16 = jax.lax.broadcasted_iota(i32, (1, RING * tile), 1) // tile
        rows = jax.lax.broadcasted_iota(i32, (out_groups, 8 * tile), 0)
        jrep8 = jax.lax.broadcasted_iota(i32, (1, 8 * tile), 1) // tile
        rw = rows * 8 + jrep8
        C[:] = jnp.broadcast_to(jnp.arange(256, dtype=i32)[:, None], (256, tile))
        zeros = jnp.zeros((1, tile), i32)
        sizes = sizes_ref[:]

        def clz16(x):
            return jax.lax.clz(x) - 16

        def append(acc, nbuf, val, n):
            newn = nbuf + n
            over = jnp.maximum(newn - 32, 0)
            flushing = newn >= 32
            word = jnp.where(flushing, acc | (val >> over), 0)
            rem = val & ((1 << over) - 1)
            acc2 = jnp.where(flushing, rem << ((32 - over) & 31),
                             acc | (val << jnp.clip(32 - newn, 0, 31)))
            return acc2, jnp.where(flushing, over, newn), word, flushing

        def ring_write(word, wcur, flushing):
            jrep = pltpu.repeat(
                jnp.where(flushing, wcur & (RING - 1), -1), RING, axis=1)
            wrep = pltpu.repeat(word, RING, axis=1)
            ring[:] = jnp.where(lane16 == jrep, wrep, ring[:])

        def step(tt, carry):
            lower, upper, under, acc, nbuf, wcur, wbase, chk = carry
            w_in = in_ref[pl.ds(tt >> 2, 1), :]
            sym = (w_in >> ((tt & 3) * 8)) & 0xFF
            active = tt < sizes
            sym = jnp.where(active, sym, 0)
            cum = 256 + tt

            # L1: model
            low = jnp.sum(jnp.where(iota256 == sym, C[:], 0), axis=0,
                          keepdims=True)
            high = jnp.sum(jnp.where(iota256 == sym + 1, C[:], 0), axis=0,
                           keepdims=True) + jnp.where(sym == 255, cum, 0)
            C[:] = C[:] + (active & (iota256 > sym)).astype(i32)

            if level == 1:
                chk = chk + low + high
                return (lower, upper, under, acc, nbuf, wcur, wbase, chk)

            # L2: range math + renorm
            span = upper - lower + 1
            up2 = (lower + (high * span) // cum - 1) & U16
            lo2 = (lower + (low * span) // cum) & U16
            m = clz16(lo2 ^ up2)
            la = (lo2 << m) & U16
            ua = ((up2 << m) | ((1 << m) - 1)) & U16
            a = (la << 1) & U16
            b = ((ua << 1) | 1) & U16
            k = clz16((~(a & ~b)) & U16)
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
            lower = jnp.where(active, lo3, lower)
            upper = jnp.where(active, up3, upper)

            if level == 2:
                chk = chk + b0 + pat + u_drain
                return (lower, upper, under2, acc, nbuf, wcur, wbase, chk)

            # L3: emission value math (appends), no ring writes
            hasn = has.astype(i32)
            acc, nbuf, w1, f1 = append(acc, nbuf, b0, hasn)
            r1 = jnp.minimum(u_drain, (32 - nbuf) & 31)
            rv = jnp.where(1 - b0 > 0, (1 << r1) - 1, 0)
            acc, nbuf, w2, f2 = append(acc, nbuf, rv, r1)
            left = u_drain - r1
            runw = left >> 5
            left = left - (runw << 5)
            rv = jnp.where(1 - b0 > 0, (1 << left) - 1, 0)
            acc, nbuf, w3, f3 = append(acc, nbuf, rv, left)
            acc, nbuf, w4, f4 = append(acc, nbuf, pat, npat)

            if level == 3:
                chk = chk + w1 + w2 + w3 + w4 + f1 + f2 + f3 + f4
                wcur = wcur + f1 + f2 + f3 + f4 + runw
                return (lower, upper, under2, acc, nbuf, wcur, wbase, chk)

            # L4: ring writes
            ring_write(w1, wcur, f1)
            wcur = wcur + f1
            ring_write(w2, wcur, f2)
            wcur = wcur + f2 + runw
            ring_write(w3, wcur, f3)
            wcur = wcur + f3
            ring_write(w4, wcur, f4)
            wcur = wcur + f4

            if level == 4:
                return (lower, upper, under2, acc, nbuf, wcur, wbase, chk)

            # L5: dump checks + rare-run pass
            rare = jnp.any(runw > 0)

            @pl.when(rare)
            def _():
                fill = jnp.where(1 - b0 > 0, jnp.int32(-1), 0)
                lorep = pltpu.repeat(wcur, 8, axis=1)
                hirep = pltpu.repeat(wcur + runw, 8, axis=1)
                inr = (rw >= lorep) & (rw < hirep)
                out_ref[:] = jnp.where(inr, pltpu.repeat(fill, 8, axis=1),
                                       out_ref[:])

            wbase = jnp.where(rare, wcur, wbase)
            pend = wcur - wbase
            cond = jnp.any(pend >= 8)

            @pl.when(cond)
            def _():
                lorep = pltpu.repeat(wbase, 8, axis=1)
                drained = jnp.where(pend >= 8, wbase + 8, wbase)
                hirep = pltpu.repeat(drained, 8, axis=1)
                inr = (rw >= lorep) & (rw < hirep)
                par = (rw >> 3) & 1
                val = jnp.where(par == 0, ring[:, : 8 * tile],
                                ring[:, 8 * tile:])
                out_ref[:] = jnp.where(inr, val, out_ref[:])

            wbase = jnp.where(pend >= 8, wbase + 8, wbase)
            return (lower, upper, under2, acc, nbuf, wcur, wbase, chk)

        carry = (zeros, zeros + U16, zeros, zeros, zeros, zeros + 1,
                 zeros + 1, zeros)
        carry = jax.lax.fori_loop(0, steps, step, carry)
        len_ref[:] = carry[-1] + carry[5]

    return kernel


def run(level, tile=512, steps=8192, B=4096):
    out_groups = 272
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 1 << 31, (steps // 4, B)).astype(np.int32))
    sizes = jnp.asarray(np.full((1, B), steps, np.int32))

    f = jax.jit(functools.partial(call, level, tile, steps, out_groups))
    np.asarray(f(words, sizes)[1])
    ts = []
    for _ in range(2):
        t0 = time.time()
        np.asarray(f(words, sizes)[1])
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"L{level}: {dt*1e3:7.1f} ms  {B*steps/dt/1e9:6.3f} GB/s  "
          f"({dt*1e9/((B//tile)*steps):6.0f} ns/step)")


def call(level, tile, steps, out_groups, words, sizes):
    B = sizes.shape[1]
    kernel = make_kernel(level, tile, steps, out_groups)
    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((steps // 4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((out_groups, 8 * tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((out_groups, 8 * B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((256, tile), jnp.int32),
            pltpu.VMEM((8, tile), jnp.int32),
            pltpu.VMEM((1, RING * tile), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
    )(sizes, words)


if __name__ == "__main__":
    for lv in (1, 2, 3, 4, 5):
        try:
            run(lv)
        except Exception as e:
            lines = [l for l in str(e).splitlines()
                     if "rror" in l and "hostname" not in l]
            print(f"L{lv} FAILED: {(lines[-1] if lines else str(e))[:140]}")
