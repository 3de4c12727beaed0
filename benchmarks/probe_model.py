"""Microbenchmark: per-step cost of adaptive-model variants on real TPU.

Each kernel runs STEPS iterations of just the model phase (plus a trivial
carry so nothing is DCE'd); deltas between variants guide the encoder
design. Results are garbage data — timing only.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512
STEPS = 8192
REPEAT = 8
U16 = 0xFFFF



def _exact_div_probe(x, d):
    f32 = jnp.float32
    q0 = (x.astype(f32) * (jnp.float32(1.0) / d.astype(f32))).astype(jnp.int32)
    r = x - q0 * d
    return q0 + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)

def make(variant):
    i32 = jnp.int32

    def kernel(in_ref, out_ref, C):
        iota256 = jax.lax.broadcasted_iota(i32, (256, TILE), 0)
        iota128 = jax.lax.broadcasted_iota(i32, (128, TILE), 0)
        C[:] = jnp.broadcast_to(
            jnp.arange(C.shape[0], dtype=C.dtype)[:, None], C.shape)

        def step(t, carry):
            sym = (in_ref[pl.ds(t >> 2, 1), :] >> ((t & 3) * 8)) & 0xFF
            chk = carry
            if variant == "v0_3pass_256":
                low = jnp.sum(jnp.where(iota256 == sym, C[:], 0), axis=0,
                              keepdims=True)
                high = jnp.sum(jnp.where(iota256 == sym + 1, C[:], 0), axis=0,
                               keepdims=True)
                C[:] = C[:] + (iota256 > sym).astype(i32)
                chk = chk + low + high
            elif variant == "v1_low_only":
                low = jnp.sum(jnp.where(iota256 == sym, C[:], 0), axis=0,
                              keepdims=True)
                C[:] = C[:] + (iota256 > sym).astype(i32)
                chk = chk + low
            elif variant == "v2_update_only":
                C[:] = C[:] + (iota256 > sym).astype(i32)
                chk = chk + sym
            elif variant == "v3_lowhigh_only":
                low = jnp.sum(jnp.where(iota256 == sym, C[:], 0), axis=0,
                              keepdims=True)
                high = jnp.sum(jnp.where(iota256 == sym + 1, C[:], 0), axis=0,
                               keepdims=True)
                chk = chk + low + high
            elif variant == "v4_paired":
                mrow = sym >> 1
                par = sym & 1
                pk0 = jnp.sum(jnp.where(iota128 == mrow, C[:], 0),
                              axis=0, keepdims=True)
                pk1 = jnp.sum(jnp.where(iota128 == mrow + 1, C[:], 0),
                              axis=0, keepdims=True)
                low = jnp.where(par == 0, pk0 & U16, pk0 >> 16)
                high = jnp.where(par == 0, pk0 >> 16, pk1 & U16)
                gt = (iota128 > mrow).astype(i32)
                eq = ((par == 0) & (iota128 == mrow)).astype(i32)
                C[:] = C[:] + gt * 0x10001 + (eq << 16)
                chk = chk + low + high
            elif variant == "v5_paired_1hot":
                mrow = sym >> 1
                pk0 = jnp.sum(jnp.where(iota128 == mrow, C[:], 0),
                              axis=0, keepdims=True)
                pk1 = jnp.sum(jnp.where(iota128 == mrow + 1, C[:], 0),
                              axis=0, keepdims=True)
                chk = chk + pk0 + pk1
            elif variant == "v6_single_reduce_256":
                low = jnp.sum(jnp.where(iota256 == sym, C[:], 0), axis=0,
                              keepdims=True)
                chk = chk + low
            elif variant == "v7_single_reduce_128":
                pk0 = jnp.sum(jnp.where(iota128 == (sym >> 1), C[:], 0),
                              axis=0, keepdims=True)
                chk = chk + pk0
            elif variant == "v8_raw_sum_256":
                chk = chk + jnp.sum(C[:], axis=0, keepdims=True) + sym
            elif variant == "v10_noload":
                sym = jnp.zeros((1, TILE), i32) + (t & 255)
                chk = chk + sym
            elif variant == "v11_unroll4":
                w = in_ref[pl.ds(t, 1), :]
                for j in range(4):
                    chk = chk + ((w >> (j * 8)) & 0xFF)
            elif variant == "v12_20adds_row":
                sym2 = sym
                for j in range(20):
                    sym2 = sym2 + (sym2 >> 1)
                chk = chk + sym2
            elif variant == "v13_20adds_8x128":
                s8 = jnp.broadcast_to(sym.reshape(1, TILE), (8, TILE))
                for j in range(20):
                    s8 = s8 + (s8 >> 1)
                chk = chk + s8[0:1, :]
            elif variant == "v14_clz_div":
                q = _exact_div_probe(sym * 12345 + 7, sym + 3)
                m = jax.lax.clz(q | 1)
                chk = chk + q + m
            elif variant == "v15_varshift":
                m = sym & 15
                chk = chk + ((sym << m) & U16) + (((1 << m) - 1) & U16)
            elif variant == "v16_unroll4_3pass":
                w = in_ref[pl.ds(t, 1), :]
                for j in range(4):
                    sj = (w >> (j * 8)) & 0xFF
                    low = jnp.sum(jnp.where(iota256 == sj, C[:], 0), axis=0,
                                  keepdims=True)
                    high = jnp.sum(jnp.where(iota256 == sj + 1, C[:], 0),
                                   axis=0, keepdims=True)
                    C[:] = C[:] + (iota256 > sj).astype(i32)
                    chk = chk + low + high
            elif variant == "v17_unroll4_stale":
                w = in_ref[pl.ds(t, 1), :]
                sjs = [(w >> (j * 8)) & 0xFF for j in range(4)]
                upd = (iota256 > sjs[0]).astype(i32)
                for j in range(4):
                    sj = sjs[j]
                    low = jnp.sum(jnp.where(iota256 == sj, C[:], 0), axis=0,
                                  keepdims=True)
                    high = jnp.sum(jnp.where(iota256 == sj + 1, C[:], 0),
                                   axis=0, keepdims=True)
                    if j:
                        upd = upd + (iota256 > sj).astype(i32)
                    chk = chk + low + high
                C[:] = C[:] + upd
            elif variant == "v30_i16_reduce":
                sym16 = sym.astype(jnp.int16)
                low = jnp.sum(
                    jnp.where(iota256.astype(jnp.int16) == sym16, C[:], 0),
                    axis=0, keepdims=True)
                chk = chk + low.astype(i32)
            elif variant == "v31_i16_3pass":
                sym16 = sym.astype(jnp.int16)
                i16iota = iota256.astype(jnp.int16)
                low = jnp.sum(jnp.where(i16iota == sym16, C[:], 0), axis=0,
                              keepdims=True)
                high = jnp.sum(jnp.where(i16iota == sym16 + 1, C[:], 0),
                               axis=0, keepdims=True)
                C[:] = C[:] + (i16iota > sym16).astype(jnp.int16)
                chk = chk + low.astype(i32) + high.astype(i32)
            elif variant == "v32_i16_mixed":
                low = jnp.sum(jnp.where(iota256 == sym, C[:], 0), axis=0,
                              keepdims=True)
                high = jnp.sum(jnp.where(iota256 == sym + 1, C[:], 0),
                               axis=0, keepdims=True)
                C[:] = C[:] + (iota256 > sym).astype(jnp.int16)
                chk = chk + low.astype(i32) + high.astype(i32)
            elif variant == "v9_noop":
                chk = chk + sym
            return chk

        def rep(r, chk):
            return jax.lax.fori_loop(0, STEPS, step, chk)

        out_ref[:] = jax.lax.fori_loop(
            0, REPEAT, rep, jnp.zeros((1, TILE), i32))

    rows = 128 if ("paired" in variant or "128" in variant) else 256
    dtype = jnp.int16 if "i16" in variant else jnp.int32
    return kernel, rows, dtype


def run(variant):
    kernel, rows, dtype = make(variant)
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 1 << 31, (STEPS // 4, TILE), np.int64)
                        .astype(np.int32))
    f = jax.jit(lambda w: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, TILE), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, TILE), dtype)],
    )(w))
    np.asarray(f(words))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(words))
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"{variant:24s} {dt*1e3:8.2f} ms   {dt*1e9/(STEPS*REPEAT):7.1f} ns/step")




def run_carry(variant, n_carry, packed, unroll=1):
    i32 = jnp.int32

    def kernel(in_ref, out_ref, C):
        def step(t, carry):
            for u in range(unroll):
                if packed:
                    st = carry
                    rows = [st[i:i+1, :] for i in range(8)]
                    rows = [r + (r >> 1) + t for r in rows]
                    carry = jnp.concatenate(rows, axis=0)
                else:
                    carry = tuple(c + (c >> 1) + t for c in carry)
            return carry

        if packed:
            init = jnp.zeros((8, TILE), i32)
            res = jax.lax.fori_loop(0, STEPS * REPEAT, step, init)
            out_ref[:] = res[0:1, :]
        else:
            init = tuple(jnp.zeros((1, TILE), i32) for _ in range(n_carry))
            res = jax.lax.fori_loop(0, STEPS * REPEAT, step, init)
            acc = res[0]
            for c in res[1:]:
                acc = acc + c
            out_ref[:] = acc

    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 1 << 31, (STEPS // 4, TILE),
                        np.int64).astype(np.int32))
    f = jax.jit(lambda w: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, TILE), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((256, TILE), jnp.int32)],
    )(w))
    np.asarray(f(words))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(f(words))
        ts.append(time.time() - t0)
    dt = min(ts)
    n_iter = STEPS * REPEAT
    print(f"carry {variant:18s} {dt*1e3:8.2f} ms   {dt*1e9/n_iter:7.1f} ns/iter")
if __name__ == "__main__":
    import sys as _s
    if _s.argv[1:] == ["carry"]:
        run_carry("1x(1,512)", 1, False)
        run_carry("4x(1,512)", 4, False)
        run_carry("8x(1,512)", 8, False)
        run_carry("1x(8,512)", 8, True)
        run_carry("8sep_unroll4", 8, False, unroll=4)
        run_carry("8pack_unroll4", 8, True, unroll=4)
        raise SystemExit
    vs = _s.argv[1:] or ("v9_noop", "v10_noload", "v11_unroll4",
              "v12_20adds_row", "v13_20adds_8x128", "v14_clz_div",
              "v15_varshift", "v6_single_reduce_256", "v0_3pass_256")
    for v in vs:
        run(v)
