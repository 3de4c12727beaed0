"""Microbenchmarks of candidate Pallas inner-loop primitives (TPU).

Findings feed the encode/decode kernel design:
  * dynamic indexing along lanes must be 128-aligned -> no per-step dynamic
    word loads from a [B, words] buffer; symbols must come from static
    slices (unrolled word groups) or sublane-indexed layouts.
  * per-lane variable shifts may lower poorly -> compare against the f32
    exponent trick (x << m == x * 2^m built by bitcasting (m+127)<<23).

NOTE: historical snapshot — probes the candidate primitives considered
before the kernels existed; kept for the measurement record.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 8192
B = 1024


def timed(name, fn, *args):
    try:
        out = np.asarray(fn(*args))
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = np.asarray(fn(*args))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"{name:44s} {dt*1e3:9.2f} ms  {STEPS*B/dt/1e9:8.3f} GBps-eq")
    except Exception as e:
        msg = str(e)
        key = [l for l in msg.splitlines() if "rror" in l][:1]
        print(f"{name:44s} FAILED: {(key[0] if key else msg)[:140]}")


def call(kernel, scratch=None, out=(8, 128)):
    seed = jnp.asarray(np.random.default_rng(0).integers(1, 255, (8, 128), np.int32))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch or [],
    )(seed)


# ---- baseline: loop overhead -------------------------------------------
def k_base(seed_ref, out_ref):
    def body(t, x):
        return (x + t) & 0xFFFF
    out_ref[:] = jax.lax.fori_loop(0, STEPS, body, seed_ref[:])


# ---- 60 plain adds per step on [8,128] ----------------------------------
def k_adds(seed_ref, out_ref):
    def body(t, x):
        for _ in range(20):
            x = (x + 1) & 0xFFFF
            x = x | 1
            x = x ^ 3
        return x
    out_ref[:] = jax.lax.fori_loop(0, STEPS, body, seed_ref[:])


# ---- variable shifts: native <<, >> -------------------------------------
def k_varshift(seed_ref, out_ref):
    def body(t, x):
        m = x & 15
        for _ in range(4):
            x = ((x << m) | (x >> (16 - m))) & 0xFFFF
        return x | 1
    out_ref[:] = jax.lax.fori_loop(0, STEPS, body, seed_ref[:])


# ---- variable shifts via f32 exponent trick ------------------------------
def pow2f(m):
    """2^m as f32 for m in [0, 30]."""
    return pltpu.bitcast((m + 127) << 23, jnp.float32)


def shl16(x, m):
    """(x << m) & 0xFFFF for x in [0,2^16), m in [0,16], no variable shift."""
    lo = x & 0xFF
    hi = x >> 8
    p = pow2f(m)
    a = (lo.astype(jnp.float32) * p).astype(jnp.int32)
    b = (hi.astype(jnp.float32) * p).astype(jnp.int32)
    return (a + (b << 8)) & 0xFFFF


def shr(x, m):
    """x >> m for x in [0, 2^24), m in [0, 30]."""
    pm = pltpu.bitcast((127 - m) << 23, jnp.float32)
    return (x.astype(jnp.float32) * pm).astype(jnp.int32)


def k_f32shift(seed_ref, out_ref):
    def body(t, x):
        m = x & 15
        for _ in range(4):
            x = (shl16(x, m) | shr(x & 0xFFFF, 16 - m)) & 0xFFFF
        return x | 1
    out_ref[:] = jax.lax.fori_loop(0, STEPS, body, seed_ref[:])


# ---- clz via native lax.clz vs f32 exponent ------------------------------
def k_clz(seed_ref, out_ref):
    def body(t, x):
        for _ in range(4):
            x = (x + jax.lax.clz(x | 1)) & 0xFFFF
        return x | 1
    out_ref[:] = jax.lax.fori_loop(0, STEPS, body, seed_ref[:])


def clz16f(x):
    """clz16 via f32 exponent: 15 - floor(log2(x)) for x>0, else 16."""
    f = x.astype(jnp.float32)
    e = (pltpu.bitcast(f, jnp.int32) >> 23) & 0xFF
    return jnp.where(x > 0, 142 - e, 16)  # 142 = 127 + 15


def k_clzf(seed_ref, out_ref):
    def body(t, x):
        for _ in range(4):
            x = (x + clz16f(x | 1)) & 0xFFFF
        return x | 1
    out_ref[:] = jax.lax.fori_loop(0, STEPS, body, seed_ref[:])


# ---- model update, synthesized symbol ------------------------------------
def k_update(seed_ref, out_ref, C):
    C[:] = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32)[None, :], (B, 256))
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

    def body(t, acc):
        c = (rows * 7 + t) & 0xFF  # [B,1]
        C[:] = C[:] + (iota > c).astype(jnp.int32)
        return acc
    jax.lax.fori_loop(0, STEPS, body, 0)
    out_ref[:] = C[:8, :128]


# ---- update + full-width take_along_axis gather --------------------------
def k_gather(seed_ref, out_ref, C):
    C[:] = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32)[None, :], (B, 256))
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, 256), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

    def body(t, acc):
        c = (rows * 7 + t) & 0xFF
        idx = jnp.broadcast_to(c, (B, 256))
        g = jnp.take_along_axis(C[:], idx, axis=1)
        C[:] = C[:] + (iota > c).astype(jnp.int32)
        return (acc + g[:8, :128]) & 0xFFFF
    out_ref[:] = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((8, 128), jnp.int32))


# ---- one-hot reduce layout [256, B] --------------------------------------
def k_onehot(seed_ref, out_ref, C):
    C[:] = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32)[:, None], (256, B))
    iota = jax.lax.broadcasted_iota(jnp.int32, (256, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    def body(t, acc):
        c = (cols * 7 + t) & 0xFF  # [1,B]
        low = jnp.sum(
            jnp.where(iota == c, C[:], 0), axis=0, keepdims=True
        )
        C[:] = C[:] + (iota > c).astype(jnp.int32)
        return (acc + low) & 0xFFFF
    acc = jax.lax.fori_loop(0, STEPS, body, jnp.zeros((1, B), jnp.int32))
    out_ref[:] = jnp.broadcast_to(acc[:, :128], (8, 128))


if __name__ == "__main__":
    i32 = jnp.int32
    timed("base loop", lambda s: call(k_base), 0)
    timed("60 adds [8,128]", lambda s: call(k_adds), 0)
    timed("4 native varshifts [8,128]", lambda s: call(k_varshift), 0)
    timed("4 f32-trick varshifts [8,128]", lambda s: call(k_f32shift), 0)
    timed("4 native clz [8,128]", lambda s: call(k_clz), 0)
    timed("4 f32 clz [8,128]", lambda s: call(k_clzf), 0)
    timed("model update [B,256]", lambda s: call(
        k_update, scratch=[pltpu.VMEM((B, 256), i32)]), 0)
    timed("update+gather [B,256]", lambda s: call(
        k_gather, scratch=[pltpu.VMEM((B, 256), i32)]), 0)
    timed("one-hot reduce [256,B]", lambda s: call(
        k_onehot, scratch=[pltpu.VMEM((256, B), i32)]), 0)
