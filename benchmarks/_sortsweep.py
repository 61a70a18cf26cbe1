"""Sweep sort operand configurations on device to find cheaper layouts.

Run: JAX_ENABLE_X64=1 python benchmarks/_sortsweep.py [case ...]
Timing: fetch a scalar (block_until_ready does not sync on this platform);
subtract ~52ms fetch overhead.
"""
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")

import numpy as np
import jax
import jax.numpy as jnp

SIZE = 1 << 26


def timeit(name, fn, *args, n=3):
    try:
        t0 = time.perf_counter()
        fn(*args)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args)
            float(out)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) - 0.052
        print(f"{name:46s} {t*1e3:9.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
w0 = jax.random.bits(ks[0], (SIZE,), dtype=jnp.uint32)
w1 = jax.random.bits(ks[1], (SIZE,), dtype=jnp.uint32)
w2 = jax.random.bits(ks[2], (SIZE,), dtype=jnp.uint32)
w2_16 = (w2 >> 16).astype(jnp.uint16)
u16v = (w0 >> 16).astype(jnp.uint16)

cases = sys.argv[1:] or [
    "s3x32", "s32_32_16", "s64_16", "s64_32", "s64", "s32", "s16",
    "s16_b64", "s16_b256", "s16_b1024", "s3x32_b64",
    "s64_16_b64", "hist_flat", "hist_b256",
]


def last(x):
    return x[-1] if x.ndim == 1 else x[-1, -1]


for c in cases:
    if c == "s3x32":
        timeit("sort (u32,u32,u32) 64M", jax.jit(
            lambda a, b, d: last(jax.lax.sort((a, b, d), num_keys=3)[0])),
            w0, w1, w2)
    elif c == "s32_32_16":
        timeit("sort (u32,u32,u16) 64M", jax.jit(
            lambda a, b, d: last(jax.lax.sort((a, b, d), num_keys=3)[0])),
            w0, w1, w2_16)
    elif c == "s64_16":
        f = jax.jit(lambda a, b, d: last(jax.lax.sort(
            ((a.astype(jnp.uint64) << 32) | b.astype(jnp.uint64), d),
            num_keys=2)[1]))
        timeit("sort (u64,u16) 64M", f, w0, w1, w2_16)
    elif c == "s64_32":
        f = jax.jit(lambda a, b, d: last(jax.lax.sort(
            ((a.astype(jnp.uint64) << 32) | b.astype(jnp.uint64), d),
            num_keys=2)[1]))
        timeit("sort (u64,u32) 64M", f, w0, w1, w2)
    elif c == "s64":
        f = jax.jit(lambda a, b: last(jax.lax.sort(
            ((a.astype(jnp.uint64) << 32) | b.astype(jnp.uint64),),
            num_keys=1)[0]).astype(jnp.uint32))
        timeit("sort (u64) 64M", f, w0, w1)
    elif c == "s32":
        timeit("sort (u32) 64M", jax.jit(
            lambda a: last(jax.lax.sort((a,), num_keys=1)[0])), w0)
    elif c == "s16":
        timeit("sort (u16) 64M flat", jax.jit(
            lambda a: last(jax.lax.sort((a,), num_keys=1)[0])), u16v)
    elif c in ("s16_b64", "s16_b256", "s16_b1024"):
        rows = int(c.split("_b")[1])
        v = u16v.reshape(rows, SIZE // rows)
        timeit(f"sort (u16) 64M batched {rows}x{SIZE//rows}", jax.jit(
            lambda a: last(jax.lax.sort((a,), num_keys=1, dimension=-1)[0])),
            v)
    elif c == "s3x32_b64":
        a = w0.reshape(64, -1)
        b = w1.reshape(64, -1)
        d = w2.reshape(64, -1)
        timeit("sort (u32,u32,u32) batched 64x1M", jax.jit(
            lambda x, y, z: last(jax.lax.sort((x, y, z), num_keys=3,
                                              dimension=-1)[0])), a, b, d)
    elif c == "s64_16_b64":
        f = jax.jit(lambda a, b, d: last(jax.lax.sort(
            ((a.astype(jnp.uint64) << 32) | b.astype(jnp.uint64), d),
            num_keys=2, dimension=-1)[1]))
        timeit("sort (u64,u16) batched 64x1M", f,
               w0.reshape(64, -1), w1.reshape(64, -1), w2_16.reshape(64, -1))
    elif c == "hist_flat":
        def hist_flat(v):
            sv = jax.lax.sort((v,), num_keys=1)[0]
            edges = jnp.searchsorted(sv, jnp.arange(32769, dtype=sv.dtype))
            return (edges[1:] - edges[:-1]).astype(jnp.int32).sum()
        timeit("hist 32k: flat sort+searchsorted", jax.jit(hist_flat),
               (u16v & 0x7FFF).astype(jnp.uint16))
    elif c == "hist_b256":
        def hist_b(v):
            sv = jax.lax.sort((v,), num_keys=1, dimension=-1)[0]
            edges = jax.vmap(
                lambda row: jnp.searchsorted(
                    row, jnp.arange(32769, dtype=row.dtype)))(sv)
            return (edges[:, 1:] - edges[:, :-1]).astype(
                jnp.int32).sum(axis=0).sum()
        timeit("hist 32k: batched 256 rows sort+ss", jax.jit(hist_b),
               (u16v & 0x7FFF).astype(jnp.uint16).reshape(256, -1))
    else:
        print("unknown case", c)
