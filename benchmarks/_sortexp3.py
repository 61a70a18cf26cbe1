"""Round-2 sort experiments, part 2: u64 fused keys (x64 mode), stable-sort
cost, value-operand scaling, and where bincount_by_sort's non-sort time goes.
"""

import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

SIZE = 1 << 26


def timeit(name, fn, *args, n=3):
    fn(*args)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{name:44s} {t * 1e3:9.1f} ms", flush=True)
    return t


def chk(x):
    return x[::65536].astype(jnp.int32).sum()


def main():
    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.integers(0, 1 << 32, SIZE, dtype=np.uint32))
    w1 = jnp.asarray(rng.integers(0, 1 << 32, SIZE, dtype=np.uint32))
    w2 = jnp.asarray(rng.integers(0, 1 << 16, SIZE, dtype=np.uint16))

    timeit("null (sync latency)", jax.jit(lambda a: jnp.sum(a[:8])), w0)

    def s(ops, nk, stable=False):
        out = jax.lax.sort(ops, num_keys=nk, is_stable=stable)
        return chk(out[0])

    # u64 fused keys
    def fuse(a, b):
        return (a.astype(jnp.uint64) << 32) | b.astype(jnp.uint64)

    timeit("sort (u64) 1key [fuse incl]", jax.jit(
        lambda a, b: s((fuse(a, b),), 1)), w0, w1)
    timeit("sort (u64,u16) 2key", jax.jit(
        lambda a, b, c: s((fuse(a, b), c), 2)), w0, w1, w2)
    timeit("sort (u64)+u16 val", jax.jit(
        lambda a, b, c: s((fuse(a, b), c), 1)), w0, w1, w2)
    timeit("sort (u64,u64) 2key", jax.jit(
        lambda a, b, c: s((fuse(a, b), fuse(b, a)), 2)), w0, w1, w2)

    # value scaling and stability
    timeit("sort (u32)+1 u32 val", jax.jit(
        lambda a, b: s((a, b), 1)), w0, w1)
    timeit("sort (u32)+2 vals", jax.jit(
        lambda a, b, c: s((a, b, c), 1)), w0, w1, w2)
    timeit("sort stable (u32)+2 vals", jax.jit(
        lambda a, b, c: s((a, b, c), 1, True)), w0, w1, w2)
    timeit("sort stable (u8)+3 vals", jax.jit(
        lambda a, b, c: s(((a & 255).astype(jnp.uint8), a, b, c), 1, True)),
        w0, w1, w2)

    # row sorts with u64 fused key
    for B in (64, 256, 1024):
        L = SIZE // B

        def rows(a, b, c, B=B, L=L):
            out = jax.lax.sort(
                (fuse(a, b).reshape(B, L), c.reshape(B, L)),
                dimension=1, num_keys=2, is_stable=False)
            return chk(out[0].reshape(-1))

        timeit(f"row sort ({B},{L}) (u64,u16) 2key", jax.jit(rows),
               w0, w1, w2)

    # bincount_by_sort anatomy: sort vs searchsorted
    vals = jnp.asarray(rng.integers(0, 32768, SIZE).astype(np.uint16))
    sv = jax.jit(lambda v: jax.lax.sort((v,), num_keys=1)[0])(vals)

    timeit("u16 1key sort alone", jax.jit(
        lambda v: chk(jax.lax.sort((v,), num_keys=1)[0])), vals)
    timeit("searchsorted 32770 edges in 64M", jax.jit(
        lambda v: jnp.searchsorted(
            v, jnp.arange(32770, dtype=v.dtype)).astype(jnp.int32)[:8].sum()),
        sv)


if __name__ == "__main__":
    main()
