"""Where does the 2^26 -> 2^25 batch-size win come from? Per-stage resident
costs of the hist_batch pipeline at several sizes, normalized per 2^26
elements. Run after the streaming sweep showed 2^25 batches ~1.3x faster
end-to-end than 2^26 (bench.py FASTK_BENCH_SIZE sweep)."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fastk_tpu.ops.count import (fold_invalid, narrow_words, HIST_HIGH,
                                 hist_batch)

K = 40


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, reps=5):
    _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)
    for lg in (24, 25, 26):
        n = 1 << lg
        scale = (1 << 26) / n
        ks = jax.random.split(jax.random.PRNGKey(lg), 3)
        w0 = jax.random.randint(ks[0], (n,), 0, 1 << 30, dtype=jnp.uint32)
        w1 = jax.random.randint(ks[1], (n,), 0, 1 << 30, dtype=jnp.uint32)
        w2 = jax.random.randint(ks[2], (n,), 0, 1 << 16,
                                dtype=jnp.uint32).astype(jnp.uint16)
        u16 = (w2 % (HIST_HIGH + 2)).astype(jnp.uint16)
        codes = jax.random.randint(key, (n,), 0, 4, dtype=jnp.uint8)
        codes = jnp.concatenate(
            [codes, jnp.zeros(((K + 15) // 16) * 16, jnp.uint8)])

        @jax.jit
        def sort3(a, b, c):
            return jax.lax.sort((a, b, c), num_keys=3, is_stable=False)

        @jax.jit
        def sortu16(v):
            return jax.lax.sort((v,), num_keys=1, is_stable=False)

        @jax.jit
        def full(cod):
            return hist_batch(cod, K, n)

        t_s3 = timeit(sort3, w0, w1, w2)
        t_u16 = timeit(sortu16, u16)
        t_full = timeit(full, codes)
        print(f"2^{lg}: sort3 {t_s3*1e3:6.0f}ms (x{scale:.0f}={t_s3*scale*1e3:6.0f})  "
              f"u16 {t_u16*1e3:5.0f}ms (={t_u16*scale*1e3:5.0f})  "
              f"hist_batch {t_full*1e3:6.0f}ms (={t_full*scale*1e3:6.0f})",
              flush=True)


if __name__ == "__main__":
    main()
