"""Round-3 sort shape measurements for the hash-grouped hist path.

The exact-grouping insight round 2's hash experiment missed: the 80-bit key
can be sorted as a 64-bit injective-mix KEY plus a 16-bit remainder carried
as a VALUE (10 bytes/record, same as the exact 3-key sort) such that
(h0,h1,c) is a BIJECTION of (w0,w1,w2). Equal (h0,h1) runs with constant c
are exactly equal keys; a run with differing c is a 64-bit hash collision
(probability ~ u^2/2^65 per batch under the mix) -> fall back to the exact
3-key sort for that batch.

Measures at 2^26 records (k=40 shapes):
  a) (u32,u32,u16) 3-key                     [current hist_batch sort]
  b) (u32,u32) 2-key + u16 value             [hash-grouped shape]
  c) (u32,u32) 2-key alone
  d) u16 1-key                               [bincount_by_sort shape]
  e) u16 1-key + nothing, at 2^23            [scaling point]
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

SIZE = 1 << 26


def _sync(out):
    # block_until_ready is unreliable on the tunneled backend: fetch a byte
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[:1])


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
    k0, k1, k2 = jax.random.split(key, 3)
    w0 = jax.random.bits(k0, (SIZE,), jnp.uint32)
    w1 = jax.random.bits(k1, (SIZE,), jnp.uint32)
    w2 = (jax.random.bits(k2, (SIZE,), jnp.uint32) >> 16).astype(jnp.uint16)
    jax.block_until_ready((w0, w1, w2))

    @jax.jit
    def sort3(a, b, c):
        return jax.lax.sort((a, b, c), num_keys=3, is_stable=False)

    @jax.jit
    def sort2v(a, b, c):
        return jax.lax.sort((a, b, c), num_keys=2, is_stable=False)

    @jax.jit
    def sort2(a, b):
        return jax.lax.sort((a, b), num_keys=2, is_stable=False)

    @jax.jit
    def sort1u16(c):
        return jax.lax.sort((c,), num_keys=1, is_stable=False)

    @jax.jit
    def sort1v(a, b, c):
        return jax.lax.sort((a, b, c), num_keys=1, is_stable=False)

    print("n =", SIZE, "platform:", jax.devices()[0].platform)
    print("a) 3-key (u32,u32,u16)        ", timeit(sort3, w0, w1, w2))
    print("b) 2-key (u32,u32) + u16 value", timeit(sort2v, w0, w1, w2))
    print("c) 2-key (u32,u32)            ", timeit(sort2, w0, w1))
    print("d) 1-key u16                  ", timeit(sort1u16, w2))
    print("e) 1-key u32 + u32,u16 values ", timeit(sort1v, w0, w1, w2))
    w2s = w2[: 1 << 23]
    print("f) 1-key u16 at 2^23          ", timeit(sort1u16, w2s))


if __name__ == "__main__":
    main()
