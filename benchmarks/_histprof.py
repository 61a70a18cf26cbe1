"""Stage profile of hist_batch (the headline -k job) at 2^26 positions."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fastk_tpu.ops.count import (
    HIST_HIGH, bincount_by_sort, fold_invalid, narrow_words)
from fastk_tpu.ops.kmers import canonical_kmers, pad_needed
from fastk_tpu.ops.pack import pack_stream, unpack_stream

K = 40
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
    total = SIZE + pad_needed(K)
    codes_host = rng.integers(0, 4, size=total, dtype=np.uint8)
    codes_host[:: 20001] = 4
    codes_host[SIZE:] = 4
    packed_host, exc_host = pack_stream(codes_host)
    packed = jnp.asarray(packed_host)
    exc = jnp.asarray(exc_host)

    timeit("null", jax.jit(lambda p: jnp.sum(p[:8])), packed)
    timeit("unpack", jax.jit(
        lambda p, e: chk(unpack_stream(p, e, total))), packed, exc)

    codes = jax.jit(lambda p, e: unpack_stream(p, e, total))(packed, exc)
    timeit("canonical_kmers", jax.jit(
        lambda c: chk(canonical_kmers(c, K, SIZE)[0][0])), codes)

    @jax.jit
    def keysort(c):
        words, invalid = canonical_kmers(c, K, SIZE)
        f = narrow_words(fold_invalid(words, invalid), K)
        s = jax.lax.sort(f, num_keys=len(f), is_stable=False)
        return chk(s[0])

    t_cs = timeit("canonical + key sort", keysort, codes)

    @jax.jit
    def through_scans(c):
        words, invalid = canonical_kmers(c, K, SIZE)
        ninv = jnp.sum(invalid.astype(jnp.int32))
        f = narrow_words(fold_invalid(words, invalid), K)
        s_words = jax.lax.sort(f, num_keys=len(f), is_stable=False)
        starts = jnp.zeros(SIZE, dtype=bool)
        for w in s_words:
            starts = starts | (w != jnp.roll(w, 1))
        starts = starts.at[0].set(True)
        idx = jnp.arange(SIZE, dtype=jnp.int32)
        nxt = jnp.where(starts, idx, SIZE)
        nxt_after = jnp.concatenate(
            [jax.lax.cummin(nxt[::-1])[::-1][1:],
             jnp.full((1,), SIZE, jnp.int32)])
        seg_len = nxt_after - idx
        use = starts & (idx < SIZE - ninv)
        vals = jnp.where(use, jnp.minimum(seg_len, HIST_HIGH), HIST_HIGH + 1)
        return chk(vals)

    timeit("canonical + sort + scans", through_scans, codes)

    from fastk_tpu.ops.count import hist_batch

    timeit("hist_batch full", jax.jit(
        lambda c: hist_batch(c, K, SIZE)["hist"][:8].sum()), codes)

    # bincount alone on realistic input (sentinel-heavy)
    vals = np.full(SIZE, HIST_HIGH + 1, np.uint16)
    nu = SIZE // 16
    vals[rng.integers(0, SIZE, nu)] = rng.integers(
        1, 200, nu).astype(np.uint16)
    valsd = jnp.asarray(vals)
    timeit("bincount_by_sort (sentinel-heavy)", jax.jit(
        lambda v: bincount_by_sort(v, HIST_HIGH + 1)[:8].sum()), valsd)


if __name__ == "__main__":
    main()
