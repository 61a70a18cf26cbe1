"""Fresh per-stage decomposition of the hist_batch path at 2^26 (k=40)."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench as B
from fastk_tpu.ops.count import (hist_batch, bincount_by_sort, HIST_HIGH,
                                 fold_invalid, narrow_words)
from fastk_tpu.ops.kmers import canonical_kmers, pad_needed
from fastk_tpu.ops.pack import unpack_words

SIZE = 1 << 26
K = 40


def timeit(name, fn, *args, reps=5):
    r = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:9.1f} ms", flush=True)
    return r, best


def main():
    total = SIZE + pad_needed(K)
    pad4 = (-total) % 16
    block, nreads, stride = B.synth_hifi_device(SIZE, B.GENOME, B.READ_LEN)
    n = int(block.shape[0])
    full = jnp.concatenate([block, jnp.full(total + pad4 - n, 4, jnp.uint8)])
    packed_host = np.asarray(jax.lax.bitcast_convert_type(
        B.pack_codes_device(full).reshape(-1, 4), jnp.uint32))
    sent = np.arange(stride - 1, n, stride, dtype=np.uint32)
    tail = np.arange(n, total, dtype=np.uint32)
    exc = np.concatenate([sent, tail])
    m = ((len(exc) + 4095) // 4096) * 4096
    exc_host = np.full(m, 0xFFFFFFFF, dtype=np.uint32)
    exc_host[: len(exc)] = exc
    excd = jnp.asarray(exc_host)
    pd = jnp.asarray(packed_host)

    @jax.jit
    def keys(pw, e):
        codes = unpack_words(pw, e, total)
        words, invalid = canonical_kmers(codes, K, SIZE)
        f = narrow_words(fold_invalid(words, invalid), K)
        return f, jnp.sum(invalid.astype(jnp.int32))

    (f, ninv), t_keys = timeit("unpack+canonical+fold", keys, pd, excd)

    @jax.jit
    def sort3(f):
        return jax.lax.sort(f, num_keys=len(f), is_stable=False)

    s_words, t_sort = timeit("3-key sort", sort3, f)

    @jax.jit
    def scans(s_words, ninv):
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
        return jnp.where(use, jnp.minimum(seg_len, HIST_HIGH),
                         HIST_HIGH + 1).astype(jnp.uint16)

    vals, t_scans = timeit("starts+seglen scans", scans, s_words, ninv)

    @jax.jit
    def bc(vals):
        sv = jax.lax.sort((vals,), num_keys=1)[0]
        edges = jnp.searchsorted(sv, jnp.arange(HIST_HIGH + 2, dtype=sv.dtype))
        return (edges[1:] - edges[:-1]).astype(jnp.int32)

    _, t_bc = timeit("u16 bincount sort+searchsorted", bc, vals)

    @jax.jit
    def u16sort(vals):
        return jax.lax.sort((vals,), num_keys=1)[0][-1]

    timeit("  (u16 1-key sort alone)", u16sort, vals)

    @jax.jit
    def full_fn(pw, e):
        codes = unpack_words(pw, e, total)
        return hist_batch(codes, K, SIZE)

    _, t_full = timeit("hist_batch fused end-to-end", full_fn, pd, excd)
    print(f"sum of stages: {(t_keys+t_sort+t_scans+t_bc)*1e3:.1f} ms")

    # H2D today
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(packed_host))
    print(f"H2D packed batch today: {(time.perf_counter()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
