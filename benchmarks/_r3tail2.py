"""Row-decomposed tail stages: the u16 bincount sort and the next-start
reverse cummin don't need GLOBAL order, so both can run on (R, C) rows —
bitonic stage count scales ~log^2(axis length), so shorter rows are cheaper
per element. Checks exact equality against the flat versions."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench as B

from fastk_tpu.ops.count import (fold_invalid, narrow_words, HIST_HIGH)
from fastk_tpu.ops.kmers import canonical_kmers, pad_needed
from fastk_tpu.ops.pack import unpack_words

K, SIZE = B.K, B.SIZE


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, reps=4):
    _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


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
    def sorted_keys(pw, e):
        codes = unpack_words(pw, e, total)
        words, invalid = canonical_kmers(codes, K, SIZE)
        ninv = jnp.sum(invalid.astype(jnp.int32))
        f = narrow_words(fold_invalid(words, invalid), K)
        return jax.lax.sort(f, num_keys=len(f), is_stable=False), ninv

    s_words, ninv = sorted_keys(pd, excd)
    s_words = tuple(jax.device_put(np.asarray(w)) for w in s_words)
    ninv = jax.device_put(np.asarray(ninv))

    @jax.jit
    def stage_starts(s_words):
        starts = jnp.zeros(SIZE, dtype=bool)
        for w in s_words:
            starts = starts | (w != jnp.roll(w, 1))
        return starts.at[0].set(True)

    starts = jax.device_put(np.asarray(stage_starts(s_words)))

    @jax.jit
    def seglen_flat(starts):
        idx = jnp.arange(SIZE, dtype=jnp.int32)
        nxt = jnp.where(starts, idx, SIZE)
        nxt_after = jnp.concatenate(
            [jax.lax.cummin(nxt, reverse=True)[1:],
             jnp.full((1,), SIZE, jnp.int32)])
        return nxt_after - idx

    def seglen_rows(R):
        C = SIZE // R

        @jax.jit
        def f(starts):
            idx = jnp.arange(SIZE, dtype=jnp.int32)
            nxt = jnp.where(starts, idx, SIZE).reshape(R, C)
            rm = jax.lax.cummin(nxt, axis=1, reverse=True)
            # suffix min of later rows' minima (row i sees rows > i)
            rmin = rm[:, 0]
            suf = jax.lax.cummin(
                jnp.concatenate([rmin[1:], jnp.full((1,), SIZE, jnp.int32)]),
                reverse=True)
            out = jnp.minimum(rm, suf[:, None]).reshape(-1)
            nxt_after = jnp.concatenate(
                [out[1:], jnp.full((1,), SIZE, jnp.int32)])
            return nxt_after - idx
        return f

    seg_len = jax.device_put(np.asarray(seglen_flat(starts)))

    @jax.jit
    def stage_vals(starts, seg_len, ninv):
        idx = jnp.arange(SIZE, dtype=jnp.int32)
        use = starts & (idx < SIZE - ninv)
        return jnp.where(use, jnp.minimum(seg_len, HIST_HIGH),
                         HIST_HIGH + 1).astype(jnp.uint16)

    vals = jax.device_put(np.asarray(stage_vals(starts, seg_len, ninv)))

    @jax.jit
    def bincount_flat(vals):
        sv = jax.lax.sort((vals,), num_keys=1, is_stable=False)[0]
        edges = jnp.searchsorted(
            sv, jnp.arange(HIST_HIGH + 2, dtype=sv.dtype))
        return (edges[1:] - edges[:-1]).astype(jnp.int32)

    def bincount_rows(R):
        C = SIZE // R

        @jax.jit
        def f(vals):
            sv = jax.lax.sort((vals.reshape(R, C),), num_keys=1,
                              is_stable=False)[0]
            e = jnp.arange(HIST_HIGH + 2, dtype=sv.dtype)
            edges = jax.vmap(lambda row: jnp.searchsorted(row, e))(sv)
            return (edges[:, 1:] - edges[:, :-1]).sum(
                axis=0, dtype=jnp.int32)
        return f

    ref_len = np.asarray(seglen_flat(starts))
    ref_hist = np.asarray(bincount_flat(vals))

    print("seglen flat   ", round(timeit(seglen_flat, starts) * 1e3), flush=True)
    for R in (64, 256, 1024, 4096):
        f = seglen_rows(R)
        got = np.asarray(f(starts))
        ok = "OK" if np.array_equal(got, ref_len) else "MISMATCH"
        print(f"seglen rows {R:5d}", round(timeit(f, starts) * 1e3), ok,
              flush=True)

    print("bincount flat ", round(timeit(bincount_flat, vals) * 1e3), flush=True)
    for R in (16, 64, 256, 1024):
        f = bincount_rows(R)
        got = np.asarray(f(vals))
        ok = "OK" if np.array_equal(got, ref_hist) else "MISMATCH"
        print(f"bincount rows {R:5d}", round(timeit(f, vals) * 1e3), ok,
              flush=True)


if __name__ == "__main__":
    main()
