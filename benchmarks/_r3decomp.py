"""Round-3 decomposition of the headline batch on today's rig, all in one
process, interleaved: H2D solo, compute-only (input resident), sort-only,
full streamed step, and the walk variant — each min-of-5."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench as B

from fastk_tpu.ops import histker
from fastk_tpu.ops.count import (hist_batch, fold_invalid, narrow_words,
                                 bincount_by_sort, HIST_HIGH)
from fastk_tpu.ops.kmers import canonical_kmers, pad_needed
from fastk_tpu.ops.pack import unpack_words

K, SIZE = B.K, B.SIZE


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, reps=5):
    _sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


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
        return narrow_words(fold_invalid(words, invalid), K)

    @jax.jit
    def sort_only(f):
        return jax.lax.sort(f, num_keys=len(f), is_stable=False)

    @jax.jit
    def step(pw, e):
        return hist_batch(unpack_words(pw, e, total), K, SIZE)

    f = tuple(jax.device_put(x) for x in jax.device_get(keys(pd, excd)))
    _sync(f)

    rows = SIZE // 4096
    br = 8
    while br < histker.BLOCK_ROWS and rows % (br * 2) == 0:
        br *= 2

    @jax.jit
    def step_walk(pw, e):
        codes = unpack_words(pw, e, total)
        w, nv = histker.hist_device_part(codes, K, SIZE)
        return histker._run_walk(w, rows // br, br, nv) + (nv,)

    results = {}
    for name, fn in [
        ("h2d 16.8MB", lambda: jnp.asarray(packed_host)),
        ("keys only (h2d+unpack+canon)", lambda: keys(jnp.asarray(packed_host), excd)),
        ("sort3 only (resident)", lambda: sort_only(f)),
        ("full step (h2d+all)", lambda: step(jnp.asarray(packed_host), excd)),
        ("walk step (h2d+all)", lambda: step_walk(jnp.asarray(packed_host), excd)),
        ("full step resident", lambda: step(pd, excd)),
    ]:
        best, ts = timeit(fn)
        results[name] = (best, ts)
        print(f"{name:34s} {best*1e3:7.1f} ms  {['%.0f' % (t*1e3) for t in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
