"""Resident-input A/B of the bench device step: XLA bincount path vs the
Pallas walk path, link excluded (input uploaded once)."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench as B

from fastk_tpu.ops import histker
from fastk_tpu.ops.count import hist_batch
from fastk_tpu.ops.kmers import pad_needed
from fastk_tpu.ops.pack import unpack_words

K, SIZE = B.K, B.SIZE


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


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

    rows = SIZE // 4096
    br = 8
    while br < histker.BLOCK_ROWS and rows % (br * 2) == 0:
        br *= 2

    @jax.jit
    def step_old(pw, e):
        return hist_batch(unpack_words(pw, e, total), K, SIZE)

    @jax.jit
    def step_walk(pw, e):
        codes = unpack_words(pw, e, total)
        w, nv = histker.hist_device_part(codes, K, SIZE)
        hist_lo, big, meta = histker._run_walk(w, rows // br, br, nv)
        return (hist_lo, big, meta, nv)

    _sync(step_old(pd, excd))
    _sync(step_walk(pd, excd))

    a, b = [], []
    for _ in range(6):
        t0 = time.perf_counter()
        _sync(step_old(pd, excd))
        a.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(step_walk(pd, excd))
        b.append(time.perf_counter() - t0)
    print("old  resident:", ["%.0f" % (t * 1e3) for t in a], "min",
          round(min(a) * 1e3))
    print("walk resident:", ["%.0f" % (t * 1e3) for t in b], "min",
          round(min(b) * 1e3))


if __name__ == "__main__":
    main()
