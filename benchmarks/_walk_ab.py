"""In-process A/B: streaming loop (fresh H2D per batch) with the XLA
hist_batch vs the Pallas walk path, interleaved to cancel link drift."""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
import bench as B

from fastk_tpu.ops import histker
from fastk_tpu.ops.count import hist_batch
from fastk_tpu.ops.kmers import pad_needed
from fastk_tpu.ops.pack import unpack_words

K, SIZE, NB = B.K, B.SIZE, 4


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
        return histker._run_walk(w, rows // br, br, nv) + (nv,)

    def run_old():
        t0 = time.perf_counter()
        outs = [step_old(jnp.asarray(packed_host), excd)
                for _ in range(NB)]
        hists = np.asarray(jnp.stack([o["hist"] for o in outs]))
        dt = (time.perf_counter() - t0) / NB
        assert all(int(h[1:].sum()) > 0 for h in hists)
        return dt

    def run_walk():
        t0 = time.perf_counter()
        outs = [step_walk(jnp.asarray(packed_host), excd)
                for _ in range(NB)]
        rows_ = np.asarray(jnp.stack([
            jnp.concatenate([o[0], o[1], o[2], o[3].reshape(1)])
            for o in outs]))
        hists = []
        for r in rows_:
            res = histker._assemble(r[:2048], r[2048:3072],
                                    r[3072:3076], int(r[3076]))
            assert res is not None
            hists.append(res["hist"])
        dt = (time.perf_counter() - t0) / NB
        assert all(int(h[1:].sum()) > 0 for h in hists)
        return dt

    run_old()
    run_walk()
    olds, walks = [], []
    for _ in range(6):
        olds.append(run_old())
        walks.append(run_walk())
    print(f"old : {min(olds) * 1e3:8.1f} ms/batch "
          f"(all {[round(x * 1e3) for x in olds]})", flush=True)
    print(f"walk: {min(walks) * 1e3:8.1f} ms/batch "
          f"(all {[round(x * 1e3) for x in walks]})", flush=True)


if __name__ == "__main__":
    main()
