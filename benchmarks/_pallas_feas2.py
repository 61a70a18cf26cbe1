"""Mosaic feasibility probes, round 2, for the run-length histogram kernel.

  1. SMEM scratch capacity: (4096,) and (32768,) int32
  2. scalar accumulate into SMEM scratch at dynamic index
  3. SMEM scratch persistence across sequential grid steps
  4. raw scalar-loop throughput (cycles/iter via wall time, 1M iters)
  5. f32 matmul bit-pack: (8,128) mask @ (128,8) powers-of-two -> exact u16
  6. dynamic (1,)-slice vector store to VMEM (fallback writeout)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        print(f"{name:46s} OK   {out}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"{name:46s} FAIL {type(e).__name__}: {msg}", flush=True)


def smem_hist(nbins):
    def kernel(x_ref, o_ref, hist):
        def zero(i, _):
            hist[i] = 0
            return 0

        jax.lax.fori_loop(0, nbins, zero, 0)

        def body(i, _):
            v = x_ref[i // 128, i % 128]
            hist[v] += 1
            return 0

        jax.lax.fori_loop(0, 1024, body, 0)

        def out(i, _):
            o_ref[i] = hist[i]
            return 0

        jax.lax.fori_loop(0, nbins, out, 0)

    def run():
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, nbins, (8, 128), np.int32))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nbins,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((nbins,), jnp.int32)],
        )(x)
        got = np.asarray(out)
        want = np.bincount(np.asarray(x).reshape(-1), minlength=nbins)
        assert np.array_equal(got, want)
        return f"{nbins} bins ok"

    return run


def main():
    probe("SMEM hist 4096 bins", smem_hist(4096))
    probe("SMEM hist 32768 bins", smem_hist(32768))

    # 3: SMEM scratch persists across grid steps
    def carry_kernel(x_ref, o_ref, acc):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[0] = 0

        acc[0] += jnp.sum(x_ref[...])

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[0] = acc[0]

    def run_carry():
        x = jnp.arange(4 * 8 * 128, dtype=jnp.int32).reshape(4 * 8, 128)
        out = pl.pallas_call(
            carry_kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            grid=(4,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )(x)
        assert int(out[0]) == int(np.arange(4 * 8 * 128).sum())
        return "carry ok"

    probe("SMEM scratch across grid steps", run_carry)

    # 4: scalar loop throughput
    def loop_kernel(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[i % 8, i % 128]

        o_ref[0] = jax.lax.fori_loop(0, 1_000_000, body, 0)

    def run_loop():
        x = jnp.ones((8, 128), jnp.int32)
        f = pl.pallas_call(
            loop_kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        f = jax.jit(f)
        assert int(f(x)[0]) == 1_000_000
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(f(x)[0])
            ts.append(time.perf_counter() - t0)
        return f"1M iters: {np.median(ts) * 1e3:.1f} ms"

    probe("scalar loop 1M iters (incl ~28ms sync)", run_loop)

    # 5: f32 matmul bit-pack
    def pack_kernel(m_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(m_ref[...], w_ref[...],
                             preferred_element_type=jnp.float32)

    def run_pack():
        rng = np.random.default_rng(1)
        m = rng.integers(0, 2, (8, 128)).astype(np.float32)
        w = np.zeros((128, 8), np.float32)
        for j in range(8):
            for b in range(16):
                w[j * 16 + b, j] = float(1 << b)
        out = pl.pallas_call(
            pack_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(m), jnp.asarray(w))
        got = np.asarray(out).astype(np.int64)
        want = (m.reshape(8, 8, 16).astype(np.int64)
                * (1 << np.arange(16))).sum(-1)
        assert np.array_equal(got, want)
        return "pack exact"

    probe("f32 matmul bit-pack", run_pack)

    # 6: dynamic single-element vector store to VMEM
    def dynstore_kernel(x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)

        def body(i, _):
            v = x_ref[0, i]
            o_ref[0, pl.ds(v, 1)] = jnp.full((1,), i, jnp.int32)
            return 0

        jax.lax.fori_loop(0, 16, body, 0)

    def run_dynstore():
        x = jnp.asarray(
            np.random.default_rng(2).permutation(128)[None, :16]
            .astype(np.int32))
        out = pl.pallas_call(
            dynstore_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        got = np.asarray(out)[0]
        xs = np.asarray(x)[0]
        ok = all(got[xs[i]] == i for i in range(16))
        assert ok
        return "dyn store ok"

    probe("dynamic (1,)-store to VMEM", run_dynstore)


if __name__ == "__main__":
    main()
