"""Mosaic feasibility probes, round 3: while_loop-only scalar code.

Round 2 showed static fori_loop bodies get fully unrolled (compiler dies
on 4096+ iterations). Everything scalar here runs as lax.while_loop with
runtime bounds instead.

  1. SMEM hist (4096 / 32768 bins), zero + accumulate + writeout by while
  2. scalar while-loop throughput, 1M iterations
  3. ctz bit-iteration over packed words (the run-end walk)
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


def wloop(n, body, init):
    """while-loop for i in [0, n) carrying `init` (n traced scalar ok)."""
    def cond(c):
        return c[0] < n

    def step(c):
        return (c[0] + 1, body(c[0], c[1]))

    return jax.lax.while_loop(cond, step, (jnp.int32(0), init))[1]


def smem_hist(nbins):
    def kernel(x_ref, o_ref, hist):
        wloop(nbins, lambda i, _: (hist.__setitem__(i, 0), 0)[1], 0)

        def acc(i, _):
            v = x_ref[i // 128, i % 128]
            hist[v] += 1
            return 0

        wloop(1024, acc, 0)
        wloop(nbins, lambda i, _: (o_ref.__setitem__(i, hist[i]), 0)[1], 0)

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
    probe("SMEM hist 4096 bins (while)", smem_hist(4096))
    probe("SMEM hist 32768 bins (while)", smem_hist(32768))

    # 2: scalar while throughput
    def loop_kernel(x_ref, o_ref):
        def body(i, acc):
            return acc + x_ref[i & 7, i & 127]

        o_ref[0] = wloop(1_000_000, body, 0)

    def run_loop():
        x = jnp.ones((8, 128), jnp.int32)
        f = jax.jit(pl.pallas_call(
            loop_kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        ))
        assert int(f(x)[0]) == 1_000_000
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            int(f(x)[0])
            ts.append(time.perf_counter() - t0)
        return f"1M iters: {np.median(ts) * 1e3:.1f} ms"

    probe("scalar while 1M iters (incl ~28ms sync)", run_loop)

    # 3: ctz bit-iteration over packed words in VMEM
    def ctz_kernel(w_ref, o_ref):
        o_ref[0] = 0

        def outer(i, acc):
            w0 = w_ref[i // 128, i % 128]

            def inner(c):
                w, a = c
                low = w & -w
                b = 31 - jax.lax.clz(low)
                return (w & (w - 1), a + b)

            def cond(c):
                return c[0] != 0

            _, acc2 = jax.lax.while_loop(cond, inner, (w0, acc))
            return acc2

        o_ref[0] = wloop(1024, outer, 0)

    def run_ctz():
        rng = np.random.default_rng(3)
        w = rng.integers(0, 1 << 16, (8, 128), dtype=np.int32)
        out = pl.pallas_call(
            ctz_kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(jnp.asarray(w))
        want = sum(int(b) for x in w.reshape(-1)
                   for b in np.nonzero(np.unpackbits(
                       np.array([x], dtype=">i4").view(np.uint8))[::-1])[0])
        assert int(out[0]) == want, (int(out[0]), want)
        return "ctz walk ok"

    probe("ctz bit-iteration", run_ctz)


if __name__ == "__main__":
    main()
