"""Mosaic feasibility probes for the run-length histogram kernel.

Checks, each in isolation, on the real chip:
  1. scalar while_loop with data-dependent trip count inside a kernel
  2. scalar load from VMEM at a dynamic index
  3. scalar accumulate into VMEM at a dynamic index (hist[b] += 1)
  4. clz on a scalar (for the ctz = 31 - clz(w & -w) bit-iteration trick)
  5. sequential grid with an SMEM carry between grid steps
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        print(f"{name:44s} OK   {out}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:120]
        print(f"{name:44s} FAIL {type(e).__name__}: {msg}", flush=True)


def main():
    # 1+2+3: scalar-loop 16-bin histogram of 1024 small ints
    def hist_kernel(x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)

        def body(i, _):
            v = x_ref[i // 128, i % 128]
            o_ref[0, v] += 1
            return 0

        jax.lax.fori_loop(0, 1024, body, 0)

    def run_hist():
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 16, (8, 128), np.int32))
        out = pl.pallas_call(
            hist_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 16), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        got = np.asarray(out)[0]
        want = np.bincount(np.asarray(x).reshape(-1), minlength=16)
        assert np.array_equal(got, want), (got, want)
        return "hist matches"

    probe("scalar fori + dyn load + dyn accumulate", run_hist)

    # 1b: while_loop with data-dependent bound
    def while_kernel(x_ref, o_ref):
        def cond(c):
            i, acc = c
            return i < x_ref[0, 0]

        def body(c):
            i, acc = c
            return i + 1, acc + i

        _, acc = jax.lax.while_loop(cond, body, (0, 0))
        o_ref[0, 0] = acc

    def run_while():
        x = jnp.full((1, 1), 37, jnp.int32)
        out = pl.pallas_call(
            while_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x)
        assert int(out[0, 0]) == 37 * 36 // 2
        return "while ok"

    probe("data-dependent while_loop", run_while)

    # 4: clz on scalar
    def clz_kernel(x_ref, o_ref):
        w = x_ref[0, 0]
        o_ref[0, 0] = jax.lax.clz(w)

    def run_clz():
        x = jnp.full((1, 1), 1 << 20, jnp.int32)
        out = pl.pallas_call(
            clz_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x)
        assert int(out[0, 0]) == 11, int(out[0, 0])
        return "clz ok"

    probe("scalar clz", run_clz)

    # 5: sequential grid with SMEM carry (running sum across blocks)
    def carry_kernel(x_ref, o_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[0] = 0

        s = carry[0] + jnp.sum(x_ref[...])
        carry[0] = s
        o_ref[0, 0] = s

    def run_carry():
        x = jnp.arange(4 * 8 * 128, dtype=jnp.int32).reshape(4, 8, 128)
        out = pl.pallas_call(
            carry_kernel,
            out_shape=jax.ShapeDtypeStruct((4, 1), jnp.int32),
            grid=(4,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )(x)
        want = np.cumsum(np.arange(4 * 8 * 128).reshape(4, -1).sum(1))
        assert np.array_equal(np.asarray(out).reshape(-1), want)
        return "carry ok"

    probe("sequential grid + SMEM carry", run_carry)


if __name__ == "__main__":
    main()
