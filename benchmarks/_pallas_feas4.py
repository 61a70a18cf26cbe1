"""Mosaic feasibility probes, round 4: minimal pairs to isolate what
crashes the remote compiler (HTTP 500) in scalar-loop kernels."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        print(f"{name:52s} OK   {out}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:100]
        print(f"{name:52s} FAIL {type(e).__name__}: {msg}", flush=True)


def wl(n, body, init):
    return jax.lax.while_loop(
        lambda c: c[0] < n, lambda c: (c[0] + 1, body(c[0], c[1])),
        (jnp.int32(0), init))[1]


def mk(kernel, in_smem=False, scratch=None, nout=1):
    x = jnp.ones((8, 128), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nout,), jnp.int32),
        in_specs=[pl.BlockSpec(
            memory_space=pltpu.SMEM if in_smem else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=scratch or [],
    )(x)


def main():
    # A: while + static VMEM scalar read
    def ka(x_ref, o_ref):
        o_ref[0] = wl(1000, lambda i, a: a + x_ref[0, 0], 0)

    probe("A while + static VMEM scalar read",
          lambda: int(mk(ka)[0]))

    # B: while + dynamic VMEM scalar read
    def kb(x_ref, o_ref):
        o_ref[0] = wl(1000, lambda i, a: a + x_ref[i & 7, i & 127], 0)

    probe("B while + dynamic VMEM scalar read",
          lambda: int(mk(kb)[0]))

    # C: while + dynamic SMEM scalar read (input in SMEM)
    def kc(x_ref, o_ref):
        o_ref[0] = wl(1000, lambda i, a: a + x_ref[i & 7, i & 127], 0)

    probe("C while + dynamic SMEM scalar read",
          lambda: int(mk(kc, in_smem=True)[0]))

    # D: SMEM scratch write in while (no VMEM at all)
    def kd(x_ref, o_ref, hist):
        def body(i, a):
            hist[i & 1023] += 1
            return a

        wl(1000, body, 0)
        o_ref[0] = hist[0]

    probe("D while + SMEM scratch accumulate",
          lambda: int(mk(kd, in_smem=True,
                         scratch=[pltpu.SMEM((1024,), jnp.int32)])[0]))

    # E: nested while (bit-walk shape) on pure scalars
    def ke(x_ref, o_ref):
        def outer(i, a):
            def cond(c):
                return c[0] != 0

            def inner(c):
                w, acc = c
                return (w & (w - 1), acc + (31 - jax.lax.clz(w & -w)))

            return jax.lax.while_loop(cond, inner, (i | 1, a))[1]

        o_ref[0] = wl(100, outer, 0)

    probe("E nested while + clz, pure scalar",
          lambda: int(mk(ke, in_smem=True)[0]))


if __name__ == "__main__":
    main()
