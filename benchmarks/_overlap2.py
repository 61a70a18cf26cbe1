"""Can H2D proceed WHILE the device computes, at all, on this transport?

Dispatch a long compute (several chained sorts), then immediately start an
H2D of the bench's packed batch. If the transfer completes in ~its solo
time, overlap exists and the bench loop structure is the problem; if it
takes compute+solo, the transport serializes.

Also: chunked H2D (4 x 4MB) vs one 16.8MB to see whether transfer cost is
per-byte or per-call, and device_put vs asarray.
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

N = 1 << 22  # 16.8MB of uint32


def main():
    host = np.random.randint(0, 2**31, size=N, dtype=np.uint32)
    dev = jnp.asarray(host)

    @jax.jit
    def heavy(x):
        for _ in range(6):
            x = jax.lax.sort((x,), num_keys=1)[0]
            x = x ^ (x >> 1)
        return x

    jax.block_until_ready(heavy(dev))

    # solo H2D
    for _ in range(2):
        t0 = time.perf_counter()
        a = jax.block_until_ready(jnp.asarray(host))
        t_h2d = time.perf_counter() - t0
    print(f"solo H2D 16.8MB: {t_h2d*1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    out = heavy(dev)
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    a = jax.block_until_ready(jnp.asarray(host))
    t_h2d_during = time.perf_counter() - t0
    jax.block_until_ready(out)
    t_total = time.perf_counter() - t0
    print(f"dispatch: {t_dispatch*1e3:.1f} ms; H2D during compute: "
          f"{t_h2d_during*1e3:.1f} ms; compute total after: "
          f"{t_total*1e3:.1f} ms", flush=True)

    # compute solo time
    t0 = time.perf_counter()
    jax.block_until_ready(heavy(dev))
    t_comp = time.perf_counter() - t0
    print(f"solo compute: {t_comp*1e3:.1f} ms", flush=True)

    # chunked H2D
    for parts in (2, 4, 16):
        chunks = np.split(host, parts)
        t0 = time.perf_counter()
        ds = [jnp.asarray(c) for c in chunks]
        jax.block_until_ready(ds)
        t = time.perf_counter() - t0
        print(f"H2D in {parts} chunks: {t*1e3:.1f} ms", flush=True)

    # device_put
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(host))
    print(f"device_put: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    # dlpack/pinned? try jax.device_put with explicit device and donate
    # byte-width sensitivity: uint8 vs uint32 vs uint64 views
    h8 = host.view(np.uint8)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(h8[: 1 << 20]))  # 1MB as u8
    print(f"1MB uint8: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    h64 = host.view(np.uint64)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(h64))
    print(f"16.8MB uint64: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
