"""Does CHUNKING a large H2D let it overlap device compute? NO.

Measured (v5e via the tunneled transport, 2^26-record 3-key sort = 269ms
resident): sort+one 16.8MB upload = 447-510ms; sort+4x4.2MB = 493-503ms;
upload-only 16.8MB = 374ms, 4 chunks = 468ms, 16 chunks = 807ms. Per-
transfer fixed overhead is ~30-50ms, so chunking a big upload makes it
WORSE, and no overlap materializes at this size either way. The round-3
batch-size win (benchmarks/README) comes from per-batch uploads being
naturally small (4MB at 2^24), not from anything schedulable here.

CAUTION: on this experimental backend `block_until_ready` can return
before the computation really finished — every timing below forces a
dependent 1-element D2H instead (np.asarray of a reduced probe), like
the other benchmark harnesses in this directory."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import fastk_tpu.jaxenv  # noqa: F401

N = 1 << 26


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    a = jax.random.randint(ks[0], (N,), 0, 1 << 30, dtype=jnp.uint32)
    b = jax.random.randint(ks[1], (N,), 0, 1 << 30, dtype=jnp.uint32)
    c = jax.random.randint(ks[2], (N,), 0, 1 << 16,
                           dtype=jnp.uint32).astype(jnp.uint16)

    @jax.jit
    def sort3(a, b, c):
        return jax.lax.sort((a, b, c), num_keys=3, is_stable=False)

    @jax.jit
    def touch(x):
        return x[::65536].astype(jnp.uint32).sum()

    host = np.random.randint(0, 1 << 30, N // 16, dtype=np.uint32)  # 16.8MB

    def sync(arrs):
        for x in arrs:
            np.asarray(touch(x))

    def run(nchunks):
        out = sort3(a, b, c)
        ups = []
        if nchunks:
            step = len(host) // nchunks
            ups = [jax.device_put(host[i * step:(i + 1) * step])
                   for i in range(nchunks)]
        sync(ups + [out[0]])

    for nchunks in (0, 1, 4, 0, 1, 4):
        run(nchunks)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            run(nchunks)
            ts.append(time.perf_counter() - t0)
        print(f"sort+upload chunks={nchunks}: {min(ts)*1e3:6.0f}ms",
              flush=True)

    for nchunks in (1, 4, 16):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            step = len(host) // nchunks
            ups = [jax.device_put(host[i * step:(i + 1) * step])
                   for i in range(nchunks)]
            sync(ups)
            ts.append(time.perf_counter() - t0)
        print(f"upload-only chunks={nchunks}: {min(ts)*1e3:6.0f}ms",
              flush=True)


if __name__ == "__main__":
    main()
