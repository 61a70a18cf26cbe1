"""Correctness + timing of the Pallas run-length histogram vs hist_batch.

Cases: random (distinct-heavy), high-duplication, single giant run (big
side list), sentinel-heavy (invalid tail), empty, and the 2^26 benchmark
shape for timing.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fastk_tpu.ops.count import hist_batch
from fastk_tpu.ops.histker import hist_batch_fast
from fastk_tpu.ops.kmers import pad_needed

K = 40


def check(name, codes_host, size):
    codes = jnp.asarray(codes_host)
    want = hist_batch(codes, K, size)
    wh = np.asarray(want["hist"]).astype(np.int64)
    wn = int(want["nvalid"])
    got = hist_batch_fast(codes, K, size)
    if got is None:
        print(f"{name:34s} FALLBACK (side list overflow)", flush=True)
        return
    ok = np.array_equal(got["hist"][1:], wh[1:]) and got["nvalid"] == wn
    if not ok:
        d = np.nonzero(got["hist"][1:] != wh[1:])[0][:5] + 1
        print(f"{name:34s} MISMATCH at bins {d.tolist()} "
              f"got={got['hist'][d].tolist()} want={wh[d].tolist()} "
              f"nvalid {got['nvalid']} vs {wn}", flush=True)
    else:
        print(f"{name:34s} OK", flush=True)


def main():
    rng = np.random.default_rng(0)
    S = 1 << 15
    pad = pad_needed(K)

    c = rng.integers(0, 4, S + pad).astype(np.uint8)
    c[S:] = 4
    check("random distinct-heavy", c, S)

    # high duplication: tile one 200-base unit
    unit = rng.integers(0, 4, 200).astype(np.uint8)
    c = np.tile(unit, (S + pad) // 200 + 1)[: S + pad].astype(np.uint8)
    c[S:] = 4
    check("high duplication", c, S)

    # single giant run: all-A (canonical all-A) -> one segment of ~S
    c = np.zeros(S + pad, np.uint8)
    c[S:] = 4
    check("single giant run (big list)", c, S)

    # sentinel-heavy: short reads
    c = rng.integers(0, 4, S + pad).astype(np.uint8)
    c[:: 37] = 4
    c[S:] = 4
    check("sentinel-heavy", c, S)

    # all invalid
    c = np.full(S + pad, 4, np.uint8)
    check("all invalid", c, S)

    # valid_end exactly on a word boundary
    c = rng.integers(0, 4, S + pad).astype(np.uint8)
    c[S - 16 * 7:] = 4
    check("boundary-ish tail", c, S)

    # timing at the benchmark shape
    S2 = 1 << 26
    c = rng.integers(0, 4, S2 + pad).astype(np.uint8)
    c[:: 20001] = 4
    c[S2:] = 4
    codes = jnp.asarray(c)
    check("2^26 random", c, S2)

    got = hist_batch_fast(codes, K, S2)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        got = hist_batch_fast(codes, K, S2)
        ts.append(time.perf_counter() - t0)
    print(f"hist_batch_fast 2^26 (distinct-heavy): "
          f"{np.median(ts) * 1e3:.1f} ms", flush=True)

    f_old = jax.jit(lambda c: hist_batch(c, K, S2)["hist"])
    np.asarray(f_old(codes))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f_old(codes))
        ts.append(time.perf_counter() - t0)
    print(f"hist_batch      2^26 (distinct-heavy): "
          f"{np.median(ts) * 1e3:.1f} ms", flush=True)

    # high-dup timing (the benchmark's regime): 33X coverage
    g = rng.integers(0, 4, 2_000_000).astype(np.uint8)
    reps = []
    total = 0
    while total < S2 + pad:
        s = int(rng.integers(0, len(g) - 20001))
        reps.append(g[s: s + 20000])
        reps.append(np.array([4], np.uint8))
        total += 20001
    c = np.concatenate(reps)[: S2 + pad]
    c[S2:] = 4
    codes = jnp.asarray(c)
    check("2^26 33X-coverage", c, S2)
    got = hist_batch_fast(codes, K, S2)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        got = hist_batch_fast(codes, K, S2)
        ts.append(time.perf_counter() - t0)
    print(f"hist_batch_fast 2^26 (33X): {np.median(ts) * 1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
