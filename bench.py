"""Headline benchmark: bases/sec/chip counting canonical 40-mers (hist +
table + per-position profile counts) on a synthetic 50X HiFi-like dataset.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bases/sec", "vs_baseline": N}

vs_baseline is against the reference FastK's published throughput of ~300 GB
input per wall-hour on an 8-core laptop (README.md:252-253) ~= 8.3e7 bases/s
for FASTA input, i.e. the number the reference claims on its own headline
hardware. Values > 1.0 beat the reference.
"""

import json
import sys
import time

import numpy as np

BASELINE_BASES_PER_SEC = 8.3e7  # FastK: ~300GB FASTA/hour on 8 cores


def synth_hifi(total_bases: int, genome: int = 2_000_000, read_len: int = 20_000,
               err: float = 0.003, seed: int = 0) -> np.ndarray:
    """50X-HiFi-like codes stream: reads sampled from a genome with errors,
    joined by sentinel 4."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, size=genome, dtype=np.uint8)
    nreads = total_bases // read_len
    out = np.empty(nreads * (read_len + 1), dtype=np.uint8)
    o = 0
    for _ in range(nreads):
        s = int(rng.integers(0, genome - read_len))
        r = g[s: s + read_len].copy()
        ne = int(err * read_len)
        if ne:
            pos = rng.integers(0, read_len, size=ne)
            r[pos] = (r[pos] + rng.integers(1, 4, size=ne)) % 4
        if rng.random() < 0.5:
            r = (3 - r)[::-1]
        out[o: o + read_len] = r
        o += read_len
        out[o] = 4
        o += 1
    return out


def main():
    import jax
    import jax.numpy as jnp

    from fastk_tpu.ops.count import count_batch
    from fastk_tpu.ops.kmers import pad_needed

    k = 40
    size = 1 << 26  # 64M positions per step
    nbatches = 2

    dev = jax.devices()[0]
    codes_host = synth_hifi(size)
    buf = np.full(size + pad_needed(k), 4, dtype=np.uint8)
    n = min(len(codes_host), size)
    buf[:n] = codes_host[:n]

    codes = jax.device_put(jnp.asarray(buf), dev)

    # warm-up / compile
    out = count_batch(codes, k, size, True)
    jax.block_until_ready(out)

    times = []
    for _ in range(nbatches + 1):
        t0 = time.perf_counter()
        out = count_batch(codes, k, size, True)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))

    bases = float(n)
    value = bases / t
    print(json.dumps({
        "metric": "bases/sec/chip counting 40-mers (hist+table+profile counts), 50X HiFi-like",
        "value": round(value),
        "unit": "bases/sec",
        "vs_baseline": round(value / BASELINE_BASES_PER_SEC, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
