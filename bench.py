"""Headline benchmark: bases/sec/chip computing the canonical 40-mer
frequency histogram (FastK's default `FastK -k40` job) on a synthetic
50X-HiFi-like dataset, end-to-end per batch: 2-bit-packed host->device
transfer, device unpack, canonical k-mer keys, sort, segmented count, device
histogram, histogram to host.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bases/sec", "vs_baseline": N}

vs_baseline is against the reference FastK's published throughput of ~300 GB
input per wall-hour on an 8-core laptop (README.md:252-253) ~= 8.3e7 bases/s
for FASTA input — the reference's own headline number. Values > 1.0 beat it.
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
    from fastk_tpu.ops.pack import pack_stream, unpack_stream

    k = 40
    size = 1 << 26  # 64M positions per step
    total = size + pad_needed(k)

    codes_host = np.full(total, 4, dtype=np.uint8)
    data = synth_hifi(size)
    n = min(len(data), size)
    codes_host[:n] = data[:n]

    packed_host, exc_host = pack_stream(codes_host)

    def run_once():
        """One full batch, host to host: packed H2D, device unpack + count +
        histogram, histogram D2H."""
        packed = jnp.asarray(packed_host)
        exc = jnp.asarray(exc_host)
        codes = unpack_stream(packed, exc, total)
        out = count_batch(codes, k, size, False, True)
        hist = np.asarray(out["hist"])
        overflow = int(out["overflow"])
        return hist, overflow

    hist, _ = run_once()  # warm-up / compile
    assert int(hist[1:].sum()) > 0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))

    value = float(n) / t
    print(json.dumps({
        "metric": "bases/sec/chip: canonical 40-mer histogram, 50X HiFi-like, end-to-end per batch",
        "value": round(value),
        "unit": "bases/sec",
        "vs_baseline": round(value / BASELINE_BASES_PER_SEC, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
