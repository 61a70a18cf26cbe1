"""Deterministic test-data generator for golden fixtures.

Generates small shotgun-like datasets: a random genome, reads sampled from it
at a given coverage (half reverse-complemented), with occasional N bases and
mixed case. Seeded, so fixtures are reproducible.
"""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"acgt", dtype=np.uint8)


def make_genome(rng: np.random.Generator, length: int) -> np.ndarray:
    return rng.integers(0, 4, size=length, dtype=np.uint8)


def sample_reads(
    rng: np.random.Generator,
    genome: np.ndarray,
    coverage: float,
    read_len: int,
    n_rate: float = 0.0,
    upper_rate: float = 0.0,
    err_rate: float = 0.0,
):
    """Return a list of read byte-strings sampled from the genome."""
    g = len(genome)
    nreads = max(1, int(coverage * g / read_len))
    reads = []
    for _ in range(nreads):
        start = int(rng.integers(0, max(1, g - read_len)))
        codes = genome[start: start + read_len].copy()
        if err_rate > 0:
            errs = rng.random(len(codes)) < err_rate
            codes[errs] = (codes[errs] + rng.integers(1, 4, size=int(errs.sum()))) % 4
        if rng.random() < 0.5:  # reverse complement
            codes = (3 - codes)[::-1]
        seq = BASES[codes]
        if upper_rate > 0:
            up = rng.random(len(seq)) < upper_rate
            seq = np.where(up, seq - 32, seq).astype(np.uint8)
        if n_rate > 0 and rng.random() < n_rate:
            # an N-run somewhere in the read
            p = int(rng.integers(0, len(seq) - 5))
            ln = int(rng.integers(1, 6))
            seq[p: p + ln] = ord("N")
        reads.append(seq.tobytes())
    return reads


def write_fasta(path: str, reads, width: int = 80) -> None:
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i}\n")
            s = r.decode()
            for j in range(0, len(s), width):
                f.write(s[j: j + width] + "\n")


def write_fastq(path: str, reads) -> None:
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            s = r.decode()
            f.write(f"@read{i}\n{s}\n+\n{'I' * len(s)}\n")


def make_case(name: str, outdir: str) -> None:
    import os

    os.makedirs(outdir, exist_ok=True)
    if name == "tiny":
        rng = np.random.default_rng(42)
        genome = make_genome(rng, 2_000)
        reads = sample_reads(rng, genome, coverage=4, read_len=150,
                             n_rate=0.3, upper_rate=0.1)
        # one read shorter than typical k, one exactly k-length
        reads.append(b"acgtacgtacg")   # len 11 < k=12
        reads.append(b"acgtacgtacgt")  # len 12 == k
        write_fasta(os.path.join(outdir, "tiny.fasta"), reads)
    elif name == "small":
        rng = np.random.default_rng(7)
        genome = make_genome(rng, 10_000)
        reads = sample_reads(rng, genome, coverage=50, read_len=500,
                             n_rate=0.1, upper_rate=0.05, err_rate=0.002)
        write_fasta(os.path.join(outdir, "small.fasta"), reads)
    elif name == "smallq":
        rng = np.random.default_rng(9)
        genome = make_genome(rng, 8_000)
        reads = sample_reads(rng, genome, coverage=20, read_len=300,
                             n_rate=0.05, err_rate=0.001)
        write_fastq(os.path.join(outdir, "smallq.fastq"), reads)
    else:
        raise ValueError(name)


if __name__ == "__main__":
    import sys

    make_case(sys.argv[1], sys.argv[2])
