"""Seeded fuzz: random k / read shapes / N placement / case mixing vs the
brute-force model, through the full pipeline (hist + table + profiles)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from util_bruteforce import count_kmers, profiles_of

from fastk_tpu.pipeline.count import count_reads


def _random_case(rng):
    k = int(rng.integers(5, 48))
    nreads = int(rng.integers(1, 25))
    reads = []
    for _ in range(nreads):
        n = int(rng.integers(1, 160))
        chars = []
        for c in rng.integers(0, 4, size=n):
            ch = "acgt"[c]
            if rng.random() < 0.3:
                ch = ch.upper()
            if rng.random() < 0.03:
                ch = "N" if rng.random() < 0.5 else "n"
            chars.append(ch)
        reads.append("".join(chars))
    if rng.random() < 0.3:  # duplicate some reads for counts > 1
        reads = reads + reads[: nreads // 2 + 1]
    return k, reads


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_pipeline(seed):
    rng = np.random.default_rng(1000 + seed)
    k, reads = _random_case(rng)
    out = count_reads([r.encode() for r in reads], k, table_min=1,
                      profiles=True, batch_bases=int(rng.integers(64, 4000)))

    want = count_kmers(reads, k)
    assert len(out.table) == len(want)
    total = int(out.hist.total_instances()) if len(want) else 0
    assert total == sum(want.values())
    refs = profiles_of(reads, k, want)
    for i, ref in enumerate(refs):
        got = np.asarray(out.profiles[i])
        assert np.array_equal(got, ref), f"seed {seed} read {i} (k={k})"


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_homopolymer(seed):
    rng = np.random.default_rng(2000 + seed)
    k, reads = _random_case(rng)
    k = min(k, 21)
    out = count_reads([r.encode() for r in reads], k, table_min=1,
                      profiles=True, hc=True)
    want = count_kmers(reads, k, hc=True)
    assert len(out.table) == len(want)
    refs = profiles_of(reads, k, want, hc=True)
    for i, ref in enumerate(refs):
        assert np.array_equal(np.asarray(out.profiles[i]), ref), \
            f"seed {seed} read {i} (k={k})"


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_three_pipelines_agree(seed, tmp_path):
    """in-core == out-of-core == multi-chip on the same random input."""
    from fastk_tpu.parallel.dist import make_mesh
    from fastk_tpu.parallel.host import count_files_sharded
    from fastk_tpu.pipeline.count import count_files
    from fastk_tpu.pipeline.outofcore import count_files_ooc

    rng = np.random.default_rng(3000 + seed)
    k, reads = _random_case(rng)
    p = str(tmp_path / "in.fasta")
    with open(p, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    bb = int(rng.integers(200, 3000))

    a = count_files([p], k, table_min=1, batch_bases=bb)
    b = count_files_ooc([p], k, parts=int(rng.integers(2, 5)),
                        sort_path=str(tmp_path), table_min=1, batch_bases=bb)
    c = count_files_sharded([p], k, make_mesh(int(rng.integers(2, 5))),
                            table_min=1, batch_bases=bb)
    assert a.hist == b.hist == c.hist
    for other in (b, c):
        assert np.array_equal(a.table.packed, other.table.packed)
        assert np.array_equal(a.table.counts, other.table.counts)
