"""Brute-force parity across the full supported k range (the reference
supports k from 5 up to ~128, README.md:239); exercises every word-boundary
case of the W=ceil(k/16) key packing."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from util_bruteforce import count_kmers

from fastk_tpu.formats.hist import HIST_HIGH
from fastk_tpu.pipeline.count import count_reads


def _reads(seed, n=40, length=200):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        r = "".join("acgt"[c] for c in rng.integers(0, 4, size=length))
        if rng.random() < 0.3:  # sprinkle invalid
            i = int(rng.integers(0, length))
            r = r[:i] + "N" + r[i + 1:]
        out.append(r.encode())
    # force duplicate coverage so counts exceed 1
    out.extend(out[:10])
    return out


@pytest.mark.parametrize("k", [5, 16, 17, 31, 32, 33, 63, 64, 65, 128,
                               # beyond the reference's ~128 ceiling
                               # (README.md:239) — ours keeps going
                               129, 160, 256])
def test_counts_match_bruteforce(k):
    reads = _reads(k, length=max(200, k + 60))
    out = count_reads(reads, k, table_min=1)
    want = count_kmers([r.decode() for r in reads], k)
    counts = np.array(sorted(want.values()), dtype=np.int64)
    bins = np.bincount(np.clip(counts, 0, HIST_HIGH),
                       minlength=HIST_HIGH + 1)[1:]
    assert np.array_equal(np.asarray(out.hist.as_unique().counts), bins)
    assert len(out.table) == len(want)
    # spot-check the table's keys + counts against the model
    items = sorted(want.items())
    for i in [0, len(items) // 2, len(items) - 1]:
        km, c = items[i]
        j = out.table.find(km)
        assert j is not None
        assert out.table.fetch_count(j) == min(c, HIST_HIGH)


def test_cli_k_beyond_reference(tmp_path):
    """Full CLI at k=135 (-t -p): outputs load through the library and the
    display tools; the reference cannot run at this k at all."""
    from fastk_tpu.formats.hist import read_histogram
    from fastk_tpu.formats.ktab import read_ktab
    from fastk_tpu.formats.prof import read_profiles
    from fastk_tpu.tools import fastk
    from fastk_tpu.tools import tabex

    reads = [r.decode() for r in _reads(7, n=20, length=300)]
    src = str(tmp_path / "in.fasta")
    with open(src, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    base = str(tmp_path / "out")
    assert fastk.main(["-k135", "-t1", "-p", f"-P{tmp_path}", src,
                       f"-N{base}"]) == 0

    want = count_kmers(reads, 135)
    h = read_histogram(base)
    assert int(np.asarray(h.as_unique().counts).sum()) == len(want)
    t = read_ktab(base)
    assert t.kmer == 135 and len(t.counts) == len(want)
    profs = read_profiles(base)
    assert len(profs) == len(reads)
    for r, p in zip(reads, profs):
        assert len(p) == len(r) - 135 + 1
    assert tabex.main(["-t1", base + ".ktab", "0-3"]) == 0
