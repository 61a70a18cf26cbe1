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


@pytest.mark.parametrize("k", [5, 16, 17, 31, 32, 33, 63, 64, 65, 128])
def test_counts_match_bruteforce(k):
    reads = _reads(k)
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
