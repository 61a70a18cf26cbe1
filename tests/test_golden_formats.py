"""Validate the format codecs against oracle-produced golden files.

Goldens were produced by the reference FastK (see tests/make_golden.sh) on the
seeded inputs in tests/golden/inputs/. A brute-force Python counter provides
the semantic model; these tests close the triangle:

    brute-force model  ==  oracle files (parsed with our readers)
    our writers(model) ==  oracle bytes (where the format is writer-invariant)
"""

import os

import numpy as np
import pytest

import sys

sys.path.insert(0, os.path.dirname(__file__))
from util_bruteforce import count_kmers, parse_reads, profiles_of, sorted_table

from fastk_tpu.formats import hist as H
from fastk_tpu.formats import ktab as K
from fastk_tpu.formats import prof as P

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

CASES = [
    # (dir, input, k, minval, hc, has_prof)
    ("tiny_k12_t1", "tiny.fasta", 12, 1, False, True),
    ("tiny_k12_t2", "tiny.fasta", 12, 1, False, False),
    ("small_k40", "small.fasta", 40, 1, False, True),
    ("small_k40_t3", "small.fasta", 40, 3, False, False),
    ("smallq_k32", "smallq.fastq", 32, 1, False, True),
    ("small_k40_c", "small.fasta", 40, 1, True, True),
]


def _base(case):
    d, inp, *_ = case
    return os.path.join(GOLDEN, d, inp.split(".")[0])


def _model(case):
    d, inp, k, minval, hc, _ = case
    reads = parse_reads(os.path.join(GOLDEN, "inputs", inp))
    table = count_kmers(reads, k, hc=hc)
    return reads, table


@pytest.fixture(scope="module", params=CASES, ids=[c[0] for c in CASES])
def case(request):
    return request.param


def test_hist_matches_model(case):
    d, inp, k, minval, hc, _ = case
    _, table = _model(case)
    got = H.read_histogram(_base(case))
    counts = np.array(list(table.values()))
    overflow = int(np.maximum(counts - 32767, 0).sum())
    want = H.Histogram.from_clipped_counts(k, np.minimum(counts, 32767), overflow)
    assert got.kmer == k and got.low == 1 and got.high == 0x7FFF
    assert got == want


def test_hist_writer_byte_identical(case, tmp_path):
    got = H.read_histogram(_base(case))
    out = str(tmp_path / "re")
    H.write_histogram(out, got)
    with open(out + ".hist", "rb") as f:
        mine = f.read()
    with open(_base(case) + ".hist", "rb") as f:
        ref = f.read()
    assert mine == ref


def test_ktab_matches_model(case):
    d, inp, k, minval, hc, _ = case
    _, table = _model(case)
    kmers, counts = sorted_table(table, minval)
    t = K.read_ktab(_base(case))
    assert t.kmer == k and t.minval == minval
    assert len(t) == len(kmers)
    assert t.check_sorted()
    # spot-check + full check via packed comparison
    want = K.pack_codes(
        np.array([[K._CODE[ord(c)] for c in s] for s in kmers], dtype=np.uint8)
    ) if kmers else np.zeros((0, K.kbytes(k)), np.uint8)
    assert np.array_equal(t.packed, want)
    assert np.array_equal(t.counts, np.array(counts, dtype=np.uint16))


def test_ktab_stub_index_matches(case, tmp_path):
    """Rewriting the same entries must reproduce the oracle's stub index
    (the IDX array depends only on the data and prefix-byte width)."""
    t = K.read_ktab(_base(case))
    kmer, nparts, minval, ibyte, pindex = K._read_stub(_base(case))
    out = str(tmp_path / "re")
    K.write_ktab(out, t, nparts=nparts, ibyte=ibyte)
    _, _, _, ibyte2, pindex2 = K._read_stub(out)
    assert ibyte2 == ibyte
    assert np.array_equal(pindex2, pindex)
    # and entry streams agree
    t2 = K.read_ktab(out)
    assert np.array_equal(t2.packed, t.packed)
    assert np.array_equal(t2.counts, t.counts)


def test_ktab_ibyte_rule(case):
    t = K.read_ktab(_base(case))
    _, _, _, ibyte, _ = K._read_stub(_base(case))
    assert K.idx_bytes_for(len(t), t.kmer) == ibyte


def test_profiles_match_model(case):
    d, inp, k, minval, hc, has_prof = case
    if not has_prof:
        pytest.skip("no -p in this golden")
    reads, table = _model(case)
    want = profiles_of(reads, k, table, hc=hc)
    pi = P.ProfileIndex(_base(case))
    assert pi.kmer == k
    assert pi.nreads == len(reads)
    for i, w in enumerate(want):
        got = pi.fetch(i)
        assert np.array_equal(got, w), f"profile mismatch at read {i}"


def test_profile_reencode_canonical(case):
    """Our encoder is the spec-canonical (greedy) encoding: decoding must
    round-trip, and it is never larger than the oracle's bytes.

    The oracle's own bytes are NOT canonical: merge.c:394-733 splices
    per-super-mer fragments, so its zero runs can be split at fragment
    junctions instead of chunked greedily (e.g. 19 zeros as 13+6). Decoded
    counts are identical, and the reference Profex decodes our encoding
    byte-for-byte the same (validated out-of-band in tests/make_golden.sh
    runs; see also test_formats.py's scalar decoder cross-check).
    """
    d, inp, k, minval, hc, has_prof = case
    if not has_prof:
        pytest.skip("no -p in this golden")
    pi = P.ProfileIndex(_base(case))
    for p in range(pi.nparts):
        ref = pi._part_data(p)
        base = 0 if p == 0 else pi.nbase[p - 1]
        blobs = []
        for rid in range(base, pi.nbase[p]):
            prof = pi.fetch(rid)
            enc = P.encode_profile(prof)
            assert np.array_equal(P.decode_profile(enc), prof)
            blobs.append(enc)
        mine = b"".join(blobs)
        assert len(mine) <= len(ref), f"part {p+1}: non-canonical encoding"
