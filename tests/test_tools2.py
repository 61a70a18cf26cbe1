"""Parity tests for symmex, fastmerge, fastcat, kmermap; consistency tests
for vennex/haplex/homex (whose reference implementations are deprecated —
reference Vennex aborts with memory corruption on current glibc)."""

import io
import os
import shutil
from contextlib import redirect_stdout

import numpy as np
import pytest

from fastk_tpu.formats.hist import read_histogram
from fastk_tpu.formats.ktab import KmerTable, read_ktab, write_ktab

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SMALL = os.path.join(GOLDEN, "small_k40", "small")
SMALL2 = os.path.join(GOLDEN, "small2_k40", "small2")
TINY = os.path.join(GOLDEN, "tiny_k12_t1", "tiny")


def test_symmex_matches_oracle(tmp_path):
    from fastk_tpu.tools import symmex

    out = str(tmp_path / "sym")
    rc = symmex.main(["-T1", TINY + ".ktab", out])
    assert rc == 0
    got = read_ktab(out)
    want = read_ktab(os.path.join(GOLDEN, "symmex", "tinysym"))
    assert np.array_equal(got.packed, want.packed)
    assert np.array_equal(got.counts, want.counts)


def test_symmex_tiny_k(tmp_path):
    """k <= 4 tables pack to a single key byte (kb == 1), narrower than
    the pass-1 prefix histogram; the zero-padded fold must handle it
    (advisor r4: IndexError on packed[:, 1])."""
    from fastk_tpu.formats.ktab import write_ktab
    from fastk_tpu.tools import symmex

    packed = np.array([[0b00011011 & 0xFC]], np.uint8)  # "ACG" + pad
    t = KmerTable(3, 1, packed, np.array([7], np.uint16))
    src = str(tmp_path / "tiny3")
    write_ktab(src, t)
    out = str(tmp_path / "sym3")
    assert symmex.main(["-T1", src + ".ktab", out]) == 0
    got = read_ktab(out)
    assert len(got) == 2  # ACG + its RC CGT, both count 7
    assert (got.counts == 7).all()


def _brute_merge(a: KmerTable, b: KmerTable):
    """Independent model: dict-based sum-merge with 32767 clip."""
    d = {}
    for t in (a, b):
        kb = t.packed.shape[1]
        for row, c in zip(t.packed.view(f"S{kb}").ravel(), t.counts):
            d[bytes(row).ljust(kb, b"\0")] = d.get(
                bytes(row).ljust(kb, b"\0"), 0) + int(c)
    keys = sorted(d)
    packed = np.frombuffer(b"".join(keys), np.uint8).reshape(len(keys), -1)
    counts = np.array([min(d[k], 32767) for k in keys], np.uint16)
    return packed, counts


def test_fastmerge_semantics(tmp_path):
    """Sum-merge with clip, against an independent model.

    NOTE: the reference Fastmerge's own output is NOT used as the oracle
    here because it is buggy — its Tabex -C reports 'Out of Order' on its
    own output (the first entry of each thread's region is emitted out of
    place and one key is duplicated with split counts, e.g. golden
    fastmerge/merged.ktab entries 0-2). Our merge produces the repaired
    result the reference intends."""
    from fastk_tpu.tools import fastmerge

    a, b = read_ktab(SMALL), read_ktab(SMALL2)
    out = str(tmp_path / "merged")
    rc = fastmerge.main(["-ht", "-T2", out, SMALL, SMALL2])
    assert rc == 0
    got = read_ktab(out)
    wp, wc = _brute_merge(a, b)
    assert np.array_equal(got.packed, wp)
    assert np.array_equal(got.counts, wc)
    assert got.check_sorted()
    gh = read_histogram(out)
    assert gh.total_instances() == int(wc.astype(np.int64).sum())


def test_fastmerge_slices_and_fastcat(tmp_path):
    """Slices partition the keyspace; fastcat of slices == full merge."""
    from fastk_tpu.tools import fastcat, fastmerge

    full = str(tmp_path / "full")
    fastmerge.main(["-t", "-T1", full, SMALL, SMALL2])
    for n in (1, 2, 3):
        fastmerge.main(["-t", "-T1", f"-S{n}of3", str(tmp_path / f"s{n}"),
                        SMALL, SMALL2])
    sizes = [len(read_ktab(str(tmp_path / f"s{n}"))) for n in (1, 2, 3)]
    assert min(sizes) > 0
    rc = fastcat.main(["-t", str(tmp_path / "whole"),
                       *(str(tmp_path / f"s{n}") for n in (1, 2, 3))])
    assert rc == 0
    got = read_ktab(str(tmp_path / "whole"))
    want = read_ktab(full)
    assert np.array_equal(got.packed, want.packed)
    assert np.array_equal(got.counts, want.counts)
    # destructive by default
    assert not os.path.exists(str(tmp_path / "s1.ktab"))


def test_kmermap_matches_oracle(tmp_path):
    from fastk_tpu.tools import kmermap

    target = os.path.join(GOLDEN, "inputs", "small2.fasta")
    for flag, gold in ((None, "out.small2.kmers.bed"),
                       ("-m", "outm.small2.kmers.merge.bed")):
        out = str(tmp_path / gold.split(".")[0])
        args = ([flag] if flag else []) + [SMALL + ".ktab", target, out]
        rc = kmermap.main(args)
        assert rc == 0
        suffix = "kmers.merge.bed" if flag else "kmers.bed"
        with open(f"{out}.small2.{suffix}") as f:
            got = f.read()
        with open(os.path.join(GOLDEN, "kmermap", gold)) as f:
            want = f.read()
        assert got == want


def test_vennex_consistency(tmp_path, monkeypatch):
    """Region histograms must tile the union: sums of unique counts over the
    three regions equal |A|+|B| - |A∩B| memberships; cross-checked against
    logex results. (The reference Vennex is deprecated and crashes with
    memory corruption, so parity is checked against Logex instead.)"""
    from fastk_tpu.algebra import logex_apply
    from fastk_tpu.tools import vennex

    monkeypatch.chdir(tmp_path)
    rc = vennex.main(["-h1:100", SMALL + ".ktab", SMALL2 + ".ktab"])
    assert rc == 0
    a, b = read_ktab(SMALL), read_ktab(SMALL2)
    regions = {
        "SMALL_small2.hist": "A - B",
        "small_SMALL2.hist": "B - A",
        "SMALL_SMALL2.hist": "A &< B",
    }
    for fname, expr in regions.items():
        h = read_histogram(str(tmp_path / fname))
        (_, t, _), = logex_apply([("x", expr)], [a, b])
        want = np.bincount(np.clip(t.counts.astype(int), 1, 100) - 1,
                           minlength=100)
        assert np.array_equal(h.counts, want), fname


def test_vennex_three_tables(tmp_path, monkeypatch):
    """3-table Venn: 7 region histograms through the streamed engine,
    each cross-checked against the in-memory logex evaluator."""
    from fastk_tpu.algebra import logex_apply
    from fastk_tpu.tools import vennex

    monkeypatch.chdir(tmp_path)
    a, b = read_ktab(SMALL), read_ktab(SMALL2)
    # third table: SMALL thresholded (subset with different counts)
    kb = a.packed.shape[1]
    keep = a.counts >= 3
    c = KmerTable(a.kmer, 1, a.packed[keep], a.counts[keep])
    from fastk_tpu.formats.ktab import write_ktab

    write_ktab(str(tmp_path / "tc"), c)
    rc = vennex.main(["-h1:60", SMALL + ".ktab", SMALL2 + ".ktab",
                      str(tmp_path / "tc.ktab")])
    assert rc == 0
    regions = {
        "SMALL_small2_tc.hist": "A-B-C",
        "SMALL_SMALL2_tc.hist": "(A&<B)-C",
        "SMALL_SMALL2_TC.hist": "A&<B&<C",
        "small_small2_TC.hist": "C-A-B",
    }
    for fname, expr in regions.items():
        h = read_histogram(str(tmp_path / fname))
        (_, t, _), = logex_apply([("x", expr)], [a, b, c])
        want = np.bincount(np.clip(t.counts.astype(int), 1, 60) - 1,
                           minlength=60)
        assert np.array_equal(h.counts, want), fname


def test_haplex_finds_snp_pair(tmp_path):
    from fastk_tpu.formats.ktab import pack_kmer
    from fastk_tpu.tools import haplex

    k = 13
    mid = k // 2
    base = "acgtacgtacgta"
    v1 = base[:mid] + "a" + base[mid + 1:]
    v2 = base[:mid] + "g" + base[mid + 1:]
    lone = "ttttttttttttt"
    kmers = sorted([v1, v2, lone])
    packed = np.stack([pack_kmer(s) for s in kmers])
    t = KmerTable(k, 1, packed, np.array([10, 12, 5], dtype=np.uint16))
    write_ktab(str(tmp_path / "t"), t)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = haplex.main(["-g5:50", str(tmp_path / "t.ktab")])
    assert rc == 0
    out = buf.getvalue()
    assert v1[:mid] + "A" + v1[mid + 1:] in out
    assert v2[:mid] + "G" + v2[mid + 1:] in out
    assert "T" * k not in out and lone not in out


def test_homex_matches_golden(tmp_path):
    """Byte-identical to the oracle's Homex report on the golden table
    (frozen in golden/homex; the live oracle differential incl. real
    homopolymer-error data is in test_oracle_interop.py)."""
    from fastk_tpu.tools import homex

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = homex.main(["-e3", "-g5:100", SMALL + ".ktab"])
    assert rc == 0
    with open(os.path.join(GOLDEN, "homex", "small_e3_g5_100.txt")) as f:
        want = f.read()
    assert buf.getvalue() == want

    # slab seams at khalf-prefix block boundaries must not change output
    from fastk_tpu.tools import homex as hx
    old_slab, hx.SLAB = hx.SLAB, 1000
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            assert hx.main(["-e3", "-g5:100", SMALL + ".ktab"]) == 0
        assert buf.getvalue() == want
    finally:
        hx.SLAB = old_slab
