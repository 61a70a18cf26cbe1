"""The from-scratch CRAM 3.0 decoder vs CRAMs written by the oracle's
vendored htslib (compiled at test time; skipped when the oracle tree is
absent). Covers ref-based records with substitutions/indels/clips,
unmapped records, secondary filtering, external-ref / embedded-ref /
no-ref modes, and multi-slice containers."""

import os
import subprocess

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
ORACLE_HTS = "/tmp/fastk_oracle/HTSLIB"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ORACLE_HTS, "libhts.a")),
    reason="oracle htslib not built (run tests/make_golden.sh)")


@pytest.fixture(scope="module")
def make_cram(tmp_path_factory):
    d = tmp_path_factory.mktemp("cramtool")
    exe = str(d / "make_cram")
    r = subprocess.run(
        ["cc", "-O2", "-I", ORACLE_HTS, os.path.join(HERE, "make_cram.c"),
         os.path.join(ORACLE_HTS, "libhts.a"), "-lz", "-lm", "-lpthread",
         "-o", exe], capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"cannot build make_cram: {r.stderr[:300]}")
    return exe


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """A reference genome + SAM with mismatches, indels, clips, unmapped
    and secondary records."""
    rng = np.random.default_rng(11)
    d = tmp_path_factory.mktemp("cram")
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, 800))
    ref = str(d / "ref.fa")
    with open(ref, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(genome), 60):
            f.write(genome[i: i + 60] + "\n")

    recs = []  # (name, flag, pos(1-based), cigar, seq)
    expected = []  # primary SEQs in order
    for i in range(25):
        pos = int(rng.integers(1, len(genome) - 120))
        read = list(genome[pos - 1: pos - 1 + 100])
        cigar = "100M"
        kind = i % 5
        if kind == 1:  # substitutions
            for j in (10, 55, 90):
                read[j] = "ACGT"[(("ACGT".index(read[j])) + 1) % 4]
        elif kind == 2:  # insertion
            read = read[:40] + ["T", "T", "A"] + read[40:97]
            cigar = "40M3I57M"
        elif kind == 3:  # deletion
            read = read[:30] + list(genome[pos - 1 + 35: pos - 1 + 105])
            cigar = "30M5D70M"
        elif kind == 4:  # soft clip + mismatch
            read = ["G", "G", "C", "C"] + read[:96]
            read[50] = "ACGT"[("ACGT".index(read[50]) + 2) % 4]
            cigar = "4S96M"
        seq = "".join(read)
        recs.append((f"r{i}", 0, pos, cigar, seq))
        expected.append(seq)
    # unmapped records
    for i in range(5):
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 80))
        recs.append((f"u{i}", 4, 0, "*", seq))
        expected.append(seq)
    # a secondary record (flag 0x100) that must be SKIPPED
    recs.append(("sec", 0x100, 5, "50M", genome[4:54]))

    sam = str(d / "in.sam")
    with open(sam, "w") as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n")
        f.write(f"@SQ\tSN:chr1\tLN:{len(genome)}\n")
        for name, flag, pos, cigar, seq in recs:
            rname = "chr1" if not flag & 4 else "*"
            p = pos if not flag & 4 else 0
            f.write(f"{name}\t{flag}\t{rname}\t{p}\t60\t{cigar}\t*\t0\t0"
                    f"\t{seq}\t*\n")
    return d, ref, sam, expected


@pytest.mark.parametrize("mode", [[], ["embed_ref"], ["no_ref"],
                                  ["small_slices"],
                                  # CRAM 2.x: ITF8 counters, no CRCs, no
                                  # rANS; 2.0 additionally ends without an
                                  # EOF container
                                  ["v20"], ["v21"], ["v21", "embed_ref"],
                                  ["v21", "small_slices"]])
def test_cram_native_decode(world, make_cram, tmp_path, monkeypatch, mode):
    from fastk_tpu.io.cram_native import iter_cram_reads_native

    d, ref, sam, expected = world
    cram = str(tmp_path / ("out_" + ("_".join(mode) or "ref") + ".cram"))
    r = subprocess.run([make_cram, sam, cram, ref, *mode],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    monkeypatch.setenv("FASTK_TPU_CRAM_REF", ref)
    got = [s.decode() for s in iter_cram_reads_native(cram)]
    assert got == expected


def test_rans_native_matches_python(world, make_cram, tmp_path, monkeypatch):
    """The C rANS-4x8 decoder and the pure-Python one produce identical
    bytes on every rANS block of an htslib-written CRAM (the differential
    runs at the rans_uncompress seam: same payloads, both paths)."""
    import fastk_tpu.io.cram_native as cn
    from fastk_tpu import native

    if native.load() is None:
        pytest.skip("native library unavailable")

    d, ref, sam, expected = world
    cram = str(tmp_path / "diff.cram")
    r = subprocess.run([make_cram, sam, cram, ref], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr

    seen = []
    orig = cn.rans_uncompress

    def both_ways(data, raw_size):
        got = orig(data, raw_size)  # native path (lib is loaded)
        real = native.rans_decode
        native.rans_decode = lambda *a: None
        try:
            pure = orig(data, raw_size)
        finally:
            native.rans_decode = real
        assert pure == got
        seen.append(len(data))
        return got

    monkeypatch.setattr(cn, "rans_uncompress", both_ways)
    monkeypatch.setenv("FASTK_TPU_CRAM_REF", ref)
    got = [s.decode() for s in cn.iter_cram_reads_native(cram)]
    assert got == expected
    assert seen, "CRAM 3.0 fixture produced no rANS blocks"


def test_cram_header_container_short_length(world, make_cram, tmp_path,
                                            monkeypatch):
    """htslib's writer computes the SAM-header container's length BEFORE
    padding grows the block's ITF8 size fields (cram_io.c:4257-4265), so
    when the pre-pad block is <124 bytes the declared length is 2 bytes
    SHORT of the actual data. htslib embeds the reference path in @SQ UR:,
    so whether the stock fixtures hit this depends on the pytest tmpdir
    path length — force it with a short ref path."""
    import shutil
    import tempfile

    d, ref, sam, expected = world
    short = tempfile.mkdtemp(prefix="fkc", dir="/tmp")
    try:
        sref = os.path.join(short, "r.fa")
        shutil.copy(ref, sref)
        for vers in ("v20", "v21"):
            cram = str(tmp_path / f"short_{vers}.cram")
            r = subprocess.run([make_cram, sam, cram, sref, vers],
                               capture_output=True, text=True)
            assert r.returncode == 0, r.stderr
            monkeypatch.setenv("FASTK_TPU_CRAM_REF", sref)
            from fastk_tpu.io.cram_native import iter_cram_reads_native
            got = [s.decode() for s in iter_cram_reads_native(cram)]
            assert got == expected
    finally:
        shutil.rmtree(short, ignore_errors=True)


def test_cram_through_reader(world, make_cram, tmp_path, monkeypatch):
    """detect_format + iter_reads route .cram through the native decoder."""
    from fastk_tpu.io.reader import iter_reads

    d, ref, sam, expected = world
    cram = str(tmp_path / "in.cram")
    r = subprocess.run([make_cram, sam, cram, ref], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    monkeypatch.setenv("FASTK_TPU_CRAM_REF", ref)
    monkeypatch.delenv("LIBHTS", raising=False)
    got = [s.decode() for s in iter_reads(cram)]
    assert got == expected


def test_cram_counting_pipeline(world, make_cram, tmp_path, monkeypatch):
    """fastk on a .cram equals fastk on the equivalent FASTA."""
    from fastk_tpu.pipeline.count import count_files

    d, ref, sam, expected = world
    cram = str(tmp_path / "in.cram")
    r = subprocess.run([make_cram, sam, cram, ref], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    fa = str(tmp_path / "same.fasta")
    with open(fa, "w") as f:
        for i, s in enumerate(expected):
            f.write(f">r{i}\n{s}\n")
    monkeypatch.setenv("FASTK_TPU_CRAM_REF", ref)
    a = count_files([cram], 21, table_min=1)
    b = count_files([fa], 21, table_min=1)
    assert a.hist == b.hist
    assert np.array_equal(a.table.packed, b.table.packed)


@pytest.mark.parametrize("mode", [[], ["embed_ref"], ["no_ref"]],
                         ids=["ext_ref", "embed_ref", "no_ref"])
def test_cram_c_slice_decoder_matches_python(world, make_cram, tmp_path,
                                             monkeypatch, mode):
    """The C slice record walk (fk_cram_slice via scan_cram_pieces) equals
    the Python decoder on every slice — incl. multi-ref slices with mapped
    records (per-record contig table) — and never falls back on
    htslib-written files in any reference mode."""
    from fastk_tpu import native

    if native.load() is None:
        pytest.skip("no native library")
    import fastk_tpu.io.cram_native as cn
    from fastk_tpu.io.reader import pack_reads

    d, ref, sam, expected = world
    cram = str(tmp_path / ("c_" + ("_".join(mode) or "ref") + ".cram"))
    r = subprocess.run([make_cram, sam, cram, ref, *mode],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    monkeypatch.setenv("FASTK_TPU_CRAM_REF", ref)

    stats = {"native": 0, "fallback": 0}
    orig = cn._native_slice_piece

    def spy(*a, **k):
        res = orig(*a, **k)
        stats["native" if res is not None else "fallback"] += 1
        return res

    monkeypatch.setattr(cn, "_native_slice_piece", spy)
    pieces = list(cn.scan_cram_pieces(cram))
    want = pack_reads(list(cn.iter_cram_reads_native(cram)))
    codes = np.concatenate([p[0] for p in pieces])
    rlen = np.concatenate([p[2] for p in pieces])
    assert np.array_equal(want.rlen, rlen)
    assert np.array_equal(want.codes, codes)
    assert stats["fallback"] == 0, stats
    assert stats["native"] > 0


def test_cram_c_slice_decoder_hc_bc(world, make_cram, tmp_path, monkeypatch):
    """hc/bc apply inside the C walk exactly as pack_reads applies them."""
    from fastk_tpu import native

    if native.load() is None:
        pytest.skip("no native library")
    import fastk_tpu.io.cram_native as cn
    from fastk_tpu.io.reader import pack_reads

    d, ref, sam, expected = world
    cram = str(tmp_path / "hcbc.cram")
    r = subprocess.run([make_cram, sam, cram, ref], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    monkeypatch.setenv("FASTK_TPU_CRAM_REF", ref)
    for hc, bc in ((True, 0), (False, 3), (True, 2)):
        pieces = list(cn.scan_cram_pieces(cram, hc=hc, bc=bc))
        want = pack_reads(list(cn.iter_cram_reads_native(cram)),
                          hc=hc, bc=bc)
        assert np.array_equal(want.codes,
                              np.concatenate([p[0] for p in pieces]))
        assert np.array_equal(want.rlen,
                              np.concatenate([p[2] for p in pieces]))
