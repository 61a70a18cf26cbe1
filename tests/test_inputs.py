"""Input-format readers: SAM, BAM, Dazzler DB (reference: io.c parsers)."""

import gzip
import os
import struct

import numpy as np
import pytest

from fastk_tpu.io.reader import iter_reads


READS = [b"ACGTACGTACGGTTTACACGT", b"TTGACCAGATTACACAGGATT",
         b"CCCGTGTGTTTACGATCAGGA"]


def _write_sam(path, reads):
    with open(path, "w") as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n")
        f.write("@SQ\tSN:chr1\tLN:1000\n")
        for i, r in enumerate(reads):
            s = r.decode()
            f.write(f"r{i}\t4\t*\t0\t0\t*\t*\t0\t0\t{s}\t*\n")
        # secondary + supplementary records must be skipped
        f.write(f"r9\t{0x100 | 4}\t*\t0\t0\t*\t*\t0\t0\tAAAA\t*\n")
        f.write(f"r9\t{0x800 | 4}\t*\t0\t0\t*\t*\t0\t0\tCCCC\t*\n")


_NIBBLE = {c: i for i, c in enumerate(b"=ACMGRSVTWYHKDBN")}


def _bam_record(name: bytes, flag: int, seq: bytes) -> bytes:
    nib = [_NIBBLE[c] for c in seq]
    if len(nib) % 2:
        nib.append(0)
    packed = bytes((nib[i] << 4) | nib[i + 1] for i in range(0, len(nib), 2))
    qual = b"\xff" * len(seq)
    body = struct.pack(
        "<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 4680, 0, flag,
        len(seq), -1, -1, 0) + name + b"\x00" + packed + qual
    return struct.pack("<i", len(body)) + body


def _write_bam(path, reads):
    hdr_text = b"@HD\tVN:1.6\n"
    out = b"BAM\x01" + struct.pack("<i", len(hdr_text)) + hdr_text
    out += struct.pack("<i", 1)  # one reference
    out += struct.pack("<i", 5) + b"chr1\x00" + struct.pack("<i", 1000)
    for i, r in enumerate(reads):
        out += _bam_record(b"r%d" % i, 4, r)
    out += _bam_record(b"sec", 0x104, b"AAAA")
    with gzip.open(path, "wb") as f:
        f.write(out)


def _write_dazz(dirpath, reads, cutoff=0, all_=1, best_mask=None):
    """Synthesize root.db + .root.idx + .root.bps."""
    stub = os.path.join(dirpath, "root.db")
    with open(stub, "w") as f:
        f.write("files =         1\n")
        f.write(f"  {len(reads):9d} reads root\n")
        f.write("blocks =         1\n")
        f.write(f"size =         200 cutoff = {cutoff:9d} all = {all_:1d}\n")
        f.write("         0         %d\n" % len(reads))

    code = {97: 0, 99: 1, 103: 2, 116: 3}
    bps = bytearray()
    boffs = []
    for r in reads:
        boffs.append(len(bps))
        cs = [code[c] for c in r.lower()]
        while len(cs) % 4:
            cs.append(0)
        for i in range(0, len(cs), 4):
            bps.append((cs[i] << 6) | (cs[i + 1] << 4)
                       | (cs[i + 2] << 2) | cs[i + 3])
    with open(os.path.join(dirpath, ".root.bps"), "wb") as f:
        f.write(bytes(bps))

    hdr = bytearray(112)
    struct.pack_into("<i", hdr, 0, len(reads))
    idx = bytearray(hdr)
    for j, r in enumerate(reads):
        rec = bytearray(40)
        struct.pack_into("<i", rec, 4, len(r))
        struct.pack_into("<q", rec, 16, boffs[j])
        flags = 0x0800 if (best_mask is None or best_mask[j]) else 0
        struct.pack_into("<i", rec, 32, flags)
        idx += rec
    with open(os.path.join(dirpath, ".root.idx"), "wb") as f:
        f.write(bytes(idx))
    return stub


def test_sam_reader(tmp_path):
    p = str(tmp_path / "in.sam")
    _write_sam(p, READS)
    # SAM SEQ normalizes through IUPAC_2_DNA (io.c:1477): lowercase bases
    assert list(iter_reads(p)) == [r.lower() for r in READS]


def test_sam_gz_reader(tmp_path):
    p = str(tmp_path / "in.sam.gz")
    raw = str(tmp_path / "in.sam")
    _write_sam(raw, READS)
    with open(raw, "rb") as f, gzip.open(p, "wb") as g:
        g.write(f.read())
    assert list(iter_reads(p)) == [r.lower() for r in READS]


def test_sam_iupac_maps_to_bases(tmp_path):
    """SAM ambiguity codes map to concrete bases via the reference's
    IUPAC_2_DNA table (io.c:1398-1477) — 'N' is a VALID 'a' in SAM (unlike
    FASTA/BAM, where it breaks k-mer windows)."""
    p = str(tmp_path / "iupac.sam")
    _write_sam(p, [b"ANRYSWKMBDHVU123Gt"])
    (got,) = list(iter_reads(p))
    assert got == b"aaaccagacaaaacgtgt"


def test_bam_reader(tmp_path):
    p = str(tmp_path / "in.bam")
    _write_bam(p, READS)
    assert list(iter_reads(p)) == READS


def test_bam_ambiguity_codes_invalid(tmp_path):
    p = str(tmp_path / "amb.bam")
    _write_bam(p, [b"ACGTNACGT"])
    (got,) = list(iter_reads(p))
    assert got == b"ACGTNACGT"  # N preserved; codes as invalid downstream


def test_dazz_reader(tmp_path):
    stub = _write_dazz(str(tmp_path), READS)
    got = list(iter_reads(stub))
    assert got == [r.lower() for r in READS]


def test_dazz_trimming(tmp_path):
    reads = [b"ACGTACGTACGT", b"ACG", b"TTTTGGGGCCCC"]
    stub = _write_dazz(str(tmp_path), reads, cutoff=4, all_=0,
                       best_mask=[True, True, False])
    got = list(iter_reads(stub))
    # read 1 trimmed by cutoff, read 2 trimmed as non-best
    assert got == [reads[0].lower()]


def test_sam_counts_match_fasta(tmp_path):
    from fastk_tpu.pipeline.count import count_files

    sam = str(tmp_path / "in.sam")
    _write_sam(sam, READS)
    fa = str(tmp_path / "in.fasta")
    with open(fa, "w") as f:
        for i, r in enumerate(READS):
            f.write(f">r{i}\n{r.decode()}\n")
    a = count_files([sam], 8)
    b = count_files([fa], 8)
    assert a.hist == b.hist


def test_cram_junk_rejected(tmp_path):
    """A truncated CRAM fails cleanly in the native decoder (real decode
    coverage lives in test_cram.py against oracle-written files)."""
    from fastk_tpu.io.cram_native import CramError

    p = str(tmp_path / "in.cram")
    with open(p, "wb") as f:
        f.write(b"CRAM\x03\x00")
    with pytest.raises((CramError, NotImplementedError, OSError)):
        list(iter_reads(p))

    with open(p, "wb") as f:
        f.write(b"NOPE")
    with pytest.raises((CramError, NotImplementedError, OSError)):
        list(iter_reads(p))


def test_htslib_cram(tmp_path):
    """CRAM via the optional ctypes htslib binding (set LIBHTS to run)."""
    from fastk_tpu.io import htslib

    if htslib.load() is None:
        pytest.skip("no usable libhts (set LIBHTS)")
    cram = "/tmp/fastk_oracle/HTSLIB/test/ce#5b_java.cram"
    ref = "/tmp/fastk_oracle/HTSLIB/test/ce.fa"
    if not os.path.exists(cram):
        pytest.skip("htslib test data not present")
    reads = list(htslib.iter_hts_reads(cram, ref=ref))
    assert len(reads) == 6 and all(len(r) == 100 for r in reads)


def test_htslib_bam_matches_native(tmp_path):
    """htslib BAM decode agrees with our own BGZF/BAM reader."""
    from fastk_tpu.io import htslib

    if htslib.load() is None:
        pytest.skip("no usable libhts (set LIBHTS)")
    p = str(tmp_path / "x.bam")
    _write_bam(p, READS)
    assert list(htslib.iter_hts_reads(p)) == READS


def test_crlf_line_endings(tmp_path):
    """CRLF (Windows) FASTA/FASTQ parse identically to their LF versions,
    through both the native scanner and the Python fallback. DELIBERATE
    divergence from the reference: its fast automaton treats '\r' as an
    invalid base (io.c translation table), silently breaking every k-mer
    that spans a line ending; we strip it."""
    fa_lf = str(tmp_path / "a.fasta")
    fa_crlf = str(tmp_path / "b.fasta")
    with open(fa_lf, "wb") as f, open(fa_crlf, "wb") as g:
        for i, r in enumerate(READS):
            f.write(b">r%d\n%s\n%s\n" % (i, r[:11], r[11:]))
            g.write(b">r%d desc\r\n%s\r\n%s\r\n" % (i, r[:11], r[11:]))
    fq_lf = str(tmp_path / "a.fastq")
    fq_crlf = str(tmp_path / "b.fastq")
    with open(fq_lf, "wb") as f, open(fq_crlf, "wb") as g:
        for i, r in enumerate(READS):
            q = b"I" * len(r)
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, r, q))
            g.write(b"@r%d\r\n%s\r\n+\r\n%s\r\n" % (i, r, q))
    for lf, crlf in ((fa_lf, fa_crlf), (fq_lf, fq_crlf)):
        assert list(iter_reads(crlf)) == list(iter_reads(lf)) == READS, lf


def test_fasta_iupac_codes_invalid(tmp_path):
    """Ambiguity codes inside a FASTA sequence come back as invalid bases
    (they must split k-mer windows, matching the reference's table)."""
    from fastk_tpu.io.reader import batched_reads

    p = str(tmp_path / "x.fasta")
    with open(p, "w") as f:
        f.write(">r\nACGTRYACGTNacgtWSacgt\n")
    ((batch, _),) = list(batched_reads([p], batch_bases=1 << 16))
    codes = batch.codes[batch.boff[0]: batch.boff[0] + batch.rlen[0]]
    import numpy as np
    assert np.array_equal(
        codes,
        [0, 1, 2, 3, 4, 4, 0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4, 0, 1, 2, 3])


def _native_batches(path, hc=False, bc=0):
    from fastk_tpu.io.reader import batched_reads

    out = []
    for b, _ in batched_reads([path], 1 << 30, hc=hc, bc=bc):
        out.append(b)
    assert len(out) == 1
    return out[0]


@pytest.mark.parametrize("hc,bc", [(False, 0), (True, 0), (False, 2),
                                   (True, 1)])
def test_bam_native_scanner_matches_python(tmp_path, hc, bc):
    """The C BAM record scanner (fk_scan_bam through batched_reads) equals
    the per-record Python iterator byte-for-byte, incl. IUPAC ambiguity
    codes, skip flags, hc and bc."""
    from fastk_tpu import native
    from fastk_tpu.io.reader import iter_reads, pack_reads

    if native.load() is None:
        pytest.skip("no native library")
    rng = np.random.default_rng(3)
    reads = [bytes(rng.choice(list(b"ACGT"), size=int(
        rng.integers(20, 90))).astype(np.uint8)) for _ in range(50)]
    reads[7] = b"ACGTNRYSWKMBDHV" * 3  # ambiguity letters stay invalid
    reads[11] = b"AAAACCCCGGGGTTTT" * 2  # hc-compressible
    p = str(tmp_path / "in.bam")
    _write_bam(p, reads)
    want = pack_reads(list(iter_reads(p)), hc=hc, bc=bc)
    got = _native_batches(p, hc=hc, bc=bc)
    assert np.array_equal(want.codes, got.codes)
    assert np.array_equal(want.boff, got.boff)
    assert np.array_equal(want.rlen, got.rlen)


@pytest.mark.parametrize("hc,bc", [(False, 0), (True, 2)])
def test_sam_native_scanner_matches_python(tmp_path, hc, bc):
    from fastk_tpu import native
    from fastk_tpu.io.reader import iter_reads, pack_reads

    if native.load() is None:
        pytest.skip("no native library")
    rng = np.random.default_rng(5)
    reads = [bytes(rng.choice(list(b"ACGTacgt"), size=int(
        rng.integers(15, 80))).astype(np.uint8)) for _ in range(40)]
    reads[3] = b"ANRYSWKMBDHVU123Gt"  # IUPAC normalization
    p = str(tmp_path / "in.sam")
    _write_sam(p, reads)
    with open(p, "a") as f:  # a '*'-SEQ record must be skipped
        f.write("r8\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n")
    want = pack_reads(list(iter_reads(p)), hc=hc, bc=bc)
    got = _native_batches(p, hc=hc, bc=bc)
    assert np.array_equal(want.codes, got.codes)
    assert np.array_equal(want.boff, got.boff)
    assert np.array_equal(want.rlen, got.rlen)


def test_sam_bam_scanner_none_falls_back(tmp_path, monkeypatch):
    """A None from the native scanner wrappers (internal capacity
    overflow) must fall back to the per-buffer Python parser, not raise
    (advisor r4: parse_one unpacked the None)."""
    from fastk_tpu import native
    from fastk_tpu.io.reader import iter_reads, pack_reads

    if native.load() is None:
        pytest.skip("no native library")
    rng = np.random.default_rng(9)
    reads = [bytes(rng.choice(list(b"ACGT"), size=int(
        rng.integers(20, 90))).astype(np.uint8)) for _ in range(30)]
    pb = str(tmp_path / "in.bam")
    _write_bam(pb, reads)
    ps = str(tmp_path / "in.sam")
    _write_sam(ps, reads)
    monkeypatch.setattr(native, "scan_bam", lambda *a, **k: None)
    monkeypatch.setattr(native, "scan_sam", lambda *a, **k: None)
    for p in (pb, ps):
        want = pack_reads(list(iter_reads(p)))
        got = _native_batches(p)
        assert np.array_equal(want.codes, got.codes), p
        assert np.array_equal(want.boff, got.boff), p
        assert np.array_equal(want.rlen, got.rlen), p


def test_bam_native_chunk_seams(tmp_path, monkeypatch):
    """Record boundaries at inflate-chunk seams: force tiny BGZF members
    so records straddle chunks and the native cut/carry path runs."""
    import gzip as _gz

    from fastk_tpu import native
    from fastk_tpu.io.reader import iter_reads, pack_reads

    if native.load() is None:
        pytest.skip("no native library")
    rng = np.random.default_rng(7)
    reads = [bytes(rng.choice(list(b"ACGT"), size=int(
        rng.integers(50, 200))).astype(np.uint8)) for _ in range(60)]
    hdr_text = b"@HD\tVN:1.6\n"
    out = b"BAM\x01" + struct.pack("<i", len(hdr_text)) + hdr_text
    out += struct.pack("<i", 1)
    out += struct.pack("<i", 5) + b"chr1\x00" + struct.pack("<i", 1000)
    for i, r in enumerate(reads):
        out += _bam_record(b"r%d" % i, 4, r)
    p = str(tmp_path / "seam.bam")
    with _gz.open(p, "wb") as f:
        f.write(out)
    # tiny raw-chunk reads so carries happen mid-record
    import fastk_tpu.io.sam as sammod

    monkeypatch.setattr(sammod, "_raw_gz_chunks",
                        lambda path, chunk=97: _tiny_chunks(path, 97))
    want = pack_reads(list(iter_reads(p)))
    got = _native_batches(p)
    assert np.array_equal(want.codes, got.codes)
    assert np.array_equal(want.boff, got.boff)


def _tiny_chunks(path, chunk):
    from fastk_tpu.io.sam import _open as _sopen

    with _sopen(path) as f:
        while True:
            b = f.read(chunk)
            if not b:
                return
            yield b
