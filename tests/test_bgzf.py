"""BGZF block-parallel decompression: framing detection, byte-exact
round-trips vs stdlib gzip, and the reader/SAM ingest paths over BGZF
inputs."""

import gzip
import struct
import zlib

import numpy as np
import pytest

from fastk_tpu.io import bgzf

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def write_bgzf(path, data: bytes, block: int = 1000) -> None:
    """Minimal BGZF writer: independent gzip members with the BC subfield."""
    with open(path, "wb") as f:
        for off in range(0, len(data), block):
            chunk = data[off: off + block]
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(chunk) + co.flush()
            bsize = len(payload) + 25 + 1  # hdr(12)+extra(6)+payload+crc+isize
            hdr = (b"\x1f\x8b\x08\x04" + b"\x00" * 6 + struct.pack("<H", 6)
                   + b"BC" + struct.pack("<HH", 2, bsize - 1))
            f.write(hdr + payload + struct.pack(
                "<II", zlib.crc32(chunk), len(chunk)))
        f.write(BGZF_EOF)


def test_sniff_and_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
    p = str(tmp_path / "x.gz")
    write_bgzf(p, data, block=777)
    assert bgzf.is_bgzf(p)
    got = b"".join(bgzf.iter_bgzf_chunks(p))
    assert got == data
    # the file-like wrapper reads identically
    with bgzf.open_gz(p) as f:
        assert f.read() == data


def test_plain_gzip_fallback(tmp_path):
    p = str(tmp_path / "y.gz")
    with gzip.open(p, "wb") as f:
        f.write(b"hello world\n" * 1000)
    assert not bgzf.is_bgzf(p)
    with bgzf.open_gz(p) as f:
        assert f.read() == b"hello world\n" * 1000


@pytest.mark.parametrize("workers", [1, 3])
def test_parallel_matches_serial(tmp_path, monkeypatch, workers):
    rng = np.random.default_rng(1)
    data = rng.integers(65, 91, 500_000, dtype=np.uint8).tobytes()
    p = str(tmp_path / "z.gz")
    write_bgzf(p, data, block=4096)
    monkeypatch.setenv("FASTK_TPU_INGEST_THREADS", str(workers))
    assert b"".join(bgzf.iter_bgzf_chunks(p)) == data


def test_truncated_member_raises(tmp_path):
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()
    p = str(tmp_path / "t.gz")
    write_bgzf(p, data)
    raw = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(raw[:-40])
    with pytest.raises(ValueError):
        b"".join(bgzf.iter_bgzf_chunks(p))


def test_fasta_over_bgzf(tmp_path):
    """reader ingest over a BGZF-compressed FASTA equals the plain parse."""
    import fastk_tpu.io.reader as rd

    rng = np.random.default_rng(3)
    lines = []
    for i in range(200):
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 150))
        lines.append(f">r{i}\n{seq}\n")
    text = "".join(lines).encode()
    plain = str(tmp_path / "in.fasta")
    with open(plain, "wb") as f:
        f.write(text)
    bg = str(tmp_path / "in.fasta.gz")
    write_bgzf(bg, text, block=512)
    want = rd.pack_reads(list(rd.iter_reads(plain)))
    got = rd.pack_reads(list(rd.iter_reads(bg)))
    assert np.array_equal(want.codes, got.codes)
    batches = list(rd.batched_reads([bg], batch_bases=5000))
    assert np.array_equal(
        np.concatenate([b.codes for b, _ in batches]), want.codes)
