"""Streamed chunked ingest must reproduce the whole-file parse exactly,
with record-boundary snapping at every chunk seam (tiny chunks force seams
inside headers, sequence lines, quality lines)."""

import gzip

import numpy as np
import pytest

import fastk_tpu.io.reader as rd


def _mk_reads(rng, n=40):
    reads = []
    for i in range(n):
        ln = int(rng.integers(1, 200))
        reads.append("".join("ACGTN"[c] for c in rng.integers(0, 5, ln)))
    return reads


def _write_fasta(path, reads, width=17):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i} with a description\n")
            for j in range(0, len(r), width):
                f.write(r[j: j + width] + "\n")


def _write_fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            # quality line deliberately contains '@' and '>' bytes
            f.write(f"@read{i}\n{r}\n+\n{'@>' * ((len(r) + 1) // 2)}"[
                : 7 + len(str(i)) + 2 * len(r) + 2] + "\n")


def _gz(src, dst):
    with open(src, "rb") as f, gzip.open(dst, "wb") as g:
        g.write(f.read())


@pytest.mark.parametrize("fmt", ["fasta", "fastq"])
@pytest.mark.parametrize("gz", [False, True])
@pytest.mark.parametrize("chunk", [64, 1024])
def test_chunked_equals_whole(tmp_path, monkeypatch, fmt, gz, chunk):
    rng = np.random.default_rng(hash((fmt, gz, chunk)) % 2**32)
    reads = _mk_reads(rng)
    p = str(tmp_path / f"in.{fmt}")
    (_write_fasta if fmt == "fasta" else _write_fastq)(p, reads)
    if gz:
        _gz(p, p + ".gz")
        p = p + ".gz"

    want = rd.pack_reads(list(rd.iter_reads(p)))

    monkeypatch.setattr(rd, "INGEST_CHUNK", chunk)
    batches = list(rd.batched_reads([p], batch_bases=700))
    assert batches[0][1] == 0
    # ordinals are cumulative
    total = 0
    for b, o in batches:
        assert o == total
        total += b.nreads
    got_rlen = np.concatenate([b.rlen for b, _ in batches])
    assert np.array_equal(got_rlen, want.rlen)
    got_codes = np.concatenate([b.codes for b, _ in batches])
    assert np.array_equal(got_codes, want.codes)


def test_chunked_hc_bc(tmp_path, monkeypatch):
    rng = np.random.default_rng(5)
    reads = _mk_reads(rng, 25)
    p = str(tmp_path / "in.fasta")
    _write_fasta(p, reads)
    want = rd.pack_reads(list(rd.iter_reads(p)), hc=True, bc=2)
    monkeypatch.setattr(rd, "INGEST_CHUNK", 100)
    batches = list(rd.batched_reads([p], batch_bases=300, hc=True, bc=2))
    got_codes = np.concatenate([b.codes for b, _ in batches])
    assert np.array_equal(got_codes, want.codes)


def test_single_giant_read_spans_chunks(tmp_path, monkeypatch):
    rng = np.random.default_rng(9)
    r = "".join("acgt"[c] for c in rng.integers(0, 4, 5000))
    p = str(tmp_path / "big.fasta")
    _write_fasta(p, [r, "acgt"])
    want = rd.pack_reads(list(rd.iter_reads(p)))
    monkeypatch.setattr(rd, "INGEST_CHUNK", 128)
    batches = list(rd.batched_reads([p], batch_bases=256))
    got_codes = np.concatenate([b.codes for b, _ in batches])
    assert np.array_equal(got_codes, want.codes)
    assert sum(b.nreads for b, _ in batches) == 2


@pytest.mark.parametrize("workers", [1, 3])
def test_parallel_parse_equals_serial(tmp_path, monkeypatch, workers):
    """The chunk-parallel native parse pool must preserve file order and
    produce byte-identical batches for any worker count."""
    rng = np.random.default_rng(77)
    reads = _mk_reads(rng, 120)
    p = str(tmp_path / "in.fastq")
    _write_fastq(p, reads)
    want = rd.pack_reads(list(rd.iter_reads(p)))

    monkeypatch.setattr(rd, "INGEST_CHUNK", 256)
    monkeypatch.setenv("FASTK_TPU_INGEST_THREADS", str(workers))
    batches = list(rd.batched_reads([p], batch_bases=997))
    got_codes = np.concatenate([b.codes for b, _ in batches])
    assert np.array_equal(got_codes, want.codes)
    got_rlen = np.concatenate([b.rlen for b, _ in batches])
    assert np.array_equal(got_rlen, want.rlen)
