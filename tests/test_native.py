"""Native host codec (fastk_tpu.native) parity with the Python paths."""

import gzip
import os

import numpy as np
import pytest

from fastk_tpu import native


pytestmark = pytest.mark.skipif(
    native.load() is None, reason="no C compiler for the native codec")


READS = [b"ACGTacgtACGGTTTacACGT", b"TTGANNAGATTACACAGGATT",
         b"CCCGTGTGtttACGATCAGGA", b"GGGG", b"aAcCgGtT"]


def _fasta(path, reads, width=7):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i} extra header\n")
            s = r.decode()
            for j in range(0, len(s), width):
                f.write(s[j: j + width] + "\n")


def _fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            s = r.decode()
            f.write(f"@read{i}\n{s}\n+\n{'I' * len(s)}\n")


@pytest.mark.parametrize("hc", [False, True])
@pytest.mark.parametrize("bc", [0, 3])
@pytest.mark.parametrize("kind", ["fasta", "fastq"])
def test_scan_matches_python(tmp_path, kind, hc, bc):
    from fastk_tpu.io.reader import iter_reads, pack_reads

    p = str(tmp_path / f"in.{kind}")
    (_fasta if kind == "fasta" else _fastq)(p, READS)

    with open(p, "rb") as f:
        buf = f.read()
    got = native.scan_seq(buf, fastq=(kind == "fastq"), hc=hc, bc=bc)
    assert got is not None
    codes, boff, rlen = got

    want = pack_reads(list(iter_reads(p)), hc=hc, bc=bc)
    assert np.array_equal(rlen, want.rlen)
    assert np.array_equal(boff, want.boff)
    assert np.array_equal(codes, want.codes)


def test_batched_reads_native_slicing(tmp_path):
    from fastk_tpu.io.reader import batched_reads

    p = str(tmp_path / "in.fasta")
    _fasta(p, READS)
    batches = list(batched_reads([p], batch_bases=30))
    assert len(batches) > 1
    # ordinals cover all reads exactly once
    total = sum(b.nreads for b, _ in batches)
    assert total == len(READS)
    assert batches[0][1] == 0
    # every batch round-trips its reads
    flat = []
    for b, _o in batches:
        for r in range(b.nreads):
            o = int(b.boff[r])
            flat.append(bytes(b.codes[o: o + int(b.rlen[r])]))
    from fastk_tpu.io.reader import CODE_TABLE
    want = [bytes(CODE_TABLE[np.frombuffer(r, np.uint8)]) for r in READS]
    assert flat == want


def test_pack2_matches_python():
    from fastk_tpu.ops.pack import pack_stream

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, size=4096, dtype=np.int64).astype(np.uint8)
    packed_py, exc_py = pack_stream(codes)
    got = native.pack2(codes, ecap=len(codes))
    assert got is not None
    packed, exc, ne = got
    assert np.array_equal(packed, packed_py)
    n_real = int((exc_py != 0xFFFFFFFF).sum())
    assert ne == n_real
    assert np.array_equal(exc[:ne], exc_py[:ne])


def test_prof_decode_matches_python(monkeypatch):
    from fastk_tpu.formats import prof

    rng = np.random.default_rng(1)
    counts = np.clip(rng.integers(0, 200, size=500).cumsum() % 32768, 0,
                     32767).astype(np.uint16)
    counts[100:190] = counts[99]  # a long zero-run
    blob = prof.encode_profile(counts)
    got = native.prof_decode(np.frombuffer(blob, np.uint8), 63 * len(blob) + 2)
    monkeypatch.setenv("FASTK_TPU_NO_NATIVE", "1")
    assert np.array_equal(got, counts)


def test_union_slots_matches_numpy(monkeypatch):
    """The C k-way union and the numpy searchsorted-merge fallback agree on
    window_union and window_sum over random sorted-unique streams."""
    from fastk_tpu.formats import twindow

    if native.load() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    kb = 5
    chunk = []
    for i in range(4):
        m = int(rng.integers(0, 300))
        keys = rng.integers(0, 256, (m, kb), dtype=np.int64).astype(np.uint8)
        v = np.unique(np.ascontiguousarray(keys).view(f"S{kb}").ravel())
        p = v.view(np.uint8).reshape(-1, kb)
        c = rng.integers(1, 1000, len(p)).astype(np.uint16)
        chunk.append((p, c))

    uni_n, vecs_n = twindow.window_union(chunk, kb)
    rows_n, sums_n = twindow.window_sum(chunk, kb)
    monkeypatch.setattr(native, "union_slots", lambda *a: None)
    uni_p, vecs_p = twindow.window_union(chunk, kb)
    rows_p, sums_p = twindow.window_sum(chunk, kb)

    assert np.array_equal(uni_n, uni_p)
    assert np.array_equal(rows_n, rows_p)
    assert np.array_equal(sums_n, sums_p)
    for a, b in zip(vecs_n, vecs_p):
        assert np.array_equal(a, b)
