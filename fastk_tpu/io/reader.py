"""Host-side sequence ingestion: FASTA/FASTQ → code arrays for the device.

The device consumes a flat uint8 code stream: acgt/ACGT → 0..3, every other
byte (N, separators) → 4 (the invalid sentinel). Reads are joined with a
single sentinel so windows never span reads, mirroring the reference's
0-terminated DATA_BLOCK packing (reference: io.c:296-333, FastK.h:87-98).

Homopolymer compression (-c) drops bytes equal to the previous RAW byte,
case-sensitively, exactly like the reference's ADD macro (io.c:557-570).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np

SENTINEL = 4

CODE_TABLE = np.full(256, SENTINEL, dtype=np.uint8)
for _i, _b in enumerate("acgt"):
    CODE_TABLE[ord(_b)] = _i
    CODE_TABLE[ord(_b.upper())] = _i


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def detect_format(path: str) -> str:
    """File-type resolution by suffix, with the reference's 17-variant
    suffix table reduced to its stem cases (reference: io.c:72-79,137-258)."""
    p = path[:-3] if path.endswith(".gz") else path
    if p.endswith((".fastq", ".fq")):
        return "fastq"
    if p.endswith((".fasta", ".fa", ".fna")):
        return "fasta"
    if p.endswith((".sam",)):
        return "sam"
    if p.endswith((".bam",)):
        return "bam"
    if p.endswith((".cram",)):
        return "cram"
    if p.endswith((".db", ".dam")):
        return "dazz"
    # headerless default: sniff first byte
    with _open(path) as f:
        c = f.read(1)
    if c == b">":
        return "fasta"
    if c == b"@":
        return "fastq"
    raise ValueError(f"cannot determine sequence format of {path}")


def iter_reads(path: str) -> Iterator[bytes]:
    """Yield raw (case-preserving) read sequences from FASTA or FASTQ."""
    fmt = detect_format(path)
    if fmt == "fasta":
        yield from _iter_fasta(path)
    elif fmt == "fastq":
        yield from _iter_fastq(path)
    elif fmt in ("sam", "bam"):
        from fastk_tpu.io.sam import iter_sam_reads

        yield from iter_sam_reads(path, fmt)
    elif fmt == "dazz":
        from fastk_tpu.io.dazz import iter_dazz_reads

        yield from iter_dazz_reads(path)
    elif fmt == "cram":
        from fastk_tpu.io.cram import iter_cram_reads

        yield from iter_cram_reads(path)
    else:
        raise NotImplementedError(f"{fmt} input not supported yet")


def _iter_fasta(path: str) -> Iterator[bytes]:
    cur: List[bytes] = []
    with _open(path) as f:
        for line in f:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(b">"):
                if cur:
                    yield b"".join(cur)
                    cur = []
            else:
                cur.append(line)
    if cur:
        yield b"".join(cur)


def _iter_fastq(path: str) -> Iterator[bytes]:
    with _open(path) as f:
        while True:
            h = f.readline()
            if not h:
                return
            seq = f.readline().rstrip()
            f.readline()
            f.readline()
            yield seq


def homopoly_compress_bytes(seq: np.ndarray) -> np.ndarray:
    """Case-sensitive raw-byte homopolymer compression (-c)."""
    if len(seq) == 0:
        return seq
    keep = np.ones(len(seq), dtype=bool)
    keep[1:] = seq[1:] != seq[:-1]
    return seq[keep]


@dataclass
class ReadBatch:
    """A block of reads packed for the device.

    codes: uint8 [total]; reads joined by one SENTINEL, NOT terminated at the
           very start; the tail is padded with SENTINEL up to ``size``.
    boff:  int64 [nreads+1]; read r occupies codes[boff[r] : boff[r]+rlen[r]].
    rlen:  int64 [nreads] raw (possibly compressed) read lengths.
    """

    codes: np.ndarray
    boff: np.ndarray
    rlen: np.ndarray

    @property
    def nreads(self) -> int:
        return len(self.rlen)

    @property
    def totlen(self) -> int:
        return int(self.rlen.sum())


def pack_reads(reads: List[bytes], hc: bool = False, bc: int = 0,
               pad_to: int | None = None) -> ReadBatch:
    """Pack raw read strings into a device-ready code stream.

    bc: drop this many leading bases of each read (barcodes); applied AFTER
    homopolymer compression, matching the reference (split.c:1075 skips
    BC_PREFIX on the already-compressed DATA_BLOCK)."""
    arrs = []
    for r in reads:
        a = np.frombuffer(r, dtype=np.uint8)
        if hc:
            a = homopoly_compress_bytes(a)
        if bc:
            a = a[bc:]
        arrs.append(CODE_TABLE[a])
    rlen = np.array([len(a) for a in arrs], dtype=np.int64)
    boff = np.zeros(len(arrs) + 1, dtype=np.int64)
    np.cumsum(rlen + 1, out=boff[1:])  # +1 sentinel after each read
    total = int(boff[-1])
    size = total if pad_to is None else max(total, pad_to)
    codes = np.full(size, SENTINEL, dtype=np.uint8)
    for a, o in zip(arrs, boff[:-1]):
        codes[o: o + len(a)] = a
    return ReadBatch(codes=codes, boff=boff, rlen=rlen)


def read_file(path: str, hc: bool = False) -> ReadBatch:
    return pack_reads(list(iter_reads(path)), hc=hc)


def _scan_file_native(path: str, fmt: str, hc: bool, bc: int):
    """Whole-file native parse -> (codes, boff, rlen), or None."""
    if fmt not in ("fasta", "fastq"):
        return None
    from fastk_tpu import native

    if native.load() is None:
        return None
    with _open(path) as f:
        buf = f.read()
    return native.scan_seq(buf, fastq=(fmt == "fastq"), hc=hc, bc=bc)


def batched_reads(
    paths: List[str], batch_bases: int, hc: bool = False, bc: int = 0
) -> Iterator[Tuple[ReadBatch, int]]:
    """Stream ReadBatches of ~batch_bases each across input files.

    Yields (batch, first_read_ordinal). Reads are never split across batches
    (long-read splitting with a k-1 halo is handled at the device chunking
    layer, not here). FASTA/FASTQ files parse through the native scanner
    (fastk_tpu.native) when it is available; batches are then zero-copy
    slices of the whole-file code stream.
    """
    ordinal = 0
    cur: List[bytes] = []
    cur_bases = 0
    for path in paths:
        fmt = detect_format(path)
        scanned = _scan_file_native(path, fmt, hc, bc)
        if scanned is not None:
            if cur:  # flush python-path reads before zero-copy batches
                yield pack_reads(cur, hc=hc, bc=bc), ordinal
                ordinal += len(cur)
                cur, cur_bases = [], 0
            codes, boff, rlen = scanned
            nreads = len(rlen)
            lo = 0
            while lo < nreads:
                hi = lo
                bases = 0
                while hi < nreads and bases < batch_bases:
                    bases += int(rlen[hi]) + 1
                    hi += 1
                yield ReadBatch(
                    codes=codes[boff[lo]: boff[hi]],
                    boff=boff[lo: hi + 1] - boff[lo],
                    rlen=rlen[lo:hi],
                ), ordinal
                ordinal += hi - lo
                lo = hi
            continue
        for r in iter_reads(path):
            cur.append(r)
            cur_bases += len(r) + 1
            if cur_bases >= batch_bases:
                yield pack_reads(cur, hc=hc, bc=bc), ordinal
                ordinal += len(cur)
                cur, cur_bases = [], 0
    if cur:
        yield pack_reads(cur, hc=hc, bc=bc), ordinal
