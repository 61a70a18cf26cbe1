"""CRAM ingestion gate.

The reference vendors all of htslib (~61k LoC of C) solely to decode CRAM
containers (io.c:1821-1990). A faithful CRAM decoder needs the container/
slice structure, rANS & name-tokenizer codecs and reference-based sequence
reconstruction; that native decoder is planned but not yet implemented here.
Until then we fail with clear guidance instead of mis-reading the file.
"""

from __future__ import annotations

from typing import Iterator


def iter_cram_reads(path: str) -> Iterator[bytes]:
    try:
        import pysam  # optional, not in the base image
    except ImportError:
        raise NotImplementedError(
            f"{path}: CRAM input requires the native CRAM decoder (not yet "
            "built) or pysam. Convert with `samtools view -b` to BAM, which "
            "is supported natively.")
    with pysam.AlignmentFile(path, "rc", check_sq=False) as f:
        for rec in f.fetch(until_eof=True):
            if rec.flag & 0x900:
                continue
            seq = rec.query_sequence
            if seq:
                yield seq.encode()
