"""CRAM ingestion gate.

The reference vendors all of htslib (~61k LoC of C) solely to decode CRAM
containers (io.c:1821-1990). A faithful CRAM decoder needs the container/
slice structure, rANS & name-tokenizer codecs and reference-based sequence
reconstruction; that native decoder is planned but not yet implemented here.
Until then we fail with clear guidance instead of mis-reading the file.
"""

from __future__ import annotations

import os
from typing import Iterator


def iter_cram_reads(path: str) -> Iterator[bytes]:
    from fastk_tpu.io import htslib

    if htslib.load() is not None:
        ref = os.environ.get("FASTK_TPU_CRAM_REF")
        yield from htslib.iter_hts_reads(path, ref)
        return
    try:
        import pysam  # optional, not in the base image
    except ImportError:
        raise NotImplementedError(
            f"{path}: CRAM input needs an htslib (set LIBHTS=/path/to/"
            "libhts.so) or pysam. Convert with `samtools view -b` to BAM, "
            "which is supported natively.")
    with pysam.AlignmentFile(path, "rc", check_sq=False) as f:
        for rec in f.fetch(until_eof=True):
            if rec.flag & 0x900:
                continue
            seq = rec.query_sequence
            if seq:
                yield seq.encode()
