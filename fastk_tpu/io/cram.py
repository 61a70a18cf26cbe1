"""CRAM ingestion.

The reference vendors all of htslib (~61k LoC of C) solely to decode CRAM
containers (io.c:1821-1990). Here the primary path is the SELF-CONTAINED
decoder in io.cram_native (CRAM 3.0 containers, rANS-4x8, reference-based
sequence reconstruction — no system dependencies). Files using features
outside its gate (CRAM 3.1 codecs, exotic encodings) fall back to a system
htslib (LIBHTS=...) or pysam when configured, else fail with guidance.
"""

from __future__ import annotations

import os
from typing import Iterator


def iter_cram_reads(path: str) -> Iterator[bytes]:
    from fastk_tpu.io.cram_native import CramUnsupported, \
        iter_cram_reads_native

    try:
        yield from iter_cram_reads_native(path)
        return
    except CramUnsupported as e:
        reason = str(e)

    from fastk_tpu.io import htslib

    if htslib.load() is not None:
        ref = os.environ.get("FASTK_TPU_CRAM_REF")
        yield from htslib.iter_hts_reads(path, ref)
        return
    try:
        import pysam  # optional, not in the base image
    except ImportError:
        raise NotImplementedError(
            f"{path}: CRAM feature outside the native decoder's gate "
            f"({reason}); set LIBHTS=/path/to/libhts.so or install pysam, "
            "or convert to BAM with `samtools view -b`.")
    with pysam.AlignmentFile(path, "rc", check_sq=False) as f:
        for rec in f.fetch(until_eof=True):
            if rec.flag & 0x900:
                continue
            seq = rec.query_sequence
            if seq:
                yield seq.encode()
