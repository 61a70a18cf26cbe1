"""Minimal ONE-code (1-code) ASCII writer for the `-1` tool exports.

The reference links ONElib (Durbin/Myers, ONElib.c:1-4194) and writes the
BINARY 1-code form. We emit the equivalent ASCII form of the same schemas
(.khist/.kmr/.prf): any ONE-code consumer reads both, and `ONEview` converts
between them. ASCII layout (ONElib.c oneWriteLine ASCII branch + writeHeader):

    1 <len> <filetype> 2 1
    ! 4 <len> <prog> <len> <version> <len> <command> <len> <date>
    .
    ~ <schema line>            (one per D/O schema row)
    .
    <data lines>: TYPE then fields; INTs bare, STRING/DNA/INT_LIST prefixed
    by their length.
"""

from __future__ import annotations

import sys
import time
from typing import Iterable, Sequence, TextIO

ONE_MAJOR, ONE_MINOR = 2, 1

KHIST_SCHEMA = [
    "D N 1 6 STRING          the name of the FastK .hist file this came from",
    "D R 2 3 INT 3 INT       the frequency range [low,hgh] covered",
    "O H 1 8 INT_LIST        a (hgh-low)+1 element list of the counts",
]

KMR_SCHEMA = [
    "D K 4 3 INT 3 INT 3 INT 3 INT k-mer size, prefix length, min. count, & 1st prefix for table",
    "O S 1 3 DNA                   concatentation of the suffixes of the k-mers with given prefix",
    "D C 1 8 INT_LIST              counts of the suffixes with the given prefix (in lex order)",
]

PRF_SCHEMA = [
    "O P 1 8 INT_LIST      The profile count vector for the next read",
]


class OneAsciiWriter:
    def __init__(self, filetype: str, schema: Sequence[str], prog: str,
                 command: str, out: TextIO | None = None):
        self.out = out if out is not None else sys.stdout
        w = self.out.write
        w(f"1 {len(filetype)} {filetype} {ONE_MAJOR} {ONE_MINOR}\n")
        date = time.strftime("%Y-%m-%d_%H:%M:%S")
        w("! 4" + "".join(
            f" {len(s)} {s}" for s in (prog, "1.0", command, date)) + "\n")
        w(".\n")
        for line in schema:
            w(f"~ {line}\n")
        w(".\n")

    def line(self, t: str, *fields) -> None:
        """Write one data line. A str field is STRING/DNA (length-prefixed);
        a list/array field is an INT_LIST (length-prefixed); ints are bare."""
        parts = [t]
        for f in fields:
            if isinstance(f, str):
                parts.append(f"{len(f)} {f}")
            elif isinstance(f, (int,)):
                parts.append(str(f))
            else:  # iterable of ints
                vals = [str(int(v)) for v in f]
                parts.append(str(len(vals)))
                parts.extend(vals)
        self.out.write(" ".join(parts) + "\n")


def write_khist(hist, source_name: str, low: int, high: int,
                command: str, out=None) -> None:
    """`Histex -1` export (reference: Histex.c:183-198)."""
    f1 = OneAsciiWriter("khist", KHIST_SCHEMA, "histex", command, out)
    f1.line("N", source_name)
    f1.line("R", low, high)
    f1.line("H", hist)


def write_kmr(stream, cut: int, command: str, out=None) -> None:
    """`Tabex -1` export: per-prefix suffix/count groups (Tabex.c:86-143)."""
    from fastk_tpu.formats.ktab import kmer_to_string

    f1 = OneAsciiWriter("kmr", KMR_SCHEMA, "tabex", command, out)
    gmer = 4 * stream.ibyte
    f1.line("K", stream.kmer, gmer, stream.minval, stream._prefix_of(0))
    CHUNK = 1 << 15
    cur_pre, sufs, cnts = None, [], []
    for lo in range(0, stream.nels, CHUNK):
        hi = min(lo + CHUNK, stream.nels)
        packed, counts = stream.read_range(lo, hi)
        import numpy as np

        ords = np.arange(lo, hi, dtype=np.int64)
        pvals = np.searchsorted(stream._pindex, ords, side="right")
        for j in range(hi - lo):
            pre = int(pvals[j])
            if pre != cur_pre:
                if cur_pre is not None:
                    f1.line("S", "".join(sufs))
                    f1.line("C", cnts)
                cur_pre, sufs, cnts = pre, [], []
            c = int(counts[j])
            if c >= cut:
                sufs.append(
                    kmer_to_string(packed[j], stream.kmer)[gmer:])
                cnts.append(c)
    f1.line("S", "".join(sufs))
    f1.line("C", cnts)


def write_prf(profiles: Iterable, command: str, out=None) -> None:
    """`Profex -1` export (reference: Profex.c:112-180)."""
    f1 = OneAsciiWriter("prf", PRF_SCHEMA, "profex", command, out)
    for prof in profiles:
        f1.line("P", prof)
