"""`symmex` — canonical table -> symmetric table (reference: Symmex.c:144-544;
README: every k-mer in both orientations, palindromes once, same count)."""

from __future__ import annotations

import sys

import numpy as np

from fastk_tpu.formats.ktab import KmerTable, read_ktab, write_ktab
from fastk_tpu.ops.canonical import revcomp_packed
from fastk_tpu.tools._cli import die, print_number

USAGE = "Usage: symmex  [-v] [-T<int(4)>] [-P<dir(/tmp)] <source_root>[.ktab] <dest_root>[.ktab]"


def symmetric_table(t: KmerTable) -> KmerTable:
    from fastk_tpu.ops.kmers import packed_to_words, words_to_packed
    from fastk_tpu.ops.tables import sort_counted

    rc = revcomp_packed(t.packed, t.kmer)
    pal = (rc == t.packed).all(axis=1)
    packed = np.concatenate([t.packed, rc[~pal]])
    counts = np.concatenate([t.counts, t.counts[~pal]])
    sw, sc = sort_counted(packed_to_words(packed, t.kmer), counts)
    return KmerTable(t.kmer, t.minval, words_to_packed(sw, t.kmer), sc)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    verbose = False
    nthreads = 4
    pos = []
    for a in argv:
        if a == "-v":
            verbose = True
        elif a.startswith("-T"):
            nthreads = int(a[2:])
        elif a.startswith("-P"):
            pass  # no temporary files needed
        elif a.startswith("-"):
            die(f"symmex: {a} is an illegal option\n{USAGE}")
        else:
            pos.append(a)
    if len(pos) != 2:
        die(USAGE)

    try:
        t = read_ktab(pos[0])
    except FileNotFoundError:
        die(f"symmex: Cannot open {pos[0]}")
    s = symmetric_table(t)
    if verbose:
        print(f"  {print_number(len(t))} canonical entries -> "
              f"{print_number(len(s))} symmetric entries", file=sys.stderr)
    write_ktab(pos[1], s, nparts=max(1, nthreads))
    return 0


if __name__ == "__main__":
    sys.exit(main())
