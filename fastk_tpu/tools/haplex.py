"""`haplex` — find haplotype (het-SNP) k-mer groups: k-mers identical except
at the middle base, all with counts in the -g range (reference: Haplex.c,
deprecated). Output: one line per k-mer, middle base uppercased, with its
count; groups separated by blank lines."""

from __future__ import annotations

import sys

import numpy as np

from fastk_tpu.formats.ktab import read_ktab, unpack_codes
from fastk_tpu.tools._cli import die

USAGE = "Usage: haplex [-g<int>:<int>] <source>[.ktab]"


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    glo, ghi = 1, 0x7FFF
    pos = []
    for a in argv:
        if a.startswith("-g"):
            try:
                lo, hi = a[2:].split(":")
                glo, ghi = int(lo), int(hi)
            except ValueError:
                die("haplex: Syntax of -g option invalid -g<int>:<int>")
        elif a == "-H":
            pass
        elif a.startswith("-"):
            die(f"haplex: {a} is an illegal option\n{USAGE}")
        else:
            pos.append(a)
    if len(pos) != 1:
        die(USAGE)

    try:
        t = read_ktab(pos[0])
    except FileNotFoundError:
        die(f"haplex: Cannot open {pos[0]}")

    k = t.kmer
    mid = k // 2
    codes = unpack_codes(t.packed, k)
    good = (t.counts >= glo) & (t.counts <= ghi)
    codes = codes[good]
    counts = t.counts[good]

    # group by flanks: zero the middle base, sort, emit groups of size >= 2
    flank = codes.copy()
    flank[:, mid] = 0
    fb = np.ascontiguousarray(flank).view(f"S{k}").ravel()
    order = np.argsort(fb, kind="stable")
    fb = fb[order]
    codes, counts = codes[order], counts[order]
    starts = np.ones(len(fb), bool)
    if len(fb):
        starts[1:] = fb[1:] != fb[:-1]
    bounds = np.flatnonzero(starts).tolist() + [len(fb)]

    bases = "acgt"
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        if hi - lo < 2:
            continue
        for j in range(lo, hi):
            s = "".join(bases[c] for c in codes[j])
            s = s[:mid] + s[mid].upper() + s[mid + 1:]
            print(f"{s} {counts[j]}")
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
