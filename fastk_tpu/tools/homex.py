"""`homex` — homopolymer error-rate statistics from a k-mer table
(reference: Homex.c, deprecated). For each homopolymer symbol and length,
reports how many k-mers centered on such a run have counts in the "good"
range (-g) vs below the error threshold (-e)."""

from __future__ import annotations

import sys

import numpy as np

from fastk_tpu.formats.ktab import read_ktab, unpack_codes
from fastk_tpu.tools._cli import die

USAGE = "Usage: homex -e<int> -g<int>:<int> <source_root>[.ktab]"

MAX_HOMO_LEN = 20


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    etresh = None
    glo = ghi = None
    pos = []
    for a in argv:
        if a.startswith("-e"):
            etresh = int(a[2:])
        elif a.startswith("-g"):
            try:
                lo, hi = a[2:].split(":")
                glo, ghi = int(lo), int(hi)
            except ValueError:
                die("homex: Syntax of -g option invalid -g<int>:<int>")
        elif a.startswith("-"):
            die(f"homex: {a} is an illegal option\n{USAGE}")
        else:
            pos.append(a)
    if len(pos) != 1 or etresh is None or glo is None:
        die(USAGE)

    try:
        t = read_ktab(pos[0])
    except FileNotFoundError:
        die(f"homex: Cannot open {pos[0]}")
    k = t.kmer
    if k < 20 + MAX_HOMO_LEN:
        die(f"homex: A k-mer length of at least {20 + MAX_HOMO_LEN} is needed")

    codes = unpack_codes(t.packed, k)
    counts = t.counts.astype(np.int64)
    mid = k // 2

    # maximal homopolymer run covering the middle position
    good = np.zeros((4, MAX_HOMO_LEN + 1), np.int64)
    bad = np.zeros((4, MAX_HOMO_LEN + 1), np.int64)
    center = codes[:, mid]
    bases = "acgt"
    for i in range(len(codes)):
        c = codes[i]
        s = int(center[i])
        lo = mid
        while lo > 0 and c[lo - 1] == s:
            lo -= 1
        hi = mid
        while hi + 1 < k and c[hi + 1] == s:
            hi += 1
        ln = min(hi - lo + 1, MAX_HOMO_LEN)
        if counts[i] <= etresh:
            bad[s, ln] += 1
        elif glo <= counts[i] <= ghi:
            good[s, ln] += 1

    print("  Len  Sym       Good      Error     Err %")
    for ln in range(1, MAX_HOMO_LEN + 1):
        for s in range(4):
            g, b = int(good[s, ln]), int(bad[s, ln])
            if g + b == 0:
                continue
            print(f"  {ln:3d}    {bases[s]} {g:10d} {b:10d}    {100.0*b/(g+b):5.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
