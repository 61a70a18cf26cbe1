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

    mid = t.kmer // 2
    good = np.zeros((4, MAX_HOMO_LEN + 1), np.int64)
    bad = np.zeros((4, MAX_HOMO_LEN + 1), np.int64)
    bases = "acgt"

    # vectorized over table chunks (a per-entry Python loop is hours at
    # real table sizes): the maximal homopolymer run covering the middle
    # position is found with two cumulative products of equality masks
    CHUNK = 1 << 20
    for lo0 in range(0, len(t), CHUNK):
        hi0 = min(len(t), lo0 + CHUNK)
        codes = unpack_codes(t.packed[lo0:hi0], k)
        counts = t.counts[lo0:hi0].astype(np.int64)
        center = codes[:, mid].astype(np.int64)
        eq = codes == center[:, None]
        # run extent left of mid: consecutive equal bases walking left
        left = np.cumprod(eq[:, mid - 1:: -1], axis=1).sum(axis=1) \
            if mid > 0 else np.zeros(len(codes), np.int64)
        right = np.cumprod(eq[:, mid + 1:], axis=1).sum(axis=1) \
            if mid + 1 < k else np.zeros(len(codes), np.int64)
        ln = np.minimum(left + right + 1, MAX_HOMO_LEN).astype(np.int64)
        isbad = counts <= etresh
        isgood = (~isbad) & (counts >= glo) & (counts <= ghi)
        for arr, mask in ((bad, isbad), (good, isgood)):
            np.add.at(arr, (center[mask], ln[mask]), 1)

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
