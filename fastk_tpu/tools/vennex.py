"""`vennex` — per-region histograms of the Venn diagram of 2-4 tables
(reference: Vennex.c, deprecated). For each non-empty region, writes
<NAMES>.hist where each table's name is uppercased if the region includes it
and lowercased otherwise, joined by '_' (reference: Vennex.c:310-321). A
k-mer's count in a region is the minimum of its counts over the member
tables (reference: Venn2 Vennex.c:80-86)."""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

from fastk_tpu.algebra import merge_universe
from fastk_tpu.formats.ktab import read_ktab
from fastk_tpu.tools._cli import die

USAGE = "Usage: vennex [-h[<int(1)>:]<int(100)>] <source_1>[.ktab] <source_2>[.ktab] ..."


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    low, high = 1, 100
    pos = []
    for a in argv:
        if a.startswith("-h"):
            body = a[2:]
            try:
                if ":" in body:
                    lo, hi = body.split(":")
                    low, high = int(lo), int(hi)
                else:
                    high = int(body)
            except ValueError:
                die("vennex: invalid -h syntax")
        elif a.startswith("-"):
            die(f"vennex: {a} is an illegal option\n{USAGE}")
        else:
            pos.append(a)
    if len(pos) < 2 or len(pos) > 4:
        die(USAGE)

    tables, names = [], []
    for s in pos:
        try:
            tables.append(read_ktab(s))
        except FileNotFoundError:
            die(f"vennex: Cannot open {s}")
        b = os.path.basename(s).split(".")[0]
        names.append(b)
    kmer = tables[0].kmer
    if any(t.kmer != kmer for t in tables):
        die("vennex: K-mer tables do not involve the same K")

    universe, cvecs = merge_universe(tables)
    nway = len(tables)
    present = np.zeros(len(universe), np.int32)
    for c, v in enumerate(cvecs):
        present |= (v > 0).astype(np.int32) << c

    for region in range(1, 1 << nway):
        sel = present == region
        members = [cvecs[c][sel] for c in range(nway) if region & (1 << c)]
        cnt = members[0]
        for m in members[1:]:
            cnt = np.minimum(cnt, m)
        bins = np.bincount(np.clip(cnt, low, high) - low,
                           minlength=high - low + 1).astype(np.int64)
        name = "_".join(
            names[c].upper() if region & (1 << c) else names[c].lower()
            for c in range(nway)) + ".hist"
        # deprecated-tool quirk: the boundary header fields duplicate the
        # boundary bins (Vennex.c:323-327) rather than holding instance sums
        with open(name, "wb") as f:
            f.write(struct.pack("<iiiqq", kmer, low, high,
                                int(bins[0]), int(bins[-1])))
            bins.astype("<i8").tofile(f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
