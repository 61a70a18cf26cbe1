"""`fastcat` — splice keyspace slices (tables/histograms) or read-partitioned
profiles into one result (reference: Fastcat.c:26-631):

    fastcat [-vk] [-htp] <target> <source>[.hist|.ktab|.prof] ...

Sources are consumed destructively unless -k is given.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from fastk_tpu.formats.hist import Histogram, read_histogram, write_histogram
from fastk_tpu.formats.ktab import KmerTable, read_ktab, write_ktab
from fastk_tpu.formats.prof import ProfileIndex, write_prof
from fastk_tpu.tools._cli import die

USAGE = "Usage: fastcat [-vk] [-htp] <target> <source>[.hist|.ktab|.prof] ..."


def cat_histograms(paths):
    hs = [read_histogram(p) for p in paths]
    k = hs[0].kmer
    total = hs[0].counts.astype(np.int64).copy()
    ilow, ihigh = hs[0].ilowcnt, hs[0].ihighcnt
    for h in hs[1:]:
        if h.kmer != k or h.low != hs[0].low or h.high != hs[0].high:
            die("fastcat: histograms are not compatible")
        total += h.counts
        ilow += h.ilowcnt
        ihigh += h.ihighcnt
    return Histogram(k, hs[0].low, hs[0].high, total, ilow, ihigh)


def cat_tables(paths):
    ts = [read_ktab(p) for p in paths]
    k = ts[0].kmer
    kb = ts[0].packed.shape[1]
    for t in ts[1:]:
        if t.kmer != k:
            die("fastcat: tables do not have a common k-mer size")
    packed = np.concatenate([t.packed for t in ts])
    counts = np.concatenate([t.counts for t in ts])
    # slices must already be in keyspace order; validate the seams
    view = packed.view(f"S{kb}").ravel()
    if len(view) > 1 and not bool(np.all(view[:-1] < view[1:])):
        die("fastcat: sources are not disjoint ordered slices")
    return KmerTable(k, min(t.minval for t in ts), packed, counts)


def cat_profiles(paths):
    pis = [ProfileIndex(p) for p in paths]
    k = pis[0].kmer
    for p in pis[1:]:
        if p.kmer != k:
            die("fastcat: profiles do not have a common k-mer size")
    profs = []
    for pi in pis:
        profs.extend(pi.fetch(i) for i in range(pi.nreads))
    return k, profs


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    verbose = keep = False
    do = set()
    pos = []
    for a in argv:
        if a.startswith("-") and len(a) > 1 and all(c in "vkhtp" for c in a[1:]):
            verbose |= "v" in a[1:]
            keep |= "k" in a[1:]
            do |= set(a[1:]) & set("htp")
        elif a.startswith("-"):
            die(f"fastcat: {a} is an illegal option\n{USAGE}")
        else:
            pos.append(a)
    if len(pos) < 2:
        die(USAGE)
    if not do:
        die("fastcat: at least one of -h, -t, -p must be set")
    target, sources = pos[0], pos[1:]

    roots = []
    for s in sources:
        r = s
        for ext in (".hist", ".ktab", ".prof"):
            if r.endswith(ext):
                r = r[: -len(ext)]
        roots.append(r)

    if "h" in do:
        write_histogram(target, cat_histograms([r + ".hist" for r in roots]))
    if "t" in do:
        t = cat_tables(roots)
        write_ktab(target, t, nparts=max(1, len(roots)))
    if "p" in do:
        k, profs = cat_profiles(roots)
        write_prof(target, k, profs, nparts=max(1, len(roots)))

    if not keep:
        from fastk_tpu.tools.fastrm import main as fastrm_main

        exts = {"h": ".hist", "t": ".ktab", "p": ".prof"}
        for r in roots:
            for d in do:
                if os.path.exists(r + exts[d]):
                    fastrm_main(["-f", r + exts[d]])
    return 0


if __name__ == "__main__":
    sys.exit(main())
