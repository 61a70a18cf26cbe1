"""`fastmerge` — merge per-part k-mer tables produced by separate counting
jobs into one table/histogram (reference: Fastmerge.c:459-1048):

    fastmerge [-ht] [-T<int(4)>] [-#<int(1)>] [-P<dir(/tmp)>]
              [-S<N:int>of<D:int>] <target> <source>[.hist|.ktab] ...

Counts of k-mers present in several sources are summed and clipped at 32767
(reference: Fastmerge.c table_thread count-sum with 0x7fff clip). With
-S NofD only the Nth of D keyspace slices is produced; slice boundaries come
from the pivot (largest) table's entry quantiles so every slice job cuts the
keyspace identically (reference: Fastmerge.c:784-799), and slices then
concatenate with fastcat.
"""

from __future__ import annotations

import re
import sys

import numpy as np

from fastk_tpu.formats.hist import Histogram, write_histogram
from fastk_tpu.formats.ktab import KmerTable, read_ktab, write_ktab
from fastk_tpu.tools._cli import die

USAGE = """Usage: fastmerge [-ht] [-T<int(4)>] [#<int(1)>] [-P<dir(/tmp)>] [-S<N:int>of<D:int>]
                 <target> <source>[.hist|.ktab] ..."""


def merge_tables(tables, slice_spec=None):
    """Sum-merge sorted tables; optionally restrict to slice (n, d)."""
    kmer = tables[0].kmer
    kb = tables[0].packed.shape[1]
    for t in tables[1:]:
        if t.kmer != kmer:
            die("fastmerge: tables do not have a common k-mer size")

    lo_key = hi_key = None
    if slice_spec is not None:
        n, d = slice_spec
        pivot = max(tables, key=len)
        nels = len(pivot)
        pv = pivot.packed.view(f"S{kb}").ravel()
        if n > 1:
            lo_key = pv[nels * (n - 1) // d]
        if n < d:
            hi_key = pv[nels * n // d]

    allp = np.concatenate([t.packed for t in tables])
    allc = np.concatenate([t.counts.astype(np.int64) for t in tables])
    view = allp.view(f"S{kb}").ravel()
    if lo_key is not None or hi_key is not None:
        m = np.ones(len(view), bool)
        if lo_key is not None:
            m &= view >= lo_key
        if hi_key is not None:
            m &= view < hi_key
        allp, allc = allp[m], allc[m]

    # union-merge with count sums, on device for large inputs
    from fastk_tpu.ops.kmers import packed_to_words, words_to_packed
    from fastk_tpu.ops.tables import merge_counted

    uwords, summed = merge_counted([packed_to_words(allp, kmer)], [allc])
    minval = min(t.minval for t in tables)
    return KmerTable(kmer, minval, words_to_packed(uwords, kmer),
                     np.minimum(summed, 32767).astype(np.uint16))


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    do_hist = do_table = False
    nthreads, per_thread = 4, 1
    slice_spec = None
    pos = []
    for a in argv:
        if a.startswith("-") and len(a) > 1 and all(c in "ht" for c in a[1:]):
            do_hist |= "h" in a[1:]
            do_table |= "t" in a[1:]
        elif a.startswith("-T"):
            nthreads = int(a[2:])
        elif a.startswith("#") or a.startswith("-#"):
            per_thread = int(a.lstrip("-#") or "1")
        elif a.startswith("-P"):
            pass  # node-local caching is a non-issue without a shared FS
        elif a.startswith("-S"):
            m = re.fullmatch(r"(\d+)of(\d+)", a[2:])
            if not m:
                die(f"fastmerge: -S argument must be <N>of<D>: {a}")
            slice_spec = (int(m.group(1)), int(m.group(2)))
            if not 1 <= slice_spec[0] <= slice_spec[1]:
                die("fastmerge: slice number out of range")
        elif a.startswith("-"):
            die(f"fastmerge: {a} is an illegal option\n{USAGE}")
        else:
            pos.append(a)
    if not (do_hist or do_table):
        die("fastmerge: at least one of -h or -t must be set")
    if len(pos) < 2:
        die(USAGE)
    target, sources = pos[0], pos[1:]

    tables = []
    for s in sources:
        try:
            tables.append(read_ktab(s))
        except FileNotFoundError:
            die(f"fastmerge: Cannot open {s}")

    merged = merge_tables(tables, slice_spec)
    if do_table:
        write_ktab(target, merged, nparts=max(1, nthreads * per_thread))
    if do_hist:
        counts = merged.counts.astype(np.int64)
        h = Histogram.from_clipped_counts(merged.kmer, counts)
        write_histogram(target, h)
    return 0


if __name__ == "__main__":
    sys.exit(main())
