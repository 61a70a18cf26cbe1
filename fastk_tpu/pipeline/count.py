"""The end-to-end k-mer counting pipeline (single-chip).

Phases (vs the reference's 4-phase disk pipeline, FastK.c:223-561):

1. Host ingest: parse + pack reads into code-stream batches (io.reader).
2. Device count: canonical keys -> sort -> segmented count (ops.count).
3. Host merge: per-batch unique (key, count) runs merged across batches.
4. Outputs: .hist (exact, from final global counts), .ktab (threshold
   filter), .prof (positions pass: per-position counts looked up against the
   final table — the reference's profile inversion by LSD sorts becomes a
   scatter/lookup).

Single-batch inputs take the fused path where the device histogram and
per-position counts are used directly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from fastk_tpu.formats.hist import HIST_HIGH, Histogram
from fastk_tpu.formats.ktab import KmerTable, kbytes
from fastk_tpu.io.reader import ReadBatch, batched_reads, pack_reads
from fastk_tpu.ops.count import count_batch
from fastk_tpu.ops.kmers import canonical_kmers, pad_needed, words_to_packed

DEFAULT_BATCH_BASES = 64 << 20  # bases per device batch


def _round_size(n: int, k: int) -> int:
    """Static device shape for a batch: next power of two (min 32k), so the
    number of distinct compilations stays logarithmic in input size."""
    want = n + pad_needed(k)
    size = 1 << 15
    while size < want:
        size <<= 1
    return size


def _pad_codes(batch: ReadBatch, k: int, size: int) -> np.ndarray:
    need = size + pad_needed(k)
    codes = np.full(need, 4, dtype=np.uint8)
    codes[: len(batch.codes)] = batch.codes
    return codes


@dataclass
class UniqueRuns:
    """Sorted unique canonical k-mers with counts (host, numpy)."""

    words: np.ndarray  # (n, W) uint32, lexicographically sorted rows
    counts: np.ndarray  # (n,) int64

    def merged_with(self, other: "UniqueRuns") -> "UniqueRuns":
        if len(self.counts) == 0:
            return other
        if len(other.counts) == 0:
            return self
        words = np.concatenate([self.words, other.words])
        counts = np.concatenate([self.counts, other.counts])
        return _dedup_sorted(*_sort_rows(words, counts))


def _sort_rows(words: np.ndarray, counts: np.ndarray):
    order = np.lexsort(tuple(words[:, j] for j in reversed(range(words.shape[1]))))
    return words[order], counts[order]


def _dedup_sorted(words: np.ndarray, counts: np.ndarray) -> UniqueRuns:
    if len(counts) == 0:
        return UniqueRuns(words, counts.astype(np.int64))
    neq = np.any(words[1:] != words[:-1], axis=1)
    starts = np.concatenate([[True], neq])
    idx = np.flatnonzero(starts)
    summed = np.add.reduceat(counts.astype(np.int64), idx)
    return UniqueRuns(words[idx], summed)


def _extract_batch_unique(res, W: int) -> UniqueRuns:
    nseg = int(res["nseg"])
    valid = np.asarray(res["seg_valid"][:nseg])
    words = np.stack([np.asarray(w[:nseg]) for w in res["seg_words"]], axis=1)
    counts = np.asarray(res["seg_counts"][:nseg], dtype=np.int64)
    return UniqueRuns(words[valid], counts[valid])


@dataclass
class CountOutput:
    kmer: int
    hist: Histogram
    table: Optional[KmerTable]
    profiles: Optional[List[np.ndarray]]
    nreads: int
    totlen: int


def _lookup_counts(table_words: np.ndarray, counts: np.ndarray,
                   query_words: np.ndarray) -> np.ndarray:
    """Clipped counts of query keys in the sorted table (0 if absent)."""
    W = table_words.shape[1]
    tv = np.ascontiguousarray(table_words.astype(">u4")).view(f"S{4*W}").ravel()
    qv = np.ascontiguousarray(query_words.astype(">u4")).view(f"S{4*W}").ravel()
    pos = np.searchsorted(tv, qv)
    pos_c = np.minimum(pos, len(tv) - 1) if len(tv) else np.zeros(len(qv), np.int64)
    hit = (len(tv) > 0) & (tv[pos_c] == qv)
    out = np.zeros(len(qv), dtype=np.int32)
    if len(tv):
        out[hit] = np.minimum(counts[pos_c[hit]], HIST_HIGH).astype(np.int32)
    return out


def _profiles_from_positions(batch: ReadBatch, pos_counts: np.ndarray, k: int
                             ) -> List[np.ndarray]:
    profs = []
    for r in range(batch.nreads):
        o = int(batch.boff[r])
        n = int(batch.rlen[r]) - k + 1
        if n <= 0:
            profs.append(np.zeros(0, dtype=np.uint16))
        else:
            profs.append(pos_counts[o: o + n].astype(np.uint16))
    return profs


def count_files(
    paths: Sequence[str],
    k: int,
    table_min: Optional[int] = None,
    profiles: bool = False,
    hc: bool = False,
    bc: int = 0,
    batch_bases: int = DEFAULT_BATCH_BASES,
    relative_table: Optional[KmerTable] = None,
    verbose: bool = False,
) -> CountOutput:
    """Count canonical k-mers in the given sequence files.

    relative_table: if given, profiles are taken against this table instead of
    the input's own counts (the -p:<table> mode, reference split.c:1943-2131).
    """
    from fastk_tpu.ops.kmers import nwords, packed_to_words

    W = nwords(k)
    batches: List[ReadBatch] = []
    ordinals: List[int] = []
    acc = UniqueRuns(np.zeros((0, W), np.uint32), np.zeros(0, np.int64))

    for batch, ordinal in batched_reads(list(paths), batch_bases, hc=hc, bc=bc):
        batches.append(batch)
        ordinals.append(ordinal)
        if relative_table is None:
            size = _round_size(len(batch.codes), k)
            codes = _pad_codes(batch, k, size)
            res = count_batch(jnp.asarray(codes), k, size, False)
            acc = acc.merged_with(_extract_batch_unique(res, W))
        if verbose:
            print(f"  batch {len(batches)}: {batch.nreads} reads, "
                  f"{batch.totlen} bases", flush=True)

    nreads = sum(b.nreads for b in batches)
    totlen = sum(b.totlen for b in batches)

    if relative_table is not None:
        # relative profiles: no counting pass at all, only lookups
        table_words = packed_to_words(relative_table.packed, k)
        table_counts = relative_table.counts.astype(np.int64)
        hist = None
        table = None
        profs = _lookup_profiles(batches, k, table_words, table_counts)
        return CountOutput(k, hist, table, profs, nreads, totlen)

    clipped = np.minimum(acc.counts, HIST_HIGH)
    overflow = int(np.maximum(acc.counts - HIST_HIGH, 0).sum())
    hist = Histogram.from_clipped_counts(k, clipped, overflow)

    table = None
    if table_min is not None:
        keep = clipped >= table_min
        packed = words_to_packed(acc.words[keep], k)
        table = KmerTable(k, table_min, packed, clipped[keep].astype(np.uint16))

    profs = None
    if profiles:
        profs = _lookup_profiles(batches, k, acc.words, acc.counts)
    return CountOutput(k, hist, table, profs, nreads, totlen)


def _lookup_profiles(batches, k, table_words, table_counts):
    """Second pass: per-position canonical keys -> clipped table counts."""
    profs: List[np.ndarray] = []
    for batch in batches:
        size = _round_size(len(batch.codes), k)
        codes = _pad_codes(batch, k, size)
        words, invalid = canonical_kmers(jnp.asarray(codes), k, size)
        wnp = np.stack([np.asarray(w) for w in words], axis=1)
        inv = np.asarray(invalid).astype(bool)
        counts = _lookup_counts(table_words, table_counts, wnp)
        counts[inv] = 0
        profs.extend(_profiles_from_positions(batch, counts, k))
    return profs


def count_reads(reads: List[bytes], k: int, **kw) -> CountOutput:
    """Convenience for tests: count an in-memory list of raw reads."""
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "in.fasta")
        with open(p, "w") as f:
            for i, r in enumerate(reads):
                s = r.decode() if isinstance(r, (bytes, bytearray)) else r
                f.write(f">r{i}\n{s}\n")
        return count_files([p], k, **kw)
