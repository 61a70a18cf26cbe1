"""The end-to-end k-mer counting pipeline (single-chip).

Phases (vs the reference's 4-phase disk pipeline, FastK.c:223-561):

1. Host ingest: parse + pack reads into code-stream batches (io.reader).
2. Device count: per batch, canonical keys -> sort -> segment reduction ->
   compacted sorted unique (k-mer, count) blocks, kept DEVICE-RESIDENT
   (ops.count.unique_batch).
3. Device merge: one global sort of the concatenated unique blocks sums
   counts across batches (ops.count.merge_unique_blocks) — the analog of the
   reference's phase-3 table merge (table.c:346-533), as a device sort
   instead of a file heap-merge.
4. Outputs: .hist from the device histogram (exact overflow accounting on
   host: overflow = nvalid - sum(c*hist[c])), .ktab via one final D2H of the
   merged table, .prof via a second device pass per batch that sort-merge
   joins every position's key against the merged table (ops.count
   .profile_join) — the reference's profile inversion by LSD sorts
   (count.c:619-1004) becomes a join + one sort by position.

Everything bulky stays in HBM; the host only sees scalars until final
output encoding. (Host-side merging is also pathologically slow on
first-touch-throttled VMs, which this design sidesteps entirely.)
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from fastk_tpu.formats.hist import HIST_HIGH, Histogram
from fastk_tpu.formats.ktab import KmerTable
from fastk_tpu.io.reader import ReadBatch, batched_reads
from fastk_tpu.ops.count import (
    merge_unique_blocks,
    profile_join,
    unique_batch,
)
from fastk_tpu.ops.kmers import (
    nwords,
    pad_needed,
    packed_to_words,
    words_to_packed,
)

DEFAULT_BATCH_BASES = 64 << 20  # bases per device batch
_MIN_SIZE = 1 << 15
# hard cap on window positions per device call: reads longer than a batch
# (assembly contigs fed to KmerMap, ultra-long ONT) are processed in
# overlapping slices of this many positions — the reference's block split
# with a (k-1)-base halo (io.c:296-333, FastK.h:95-97) at the device
# boundary. Each k-mer start position belongs to exactly one slice.
MAX_DEVICE_POSITIONS = 1 << 26


def _round_size(n: int, k: int) -> int:
    """Static device shape for a batch: next power of two (min 32k), so the
    number of distinct compilations stays logarithmic in input size."""
    want = n + pad_needed(k)
    size = _MIN_SIZE
    while size < want:
        size <<= 1
    return min(size, MAX_DEVICE_POSITIONS)


def _pad_codes(batch: ReadBatch, k: int, size: int) -> np.ndarray:
    need = size + pad_needed(k)
    codes = np.full(need, 4, dtype=np.uint8)
    codes[: len(batch.codes)] = batch.codes
    return codes


def _code_slices(codes: np.ndarray, k: int):
    """Partition a code stream into (offset, size, padded_slice) windows of
    at most MAX_DEVICE_POSITIONS k-mer start positions each; slice i covers
    starts [offset, offset+size) and carries the k-1 halo after them."""
    n = len(codes)
    size = _round_size(n, k)
    pad = pad_needed(k)
    off = 0
    while off < n or off == 0:
        take = min(size, max(n - off, 0))
        buf = np.full(size + pad, 4, dtype=np.uint8)
        chunk = codes[off: off + take + pad]
        buf[: len(chunk)] = chunk
        yield off, size, buf
        off += size
        if take < size:
            break


def _device_codes(codes_np: np.ndarray):
    """Host codes -> device codes via the 2-bit uint32-word ingress (some
    transports move uint8 arrays ~1000x slower than uint32)."""
    from fastk_tpu.ops.pack import pack_stream_words, unpack_words

    pw, exc = pack_stream_words(codes_np)
    return unpack_words(jnp.asarray(pw), jnp.asarray(exc), len(codes_np))


def _trim(n: int) -> int:
    """Block slot count to keep for n uniques (multiple of 32k)."""
    return max(_MIN_SIZE, ((n + _MIN_SIZE - 1) // _MIN_SIZE) * _MIN_SIZE)


@dataclass
class CountOutput:
    kmer: int
    hist: Optional[Histogram]
    table: Optional[KmerTable]
    profiles: Optional[List[np.ndarray]]
    nreads: int
    totlen: int


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


def _device_table(table: KmerTable, k: int) -> Tuple[tuple, jnp.ndarray]:
    """Host table -> device (words tuple, counts), padded to a 32k multiple
    with all-ones/0 empty slots."""
    W = nwords(k)
    words = packed_to_words(table.packed, k)
    n = words.shape[0]
    cap = _trim(n)
    wpad = np.full((cap, W), 0xFFFFFFFF, dtype=np.uint32)
    wpad[:n] = words
    cpad = np.zeros(cap, dtype=np.int32)
    cpad[:n] = np.minimum(table.counts, HIST_HIGH)
    return (tuple(jnp.asarray(wpad[:, j]) for j in range(W)),
            jnp.asarray(cpad))


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
    the input's own counts (the -p:<table> mode, reference split.c:1943-2131)
    and no counting pass runs at all.
    """
    W = nwords(k)
    batches: List[ReadBatch] = []
    blocks_words: List[tuple] = []  # device-resident compacted unique blocks
    blocks_counts: List[jnp.ndarray] = []
    nvalid_total = 0

    def _finalize(res, size):
        nonlocal nvalid_total
        nu = int(res["nuniq"])
        nvalid_total += int(res["nvalid"])
        keep = min(_trim(nu), size)
        blocks_words.append(tuple(w[:keep] for w in res["seg_words"]))
        blocks_counts.append(res["seg_counts"][:keep])

    # one-batch lookahead: batch i+1's host parse/pack/H2D overlaps batch
    # i's device compute (the scalar fetches in _finalize are the only syncs)
    pending = None
    first_two: List[ReadBatch] = []
    gen = batched_reads(list(paths), batch_bases, hc=hc, bc=bc)
    for batch, _ordinal in gen:
        first_two.append(batch)
        if len(first_two) == 2:
            break

    if (profiles and relative_table is None and len(first_two) == 1
            and len(first_two[0].codes) + pad_needed(k) <= MAX_DEVICE_POSITIONS):
        # single batch with profiles: the fused path — per-position counts
        # come straight out of the counting sort, no second join pass
        return _count_single_fused(first_two[0], k, table_min, verbose)

    def _batches():
        yield from first_two
        for batch, _ordinal in gen:
            yield batch

    for batch in _batches():
        batches.append(batch)
        if relative_table is None:
            for _off, size, buf in _code_slices(batch.codes, k):
                res = unique_batch(_device_codes(buf), k, size)
                if pending is not None:
                    _finalize(*pending)
                pending = (res, size)
        if verbose:
            print(f"  batch {len(batches)}: {batch.nreads} reads, "
                  f"{batch.totlen} bases", flush=True)
    if pending is not None:
        _finalize(*pending)

    nreads = sum(b.nreads for b in batches)
    totlen = sum(b.totlen for b in batches)

    if relative_table is not None:
        # relative profiles: no counting pass at all, only the join
        t_words, t_counts = _device_table(relative_table, k)
        profs = _join_profiles(batches, k, t_words, t_counts)
        return CountOutput(k, None, None, profs, nreads, totlen)

    # final device merge of all unique blocks
    total = sum(int(b.shape[0]) for b in blocks_counts)
    cap = 1 << max(15, math.ceil(math.log2(max(total, 2))))
    m_words = []
    for j in range(W):
        parts = [blk[j] for blk in blocks_words]
        parts.append(jnp.full(cap - total, 0xFFFFFFFF, jnp.uint32))
        m_words.append(jnp.concatenate(parts))
    m_counts = jnp.concatenate(
        blocks_counts + [jnp.zeros(cap - total, jnp.int32)])
    merged = merge_unique_blocks(tuple(m_words), m_counts, cap)

    hist_arr = np.asarray(merged["hist"]).astype(np.int64)
    overflow = nvalid_total - int(
        (hist_arr[1:] * np.arange(1, HIST_HIGH + 1, dtype=np.int64)).sum())
    hist = Histogram.from_bins(k, hist_arr, overflow)

    table = None
    need_table = table_min is not None or profiles
    if need_table:
        nuniq = int(merged["nuniq"])
        u_words = np.stack(
            [np.asarray(w[:nuniq]) for w in merged["seg_words"]], axis=1)
        u_counts = np.minimum(np.asarray(merged["seg_counts"][:nuniq]),
                              HIST_HIGH).astype(np.uint16)
        tmin = table_min if table_min is not None else 1
        keepm = u_counts >= tmin
        packed = words_to_packed(u_words[keepm], k)
        tab = KmerTable(k, tmin, packed, u_counts[keepm])
        if table_min is not None:
            table = tab

    profs = None
    if profiles:
        # join against the device-resident merged table (cutoff 1)
        nuniq = int(merged["nuniq"])
        capt = _trim(nuniq)
        t_words = tuple(w[:capt] for w in merged["seg_words"])
        t_counts = jnp.minimum(merged["seg_counts"][:capt], HIST_HIGH)
        profs = _join_profiles(batches, k, t_words, t_counts)
    return CountOutput(k, hist, table, profs, nreads, totlen)


def _count_single_fused(batch: ReadBatch, k: int, table_min: Optional[int],
                        verbose: bool) -> CountOutput:
    """Single-batch `-t -p` jobs: one count_batch call yields the histogram,
    the unique table AND the per-position counts (the reference's "profiles
    by sort inversion" fused into phase 2, count.c:619-1004)."""
    from fastk_tpu.ops.count import count_batch

    size = _round_size(len(batch.codes), k)
    codes = _pad_codes(batch, k, size)
    res = count_batch(_device_codes(codes), k, size, True, True)
    if verbose:
        print(f"  batch 1 (fused): {batch.nreads} reads, "
              f"{batch.totlen} bases", flush=True)

    hist_arr = np.asarray(res["hist"]).astype(np.int64)
    nvalid = int(res["nvalid"])
    overflow = nvalid - int(
        (hist_arr[1:] * np.arange(1, HIST_HIGH + 1, dtype=np.int64)).sum())
    hist = Histogram.from_bins(k, hist_arr, overflow)

    # valid segments are the slots before the (single, trailing) invalid one
    nseg = int(res["nseg"])
    nuniq = nseg - (1 if nvalid < size else 0)
    u_words = np.stack(
        [np.asarray(w[:nuniq]) for w in res["seg_words"]], axis=1)
    u_counts = np.minimum(np.asarray(res["seg_counts"][:nuniq]),
                          HIST_HIGH).astype(np.uint16)
    table = None
    if table_min is not None:
        keep = u_counts >= table_min
        table = KmerTable(k, table_min, words_to_packed(u_words[keep], k),
                          u_counts[keep])

    pos_counts = np.asarray(res["pos_counts"])
    profs = _profiles_from_positions(batch, pos_counts, k)
    return CountOutput(k, hist, table, profs, batch.nreads, batch.totlen)


def _join_profiles(batches, k, t_words, t_counts):
    """Second pass: per-position counts via the device sort-merge join
    (oversized batches run in overlapping device slices)."""
    profs: List[np.ndarray] = []
    for batch in batches:
        n = len(batch.codes)
        pos_counts = np.zeros(n, dtype=np.int32)
        for off, size, buf in _code_slices(batch.codes, k):
            pc = np.asarray(
                profile_join(t_words, t_counts, _device_codes(buf), k, size))
            take = min(size, n - off)
            if take > 0:
                pos_counts[off: off + take] = pc[:take]
        profs.extend(_profiles_from_positions(batch, pos_counts, k))
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
