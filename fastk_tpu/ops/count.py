"""Device-side k-mer counting: sort, segment-count, histogram, profile
inversion.

The reference's two-stage weighted sort (super-mer dedup then weighted k-mer
sort, count.c:1-18) exists to shrink CPU sort volume; on TPU the sort is a
device-wide radix-style sort (chained stable per-word argsorts now; Pallas
LSD kernel as the fast path) over fixed-shape key-word arrays, so we sort
k-mer instances directly and fold counting into a segmented reduction.

Profile inversion — the reference's pair of LSD sorts on ordinal indices
(count.c:619-1004) — becomes: the sort permutation IS the ordinal map;
broadcast each segment's count to its members and scatter back by position
(a single permutation scatter).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from fastk_tpu.ops.kmers import canonical_kmers, nwords

HIST_HIGH = 0x7FFF


def sort_perm(words, invalid=None) -> jnp.ndarray:
    """Stable sort permutation for multiword keys: LSD chain of stable
    argsorts from least- to most-significant word, with the invalid flag as
    the final (most significant) pass so invalid entries land at the end.

    One variadic lax.sort would do, but its comparator compiles an order of
    magnitude slower and lowers worse; the chain is W+1 single-key sorts.
    """
    perm = jnp.argsort(words[-1], stable=True)
    for w in reversed(words[:-1]):
        perm = perm[jnp.argsort(w[perm], stable=True)]
    if invalid is not None:
        perm = perm[jnp.argsort(invalid[perm], stable=True)]
    return perm


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def count_batch(codes: jnp.ndarray, k: int, size: int, want_positions: bool):
    """Count canonical k-mers of one code stream.

    Returns a dict of fixed-shape arrays (all [size] unless noted):
      seg_words: tuple of W uint32 — key of each segment (slot j holds the
                 j-th segment; slots >= nseg are garbage)
      seg_counts: int32 — instance count per segment (0 beyond nseg)
      seg_valid: bool — segment is a real k-mer (not the invalid block)
      nseg:     int32 scalar — number of segments (incl. invalid block)
      hist:     int32 [32768] — histogram over clipped counts (bin 0 unused)
      overflow: int32 scalar — instances lost to clipping at 32767
      pos_counts: int32 — clipped count of the k-mer starting at each
                 position, 0 at invalid positions (only if want_positions)
    """
    W = nwords(k)
    words, invalid = canonical_kmers(codes, k, size)

    perm = sort_perm(words, invalid)
    s_words = tuple(w[perm] for w in words)
    s_inv = invalid[perm]

    starts = jnp.zeros(size, dtype=bool)
    for w in s_words:
        starts = starts | (w != jnp.roll(w, 1))
    starts = (starts | (s_inv != jnp.roll(s_inv, 1))).at[0].set(True)

    idx = jnp.arange(size, dtype=jnp.int32)
    seg_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    nseg = seg_id[-1] + 1
    # first element index of each segment (slots beyond nseg stay == size)
    sidx = jnp.full(size, size, jnp.int32).at[seg_id].min(idx)
    bound = jnp.concatenate([sidx, jnp.full((1,), size, jnp.int32)])
    seg_counts = jnp.where(sidx < size, bound[1:] - sidx, 0)

    gidx = jnp.minimum(sidx, size - 1)
    seg_words = tuple(w[gidx] for w in s_words)
    seg_valid = (s_inv[gidx] == 0) & (seg_counts > 0)

    clipped = jnp.minimum(seg_counts, HIST_HIGH)
    hist = jnp.zeros(HIST_HIGH + 1, jnp.int32).at[
        jnp.where(seg_valid, clipped, 0)
    ].add(jnp.where(seg_valid, 1, 0))
    overflow = jnp.sum(
        jnp.where(seg_valid & (seg_counts > HIST_HIGH), seg_counts - HIST_HIGH, 0)
    )

    out = dict(
        seg_words=seg_words,
        seg_counts=seg_counts,
        seg_valid=seg_valid,
        nseg=nseg,
        hist=hist,
        overflow=overflow,
    )

    if want_positions:
        elem_cnt = clipped[seg_id] * (s_inv == 0)
        pos_counts = jnp.zeros(size, jnp.int32).at[perm].set(elem_cnt)
        out["pos_counts"] = pos_counts
    return out
