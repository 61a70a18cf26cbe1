"""Device-side k-mer counting: sort, segment-count, histogram, profile
inversion.

The reference's two-stage weighted sort (super-mer dedup then weighted k-mer
sort, count.c:1-18) exists to shrink CPU sort volume; on TPU the sort is a
device-wide radix-style sort over fixed-shape key-word arrays, so we sort
k-mer instances directly and fold counting into a segmented reduction.

Sort strategy is platform-dependent:
- TPU: one variadic lax.sort carrying all key words plus value operands —
  measured 2x the cost of a single-key sort, and it eliminates every
  post-sort random gather (random HBM access is ~10x the cost of the sort
  pass itself on v5e).
- CPU (tests): chained stable single-key argsorts — the variadic
  comparator compiles ~6x slower on the 1-core CI host; runtime there is
  irrelevant.

Profile inversion — the reference's pair of LSD sorts on ordinal indices
(count.c:619-1004) — becomes: carry the position through the sort and
scatter each segment's count back through it (one permutation scatter).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from fastk_tpu.ops.kmers import canonical_kmers, nwords

HIST_HIGH = 0x7FFF


def _use_variadic_sort() -> bool:
    return jax.default_backend() != "cpu"


def sort_records(words, invalid, values=()):
    """Sort records keyed by (invalid, words...) carrying `values` along.

    Returns (s_words, s_invalid, s_values) in ascending key order with all
    invalid records last."""
    if _use_variadic_sort():
        ops = (invalid, *words, *values)
        out = jax.lax.sort(ops, num_keys=1 + len(words), is_stable=False)
        return out[1: 1 + len(words)], out[0], out[1 + len(words):]
    # chained stable argsorts, least-significant first
    perm = jnp.argsort(words[-1], stable=True)
    for w in reversed(words[:-1]):
        perm = perm[jnp.argsort(w[perm], stable=True)]
    perm = perm[jnp.argsort(invalid[perm], stable=True)]
    return (
        tuple(w[perm] for w in words),
        invalid[perm],
        tuple(v[perm] for v in values),
    )


def segmented_count(s_words, s_inv, size: int, want_elem_counts: bool = False):
    """Segment statistics over SORTED records.

    Returns dict(seg_words, seg_counts, seg_valid, nseg, hist, overflow[,
    elem_counts]) — see count_batch. elem_counts is the clipped count of each
    sorted record's segment (in sorted order)."""
    starts = jnp.zeros(size, dtype=bool)
    for w in s_words:
        starts = starts | (w != jnp.roll(w, 1))
    starts = (starts | (s_inv != jnp.roll(s_inv, 1))).at[0].set(True)

    idx = jnp.arange(size, dtype=jnp.int32)
    seg_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    nseg = seg_id[-1] + 1

    # compact per-segment data by scattering at monotonically increasing
    # destinations (dst = seg ordinal); cheaper than gathering at sidx
    dst = jnp.where(starts, seg_id, size)
    sidx = jnp.full(size + 1, size, jnp.int32).at[dst].set(idx)[:-1]
    bound = jnp.concatenate([sidx, jnp.full((1,), size, jnp.int32)])
    seg_counts = jnp.where(sidx < size, bound[1:] - sidx, 0)

    def compact(arr, fill):
        return jnp.full(size + 1, fill, arr.dtype).at[dst].set(arr)[:-1]

    seg_words = tuple(compact(w, jnp.uint32(0)) for w in s_words)
    seg_valid = (compact(s_inv, jnp.uint32(1)) == 0) & (seg_counts > 0)

    clipped = jnp.minimum(seg_counts, HIST_HIGH)
    hist = jnp.zeros(HIST_HIGH + 1, jnp.int32).at[
        jnp.where(seg_valid, clipped, 0)
    ].add(jnp.where(seg_valid, 1, 0))
    overflow = jnp.sum(
        jnp.where(seg_valid & (seg_counts > HIST_HIGH), seg_counts - HIST_HIGH, 0)
    )

    out = dict(seg_words=seg_words, seg_counts=seg_counts, seg_valid=seg_valid,
               nseg=nseg, hist=hist, overflow=overflow)

    if want_elem_counts:
        # per-element segment extent via scans (no random gather): segment
        # start = running max of start indices; segment end = next start at
        # or after i+1 (reverse running min)
        start_of = jax.lax.cummax(jnp.where(starts, idx, 0))
        nxt = jnp.where(starts, idx, size)
        end_of = jnp.concatenate([
            jax.lax.cummin(nxt[::-1])[::-1][1:], jnp.full((1,), size, jnp.int32)
        ])
        out["elem_counts"] = (
            jnp.minimum(end_of - start_of, HIST_HIGH) * (s_inv == 0)
        ).astype(jnp.int32)
    return out


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def count_batch(codes: jnp.ndarray, k: int, size: int, want_positions: bool):
    """Count canonical k-mers of one code stream.

    Returns a dict of fixed-shape arrays (all [size] unless noted):
      seg_words: tuple of W uint32 — key of each segment (slot j holds the
                 j-th segment; slots >= nseg are zero)
      seg_counts: int32 — instance count per segment (0 beyond nseg)
      seg_valid: bool — segment is a real k-mer (not the invalid block)
      nseg:     int32 scalar — number of segments (incl. invalid block)
      hist:     int32 [32768] — histogram over clipped counts (bin 0 unused)
      overflow: int32 scalar — instances lost to clipping at 32767
      pos_counts: int32 — clipped count of the k-mer starting at each
                 position, 0 at invalid positions (only if want_positions)
    """
    words, invalid = canonical_kmers(codes, k, size)

    values = (jnp.arange(size, dtype=jnp.uint32),) if want_positions else ()
    s_words, s_inv, s_vals = sort_records(words, invalid, values)

    out = segmented_count(s_words, s_inv, size, want_elem_counts=want_positions)

    if want_positions:
        elem_cnt = out.pop("elem_counts")
        out["pos_counts"] = jnp.zeros(size, jnp.int32).at[s_vals[0]].set(elem_cnt)
    return out
