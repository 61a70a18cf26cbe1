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


def compaction_sort(starts, operands):
    """Move segment-start records to the front, preserving order.

    A stable single-key sort on (1 - starts) IS stream compaction; on TPU it
    is ~4x cheaper than scattering each operand to its destination slot."""
    key = (~starts).astype(jnp.uint8)
    out = jax.lax.sort((key, *operands), num_keys=1, is_stable=True)
    return out[1:]


def segmented_count(s_words, s_inv, size: int, want_elem_counts: bool = False,
                    want_hist: bool = False):
    """Segment statistics over SORTED records. Scatter-free except the
    optional histogram (multi-chip psum path); everything else is rolls,
    scans and one stable compaction sort.

    Returns dict(seg_words, seg_counts, seg_valid, nseg, overflow[, hist]
    [, elem_counts]) — see count_batch. elem_counts is the clipped count of
    each sorted record's segment (in sorted order)."""
    starts = jnp.zeros(size, dtype=bool)
    for w in s_words:
        starts = starts | (w != jnp.roll(w, 1))
    starts = (starts | (s_inv != jnp.roll(s_inv, 1))).at[0].set(True)

    idx = jnp.arange(size, dtype=jnp.int32)
    nseg = jnp.sum(starts.astype(jnp.int32))

    # per-element segment extent via scans (no random access): segment start
    # = running max of start indices; end = next start at or after i+1
    start_of = jax.lax.cummax(jnp.where(starts, idx, 0))
    nxt = jnp.where(starts, idx, size)
    end_of = jnp.concatenate([
        jax.lax.cummin(nxt[::-1])[::-1][1:], jnp.full((1,), size, jnp.int32)
    ])
    seg_len = end_of - start_of  # true segment length at every element

    compacted = compaction_sort(
        starts, (*s_words, seg_len.astype(jnp.uint32), s_inv))
    W = len(s_words)
    seg_words = tuple(compacted[:W])
    raw_counts = compacted[W].astype(jnp.int32)
    seg_inv = compacted[W + 1]

    slot = jnp.arange(size, dtype=jnp.int32)
    seg_valid = (slot < nseg) & (seg_inv == 0)
    seg_counts = jnp.where(slot < nseg, raw_counts, 0)

    overflow = jnp.sum(
        jnp.where(seg_valid & (seg_counts > HIST_HIGH), seg_counts - HIST_HIGH, 0)
    )

    out = dict(seg_words=seg_words, seg_counts=seg_counts, seg_valid=seg_valid,
               nseg=nseg, overflow=overflow)

    if want_hist:
        clipped = jnp.minimum(seg_counts, HIST_HIGH)
        out["hist"] = jnp.zeros(HIST_HIGH + 1, jnp.int32).at[
            jnp.where(seg_valid, clipped, 0)
        ].add(jnp.where(seg_valid, 1, 0))

    if want_elem_counts:
        out["elem_counts"] = (
            jnp.minimum(seg_len, HIST_HIGH) * (s_inv == 0)
        ).astype(jnp.int32)
    return out


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def count_batch(codes: jnp.ndarray, k: int, size: int, want_positions: bool,
                want_hist: bool = False):
    """Count canonical k-mers of one code stream.

    Returns a dict of fixed-shape arrays (all [size] unless noted):
      seg_words: tuple of W uint32 — key of each segment (slot j holds the
                 j-th segment; slots >= nseg are garbage)
      seg_counts: int32 — instance count per segment (0 beyond nseg),
                 unclipped (the histogram clip at 32767 happens at output)
      seg_valid: bool — segment is a real k-mer (not the invalid block)
      nseg:     int32 scalar — number of segments (incl. invalid block)
      overflow: int32 scalar — instances lost to clipping at 32767
      pos_counts: int32 — clipped count of the k-mer starting at each
                 position, 0 at invalid positions (only if want_positions)

    The histogram itself is host-side (a bincount over seg_counts): a device
    scatter-add costs more than the entire sort.
    """
    words, invalid = canonical_kmers(codes, k, size)

    values = (jnp.arange(size, dtype=jnp.uint32),) if want_positions else ()
    s_words, s_inv, s_vals = sort_records(words, invalid, values)

    out = segmented_count(s_words, s_inv, size, want_elem_counts=want_positions,
                          want_hist=want_hist)

    if want_positions:
        elem_cnt = out.pop("elem_counts")
        out["pos_counts"] = jnp.zeros(size, jnp.int32).at[s_vals[0]].set(elem_cnt)
    return out
