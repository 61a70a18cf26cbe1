"""Device-accelerated sorted-table operations for the tool layer.

Logex/Fastmerge/Symmex in the reference are host stream-merges over sorted
tables (Logex.c:972-1215, Fastmerge.c:168-450, Symmex.c:144-544). Here the
same operations run as device sorts over key-word columns — the exact
machinery of the counting path (ops.count) — so table algebra scales with
HBM bandwidth instead of host memory latency. Small tables fall back to
numpy (device compile latency dominates under ~1M rows).

All functions take/return host numpy arrays; keys are (n, W) uint32 word
rows (see ops.kmers packing).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

DEVICE_MIN_ROWS = 1 << 20  # below this, numpy beats compile+transfer


def _use_device(n: int) -> bool:
    if n < DEVICE_MIN_ROWS:
        return False
    try:
        import jax

        return len(jax.devices()) > 0
    except Exception:
        return False


def _cap(n: int) -> int:
    c = 1 << 15
    while c < n:
        c <<= 1
    return c


def merge_counted(words_list: Sequence[np.ndarray],
                  counts_list: Sequence[np.ndarray],
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Union-merge sorted (or unsorted) keyed count sets, summing counts of
    equal keys. Returns sorted unique (words, counts int64-clipped-to-int32).

    Device path: one merge_unique_blocks call (the counting pipeline's
    phase-3 merge); numpy fallback: lexsort + reduceat.
    """
    W = words_list[0].shape[1]
    total = sum(len(c) for c in counts_list)
    if not _use_device(total):
        return _merge_np(words_list, counts_list)

    import jax.numpy as jnp

    from fastk_tpu.ops.count import merge_unique_blocks

    cap = _cap(max(total, 2))
    mw = []
    for j in range(W):
        parts = [np.ascontiguousarray(w[:, j]) for w in words_list]
        col = np.full(cap, 0xFFFFFFFF, dtype=np.uint32)
        col[:total] = np.concatenate(parts) if parts else col[:0]
        mw.append(jnp.asarray(col))
    mc = np.zeros(cap, dtype=np.int32)
    mc[:total] = np.concatenate(
        [np.minimum(c, 0x7FFFFFFF).astype(np.int32) for c in counts_list])
    merged = merge_unique_blocks(tuple(mw), jnp.asarray(mc), cap)
    n = int(merged["nuniq"])
    words = np.stack([np.asarray(w[:n]) for w in merged["seg_words"]], axis=1)
    counts = np.asarray(merged["seg_counts"][:n]).astype(np.int64)
    return words, counts


def _merge_np(words_list, counts_list):
    W = words_list[0].shape[1]
    allw = np.concatenate(list(words_list)) if words_list else \
        np.zeros((0, W), np.uint32)
    allc = np.concatenate([c.astype(np.int64) for c in counts_list]) if \
        counts_list else np.zeros(0, np.int64)
    if len(allc) == 0:
        return allw, allc
    be = np.ascontiguousarray(allw.astype(">u4")).view(f"S{4 * W}").ravel()
    order = np.argsort(be, kind="stable")
    sw, sc, sv = allw[order], allc[order], be[order]
    starts = np.ones(len(sv), bool)
    starts[1:] = sv[1:] != sv[:-1]
    idx = np.flatnonzero(starts)
    return sw[idx], np.add.reduceat(sc, idx)


def sort_counted(words: np.ndarray, counts: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Sort (words, counts) rows by key (no dedup) — Symmex's core op."""
    n = len(counts)
    W = words.shape[1]
    if not _use_device(n):
        be = np.ascontiguousarray(words.astype(">u4")).view(f"S{4 * W}").ravel()
        order = np.argsort(be, kind="stable")
        return words[order], counts[order]

    import jax
    import jax.numpy as jnp

    cap = _cap(max(n, 2))
    ops = []
    for j in range(W):
        col = np.full(cap, 0xFFFFFFFF, dtype=np.uint32)
        col[:n] = words[:, j]
        ops.append(jnp.asarray(col))
    cc = np.zeros(cap, dtype=np.int32)
    cc[:n] = counts.astype(np.int32)
    # unstable: callers' keys are distinct (a canonical table never holds
    # both x and rc(x), so Symmex's fwd+rc rows never collide), and
    # lax.sort's is_stable=True would cost a hidden iota tiebreak operand
    out = jax.jit(
        lambda *o: jax.lax.sort(o, num_keys=W, is_stable=False)
    )(*ops, jnp.asarray(cc))
    sw = np.stack([np.asarray(w[:n]) for w in out[:W]], axis=1)
    sc = np.asarray(out[W][:n])
    return sw, sc.astype(counts.dtype)


def pad_counted_pow2(words: "np.ndarray", counts, W: int,
                     min_bits: int = 15):
    """Device operands for merge_unique_blocks from host (n, W) words and
    counts: pow2 capacity >= 2^min_bits, all-ones word pads / zero count
    pads (the empty-slot sentinel convention). Returns (words_tuple,
    counts_arr, cap). The single place that encodes the pad convention —
    pipeline.count, outofcore and the query pad all use it."""
    import math

    import jax.numpy as jnp

    n = len(counts) if counts is not None else words.shape[0]
    cap = 1 << max(min_bits, math.ceil(math.log2(max(n, 2))))
    wt = tuple(
        jnp.concatenate([
            jnp.asarray(np.ascontiguousarray(words[:, j])),
            jnp.full(cap - n, 0xFFFFFFFF, jnp.uint32)])
        for j in range(W))
    ct = None
    if counts is not None:
        ct = jnp.concatenate([
            jnp.asarray(np.asarray(counts).astype(np.int32)),
            jnp.zeros(cap - n, jnp.int32)])
    return wt, ct, cap
