"""Device-side canonical k-mer key construction (JAX, static shapes).

A k-mer key is W = ceil(k/16) uint32 words, 16 bases per word, 2 bits per
base, big-endian within and across words, last word left-aligned and
zero-padded — so lexicographic word-tuple order equals the byte order of the
on-disk .ktab packing (reference packing: README.md table spec; the
reference's byte-at-a-time canonical compare is count.c:439-510, here done
word-parallel over all positions at once).

All positions of a code stream are processed in one fixed shape [S]: the
word arrays are built with 16 shifted ORs per word (a bit-parallel sliding
window), instead of the reference's per-base rolling scalar loop
(split.c:1136-1320) — that loop is inherently sequential; this form is pure
VPU work that XLA fuses and vectorizes.

Invalid positions (windows containing a non-acgt code or crossing a read
boundary sentinel) get all-zero words and an invalid flag that sorts last.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def nwords(k: int) -> int:
    return (k + 15) // 16


def pad_needed(k: int) -> int:
    """Host must pad the code stream with at least this many sentinel codes
    beyond the last window position."""
    return k + 16


def _slice(c: jnp.ndarray, off: int, size: int) -> jnp.ndarray:
    return jax.lax.dynamic_slice(c, (off,), (size,))


def _pack_fwd(c: jnp.ndarray, off: int, length: int, size: int) -> jnp.ndarray:
    """sum_{j<length} codes[p+off+j] << 2*(length-1-j)  for p in [0,size)."""
    acc = jnp.zeros(size, jnp.uint32)
    for j in range(length):
        acc = acc | (_slice(c, off + j, size) << (2 * (length - 1 - j)))
    return acc


def _pack_rc(c: jnp.ndarray, off: int, length: int, size: int) -> jnp.ndarray:
    """sum_{j<length} (3-codes[p+off+j]) << 2*j  for p in [0,size).

    Complement of a 2-bit code is 3-x; invalid codes don't matter (masked)."""
    acc = jnp.zeros(size, jnp.uint32)
    for j in range(length):
        acc = acc | (((3 - _slice(c, off + j, size)) & 3) << (2 * j))
    return acc


@functools.partial(jax.jit, static_argnums=(1, 2))
def canonical_kmers(codes: jnp.ndarray, k: int, size: int):
    """Canonical k-mer keys for every window start in [0, size).

    codes: uint8/uint32 [>= size + k + 16], values 0..3 valid, >=4 invalid.

    Returns (words, invalid):
      words:   tuple of W uint32 [size] — canonical key, zeroed when invalid
      invalid: uint32 [size] — 1 where the window is not a valid k-mer
    """
    c = codes.astype(jnp.uint32)
    W = nwords(k)
    L = k - 16 * (W - 1)  # bases in the last word, 1..16

    fwd = [_pack_fwd(c, 16 * w, 16, size) for w in range(W - 1)]
    fwd.append(_pack_fwd(c, 16 * (W - 1), L, size) << (32 - 2 * L))

    rc = [_pack_rc(c, k - 16 * (w + 1), 16, size) for w in range(W - 1)]
    rc.append(_pack_rc(c, 0, L, size) << (32 - 2 * L))

    # lexicographic fwd vs rc
    take_rc = jnp.zeros(size, jnp.int32)
    for w in range(W):
        cmp = jnp.where(fwd[w] < rc[w], -1, jnp.where(fwd[w] > rc[w], 1, 0))
        take_rc = jnp.where(take_rc != 0, take_rc, cmp)
    take_rc = take_rc > 0

    # validity: no invalid code inside the window
    bad = (_slice(c, 0, size + k) >= 4).astype(jnp.int32)
    cb = jnp.cumsum(bad)
    cb = jnp.concatenate([jnp.zeros(1, jnp.int32), cb])
    invalid = (cb[k:size + k] - cb[:size]) > 0

    words = tuple(
        jnp.where(invalid, 0, jnp.where(take_rc, rc[w], fwd[w])) for w in range(W)
    )
    return words, invalid.astype(jnp.uint32)


def words_to_packed(words: np.ndarray, k: int) -> np.ndarray:
    """Host: (n, W) uint32 canonical words -> (n, ceil(k/4)) uint8 .ktab bytes."""
    kb = (k + 3) // 4
    be = np.ascontiguousarray(words.astype(">u4"))
    return be.view(np.uint8).reshape(words.shape[0], -1)[:, :kb]


def packed_to_words(packed: np.ndarray, k: int) -> np.ndarray:
    """Host: (n, ceil(k/4)) uint8 .ktab bytes -> (n, W) uint32 words."""
    n = packed.shape[0]
    W = nwords(k)
    buf = np.zeros((n, 4 * W), dtype=np.uint8)
    buf[:, : packed.shape[1]] = packed
    return buf.view(">u4").astype(np.uint32).reshape(n, W)
