"""Pallas run-length histogram: the count histogram read straight off the
sorted key stream, replacing the uint16 bincount sort + segment-length
scans (~212ms at 2^26 on v5e) with one scalar-core walk.

How it works (design constraints from benchmarks/_pallas_feas*.py probes):

- The XLA (vector) side computes the per-position `starts` mask, zeroes
  it at/after `valid_end` (so the kernel needs no boundary math at all),
  and packs it into 32-bit words via two exact f32 matmuls (bit b of
  word w = starts[32w + b]).
- A single Pallas kernel walks the words on the SCALAR core, streaming
  them through SMEM blocks (Mosaic auto-DMAs HBM->SMEM per grid step).
  Runs are delimited by start positions; each run's length is the diff
  of consecutive start positions, so the walk keeps one `prev_start`
  scalar and needs NO per-position data.
- Fast paths make the walk O(words): w == 0 (inside a long run, or the
  masked invalid tail) costs one compare; w == -1 (32 singleton runs —
  distinct-heavy data) costs three updates; mixed words walk their set
  bits with the ctz trick (31 - clz(w & -w)).
- Counts < BIG_CUT bin exactly into an SMEM histogram (SMEM arrays above
  ~2048 entries hit a Mosaic compile wall; counts clip at 32767 so the
  full 32768-bin histogram cannot live in SMEM). Rarer lengths >=
  BIG_CUT are appended to a bounded side list the host bins exactly;
  if even that overflows (> BIG_CAP segments of length >= 2047 in one
  batch), the kernel sets a flag and the caller falls back to the XLA
  bincount path — exactness is never compromised.

Scalar-loop rules learned the hard way: static `fori_loop` bodies are
fully unrolled by Mosaic (compiler death above ~2k iterations) — every
loop here is a `while_loop`; scalar loads must come from SMEM (dynamic
VMEM scalar access wedges the remote compiler).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

import fastk_tpu.jaxenv  # noqa: F401  (honor JAX_PLATFORMS over plugins)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastk_tpu.ops.count import HIST_HIGH

BIG_CUT = 2047       # lengths below this bin exactly in SMEM
BIG_CAP = 1024       # side-list capacity for lengths >= BIG_CUT
BLOCK_ROWS = 64      # SMEM input block (BLOCK_ROWS, 128) int32 words
POS_PER_BLOCK = BLOCK_ROWS * 128 * 32
_INTERPRET = False   # tests flip this to run the kernel on CPU


def available() -> bool:
    """The walk kernel runs only on real TPU (or interpreted, in tests)."""
    return _INTERPRET or jax.default_backend() == "tpu"


def _wl(n, body, init):
    """while-loop `for i in range(n)` carrying `init` (never unrolled)."""
    def cond(c):
        return c[0] < n

    def step(c):
        return (c[0] + 1, body(c[0], c[1]))

    return jax.lax.while_loop(cond, step, (jnp.int32(0), init))[1]


def _walk_kernel(block_rows, scal_ref, w_ref, hist_ref, big_ref, meta_ref,
                 hist, big, st):
    """Grid step over one (block_rows, 128) SMEM block of packed start
    words (32 positions per word; start bits beyond valid_end are already
    zero, so only the final-run close needs valid_end).

    scal_ref: (2,) scalar-prefetch [valid_end, unused]
    st scratch: [0] prev_start, [1] nbig, [2] overflow flag
    meta out:  [0] nbig, [1] overflow flag, [2] done marker
    """
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    valid_end = scal_ref[0]

    @pl.when(i == 0)
    def _():
        _wl(BIG_CUT + 1, lambda j, _: (hist.__setitem__(j, 0), 0)[1], 0)
        st[0] = 0
        st[1] = 0
        st[2] = 0

    base = i * (block_rows * 128 * 32)

    def bump(ln):
        # close a run of length ln (0 only for the phantom run before
        # position 0, which lands in the unused bin 0)
        hist[jnp.minimum(ln, BIG_CUT)] += 1

        @pl.when(ln >= BIG_CUT)
        def _():
            nb = st[1]

            @pl.when(nb < BIG_CAP)
            def _():
                big[nb] = jnp.minimum(ln, HIST_HIGH)

            @pl.when(nb >= BIG_CAP)
            def _():
                st[2] = 1
            st[1] = nb + 1

    @pl.when(base < valid_end)
    def _():
        def row(r, _):
            rbase = base + r * (128 * 32)

            def col(c, _):
                w = w_ref[r, c]

                @pl.when(w != 0)
                def _():
                    wbase = rbase + c * 32
                    rest = w & (w - 1)

                    @pl.when(rest == 0)
                    def _():
                        # exactly one start (the ~1-start-per-word regime
                        # of ~30X coverage data): one bump, no loop
                        b = 31 - jax.lax.clz(w)
                        bump(wbase + b - st[0])
                        st[0] = wbase + b

                    @pl.when((rest != 0) & (w == -1))
                    def _():
                        # 32 starts: close the incoming run, 31 singles
                        bump(wbase - st[0])
                        hist[1] += 31
                        st[0] = wbase + 31

                    @pl.when((rest != 0) & (w != -1))
                    def _():
                        def inner(cr):
                            w_, _a = cr
                            low = w_ & -w_
                            b = 31 - jax.lax.clz(low)
                            bump(wbase + b - st[0])
                            st[0] = wbase + b
                            return (w_ & (w_ - 1), 0)

                        jax.lax.while_loop(
                            lambda cr: cr[0] != 0, inner, (w, 0))

                return 0

            _wl(128, col, 0)
            return 0

        _wl(block_rows, row, 0)

    @pl.when(i == nblk - 1)
    def _():
        # close the final run (valid_end == 0 means no valid positions)
        @pl.when(valid_end > 0)
        def _():
            bump(valid_end - st[0])
        _wl(BIG_CUT + 1,
            lambda j, _: (hist_ref.__setitem__(j, hist[j]), 0)[1], 0)
        nb = jnp.minimum(st[1], BIG_CAP)
        _wl(nb, lambda j, _: (big_ref.__setitem__(j, big[j]), 0)[1], 0)
        meta_ref[0] = st[1]
        meta_ref[1] = st[2]
        meta_ref[2] = 1


@functools.partial(jax.jit, static_argnums=(1, 2))
def _run_walk(words: jnp.ndarray, nblocks: int, block_rows: int,
              valid_end: jnp.ndarray):
    """words: (nblocks*block_rows, 128) int32 packed start bits; returns
    (hist[BIG_CUT+1], big[BIG_CAP], meta[4])."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((block_rows, 128), lambda i, s: (i, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.SMEM((BIG_CUT + 1,), jnp.int32),
                        pltpu.SMEM((BIG_CAP,), jnp.int32),
                        pltpu.SMEM((4,), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_walk_kernel, block_rows),
        out_shape=(jax.ShapeDtypeStruct((BIG_CUT + 1,), jnp.int32),
                   jax.ShapeDtypeStruct((BIG_CAP,), jnp.int32),
                   jax.ShapeDtypeStruct((4,), jnp.int32)),
        grid_spec=grid_spec,
        interpret=_INTERPRET,
    )(jnp.stack([valid_end, valid_end]).astype(jnp.int32), words)


def _pack_weights() -> np.ndarray:
    """(128, 8) f32: lane 16j+b of a 128-lane group -> bit b of half-word
    j (each dot output sums distinct powers of two < 2^16 — f32-exact)."""
    w = np.zeros((128, 8), np.float32)
    for j in range(8):
        for b in range(16):
            w[j * 16 + b, j] = float(1 << b)
    return w


def pack_starts(starts_f32: jnp.ndarray, size: int) -> jnp.ndarray:
    """(size,) f32 0/1 starts -> (size/4096, 128) int32 32-bit words
    (word w bit b = starts[32w + b])."""
    m = starts_f32.reshape(size // 128, 128)
    halves = jnp.dot(m, jnp.asarray(_pack_weights()),
                     preferred_element_type=jnp.float32).astype(jnp.int32)
    # rows of 8 16-bit half-words -> 4 32-bit words: half 2t = low bits,
    # half 2t+1 = high bits of word (4r + t)
    h = halves.reshape(size // 128, 4, 2)
    w32 = h[:, :, 0] | (h[:, :, 1] << 16)
    return w32.reshape(size // 32 // 128, 128)


@functools.partial(jax.jit, static_argnums=(1, 2))
def hist_device_part(codes: jnp.ndarray, k: int, size: int):
    """Device half of the fast -k job: canonical keys -> sort -> packed
    start words (pre-masked at valid_end). Returns (words, nvalid)."""
    from fastk_tpu.ops.count import fold_invalid, narrow_words
    from fastk_tpu.ops.kmers import canonical_kmers

    words, invalid = canonical_kmers(codes, k, size)
    ninv = jnp.sum(invalid.astype(jnp.int32))
    f = narrow_words(fold_invalid(words, invalid), k)
    s_words = jax.lax.sort(f, num_keys=len(f), is_stable=False)
    starts = jnp.zeros(size, dtype=bool)
    for w in s_words:
        starts = starts | (w != jnp.roll(w, 1))
    starts = starts.at[0].set(True)
    valid_end = jnp.int32(size) - ninv
    starts = starts & (jnp.arange(size, dtype=jnp.int32) < valid_end)
    return pack_starts(starts.astype(jnp.float32), size), valid_end


def hist_batch_fast(codes: jnp.ndarray, k: int, size: int):
    """Drop-in for ops.count.hist_batch on TPU via the run-length walk.

    Returns dict(hist int64[32768] (host-assembled), nvalid int),
    or None when the side list overflowed (caller uses hist_batch)."""
    rows = size // 4096
    if size % 4096 or not available():
        return None
    if rows % 8:
        # sub-8-row blocks are only for the interpreter-mode CI test;
        # every real-TPU size is a multiple of 2^15 positions
        if not _INTERPRET or rows & (rows - 1):
            return None
        block_rows = rows
    else:
        block_rows = 8
        while block_rows < BLOCK_ROWS and rows % (block_rows * 2) == 0:
            block_rows *= 2
    packed, nvalid = hist_device_part(codes, k, size)
    hist_lo, big, meta = _run_walk(packed, rows // block_rows, block_rows,
                                   nvalid)
    return _assemble(hist_lo, big, meta, nvalid)


def _assemble(hist_lo, big, meta, nvalid):
    meta = np.asarray(meta)
    if int(meta[1]):
        return None  # > BIG_CAP huge segments: fall back to bincount
    hist = np.zeros(HIST_HIGH + 1, np.int64)
    hl = np.asarray(hist_lo).astype(np.int64)
    hist[1:BIG_CUT] = hl[1:BIG_CUT]
    nbig = int(meta[0])
    if nbig:
        bb = np.asarray(big)[:nbig]
        hist += np.bincount(np.minimum(bb, HIST_HIGH),
                            minlength=HIST_HIGH + 1).astype(np.int64)
    return dict(hist=hist, nvalid=int(nvalid))
