"""Pallas run-length histogram kernel (ops/histker.py).

The kernel only runs on real TPU; in this CPU suite it executes in Pallas
interpreter mode, which is functional but slow (~2.5 min for the smallest
shape) — so the interpreter test is opt-in via FASTK_TPU_SLOW_TESTS=1.
On-TPU coverage comes from the verify drive: a `fastk -k40` CLI run takes
_count_single_hist -> hist_batch_fast and must be byte-identical to the
oracle golden .hist.

The pure-host pieces (packing layout, histogram assembly, fallback gates)
are always tested.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import fastk_tpu.ops.histker as hk


def test_pack_starts_layout():
    """Bit b of 32-bit word w must be starts[32w + b] for the walk's
    position arithmetic to hold."""
    size = 4096 * 8
    rng = np.random.default_rng(0)
    starts = (rng.random(size) < 0.1).astype(np.float32)
    words = np.asarray(hk.pack_starts(jnp.asarray(starts), size)
                       ).reshape(-1).astype(np.uint32)
    want_idx = np.flatnonzero(starts)
    got_idx = []
    for w_i, w in enumerate(words):
        for b in range(32):
            if (int(w) >> b) & 1:
                got_idx.append(32 * w_i + b)
    assert np.array_equal(np.sort(got_idx), want_idx)


def test_assemble_merges_big_list():
    hist_lo = np.zeros(hk.BIG_CUT + 1, np.int32)
    hist_lo[3] = 7
    hist_lo[hk.BIG_CUT] = 2  # big entries also tally the clip bin
    big = np.zeros(hk.BIG_CAP, np.int32)
    big[0] = 5000
    big[1] = 40000  # already clipped device-side in reality
    meta = np.array([2, 0, 1, 0], np.int32)
    res = hk._assemble(hist_lo, big, meta, 123)
    assert res["nvalid"] == 123
    assert res["hist"][3] == 7
    assert res["hist"][5000] == 1
    assert res["hist"][32767] == 1
    assert res["hist"][hk.BIG_CUT] == 0  # clip bin excluded from hist_lo


def test_assemble_overflow_returns_none():
    meta = np.array([hk.BIG_CAP + 5, 1, 1, 0], np.int32)
    assert hk._assemble(np.zeros(hk.BIG_CUT + 1, np.int32),
                        np.zeros(hk.BIG_CAP, np.int32), meta, 1) is None


def test_fast_path_gates():
    codes = jnp.zeros(64, jnp.uint8)
    # size not a multiple of 4096: clean refusal
    assert hk.hist_batch_fast(codes, 8, 4100) is None


def test_kernel_interpret_small(monkeypatch):
    """Always-on equality of the walk kernel vs hist_batch (interpreter
    mode, smallest block shape) so the gated TPU kernel cannot rot
    unnoticed between libtpu bumps (VERDICT r3 weak-7)."""
    from fastk_tpu.ops.count import hist_batch
    from fastk_tpu.ops.kmers import pad_needed

    monkeypatch.setattr(hk, "_INTERPRET", True)
    K, S = 40, 4096
    rng = np.random.default_rng(1)
    c = rng.integers(0, 4, S + pad_needed(K)).astype(np.uint8)
    c[::211] = 4
    c[S - 40:] = 0  # a long uniform tail exercises the bulk-run paths
    c[S:] = 4
    codes = jnp.asarray(c)
    got = hk.hist_batch_fast(codes, K, S)
    want = hist_batch(codes, K, S)
    assert np.array_equal(got["hist"][1:],
                          np.asarray(want["hist"])[1:].astype(np.int64))
    assert got["nvalid"] == int(want["nvalid"])


@pytest.mark.skipif(not os.environ.get("FASTK_TPU_SLOW_TESTS"),
                    reason="interpreter-mode kernel is slow at the real "
                           "block shape; opt in with FASTK_TPU_SLOW_TESTS=1")
def test_kernel_interpret_matches_hist_batch(monkeypatch):
    from fastk_tpu.ops.count import hist_batch
    from fastk_tpu.ops.kmers import pad_needed

    monkeypatch.setattr(hk, "_INTERPRET", True)
    K, S = 40, 1 << 15
    rng = np.random.default_rng(0)
    c = rng.integers(0, 4, S + pad_needed(K)).astype(np.uint8)
    c[::211] = 4
    c[S:] = 4
    codes = jnp.asarray(c)
    got = hk.hist_batch_fast(codes, K, S)
    want = hist_batch(codes, K, S)
    assert np.array_equal(got["hist"][1:],
                          np.asarray(want["hist"])[1:].astype(np.int64))
    assert got["nvalid"] == int(want["nvalid"])
