"""ops.tables device/numpy parity (the tool layer's sorted-table ops)."""

import numpy as np
import pytest

from fastk_tpu.ops import tables as T


def _rand(n, W, seed):
    rng = np.random.default_rng(seed)
    w = rng.integers(0, 1 << 32, size=(n, W), dtype=np.int64
                     ).astype(np.uint32)
    c = rng.integers(1, 100, size=n).astype(np.int64)
    return w, c


@pytest.mark.parametrize("force_device", [False, True])
def test_merge_counted_parity(monkeypatch, force_device):
    if force_device:
        monkeypatch.setattr(T, "DEVICE_MIN_ROWS", 0)
    w1, c1 = _rand(500, 2, 0)
    w2, c2 = _rand(400, 2, 1)
    w2[:100] = w1[:100]  # overlap
    got_w, got_c = T.merge_counted([w1, w2], [c1, c2])
    want_w, want_c = T._merge_np([w1, w2], [c1, c2])
    assert np.array_equal(got_w, want_w)
    assert np.array_equal(got_c, want_c)
    # sorted unique by big-endian byte order
    be = np.ascontiguousarray(got_w.astype(">u4")).view("S8").ravel()
    assert (be[:-1] < be[1:]).all()


@pytest.mark.parametrize("force_device", [False, True])
def test_sort_counted_parity(monkeypatch, force_device):
    if force_device:
        monkeypatch.setattr(T, "DEVICE_MIN_ROWS", 0)
    w, c = _rand(700, 3, 2)
    sw, sc = T.sort_counted(w, c.astype(np.uint16))
    be = np.ascontiguousarray(sw.astype(">u4")).view("S12").ravel()
    assert (be[:-1] <= be[1:]).all()
    # same multiset of rows+counts
    a = np.concatenate([w.astype(np.int64), c[:, None]], axis=1)
    b = np.concatenate([sw.astype(np.int64), sc[:, None].astype(np.int64)],
                       axis=1)
    assert np.array_equal(
        a[np.lexsort(a.T[::-1])], b[np.lexsort(b.T[::-1])])


def test_merge_unique_blocks_want_back():
    """want_back returns each INPUT record's merged (clipped) count in
    input order — the seg-indexed profile spill's count resolution —
    checked against a dict model incl. empty slots, duplicates across
    blocks, and clipping."""
    import jax.numpy as jnp

    from fastk_tpu.ops.count import HIST_HIGH, merge_unique_blocks

    rng = np.random.default_rng(17)
    size = 1 << 10
    n = 700
    keys = rng.integers(0, 50, (n, 2)).astype(np.uint32)  # heavy dups
    counts = rng.integers(1, 20000, n).astype(np.int32)
    counts[5] = 30000
    counts[6] = 30000  # same-key pair may clip
    keys[6] = keys[5]
    w0 = np.full(size, 0xFFFFFFFF, np.uint32)
    w1 = np.full(size, 0xFFFFFFFF, np.uint32)
    cc = np.zeros(size, np.int32)
    w0[:n], w1[:n], cc[:n] = keys[:, 0], keys[:, 1], counts
    merged = merge_unique_blocks(
        (jnp.asarray(w0), jnp.asarray(w1)), jnp.asarray(cc), size,
        want_back=True)
    rec = np.asarray(merged["rec_counts"])[:n]

    totals = {}
    for i in range(n):
        kk = (int(keys[i, 0]), int(keys[i, 1]))
        totals[kk] = totals.get(kk, 0) + int(counts[i])
    want = np.array([min(totals[(int(keys[i, 0]), int(keys[i, 1]))],
                         HIST_HIGH) for i in range(n)])
    assert np.array_equal(rec, want)


def test_compact_table_min_device():
    """compact_table_min keeps >= tmin entries in key order, clipped."""
    import jax.numpy as jnp

    from fastk_tpu.ops.count import HIST_HIGH, compact_table_min

    rng = np.random.default_rng(23)
    size = 1 << 9
    nu = 300
    w0 = np.sort(rng.choice(1 << 20, nu, replace=False).astype(np.uint32))
    counts = rng.integers(1, 40000, nu).astype(np.int32)
    pw = np.full(size, 0xFFFFFFFF, np.uint32)
    pc = np.zeros(size, np.int32)
    pw[:nu], pc[:nu] = w0, counts
    kept = compact_table_min((jnp.asarray(pw),), jnp.asarray(pc), 3)
    nk = int(kept["nkeep"])
    keep = counts >= 3
    assert nk == int(keep.sum())
    assert np.array_equal(np.asarray(kept["words"][0])[:nk], w0[keep])
    assert np.array_equal(np.asarray(kept["counts"])[:nk],
                          np.minimum(counts[keep], HIST_HIGH))
