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
