"""fill_forward (the gather-free segment broadcast) edge cases."""

import numpy as np
import jax.numpy as jnp

from fastk_tpu.ops.count import fill_forward


def _ff(markers, values):
    size = len(markers)
    out = fill_forward(jnp.asarray(markers), jnp.asarray(values, jnp.int32),
                       size)
    return np.asarray(out)


def _ref(markers, values):
    out = np.empty(len(markers), np.int64)
    cur = -1
    for i, (m, v) in enumerate(zip(markers, values)):
        if m:
            cur = v
        out[i] = cur
    return out


def test_basic():
    m = np.array([1, 0, 0, 1, 0, 1, 0, 0], bool)
    v = np.array([5, 9, 9, 7, 9, 0, 9, 9])
    assert np.array_equal(_ff(m, v), _ref(m, v))


def test_no_marker_prefix():
    m = np.array([0, 0, 1, 0], bool)
    v = np.array([1, 2, 3, 4])
    assert np.array_equal(_ff(m, v), [-1, -1, 3, 3])


def test_all_markers_and_none():
    m1 = np.ones(16, bool)
    v = np.arange(16)
    assert np.array_equal(_ff(m1, v), v)
    m0 = np.zeros(16, bool)
    assert np.array_equal(_ff(m0, v), np.full(16, -1))


def test_long_runs_random():
    rng = np.random.default_rng(0)
    m = rng.random(1 << 12) < 0.01
    v = rng.integers(0, 32768, size=1 << 12)
    assert np.array_equal(_ff(m, v), _ref(m, v))


def test_single_element():
    assert np.array_equal(_ff(np.array([True]), np.array([7])), [7])
    assert np.array_equal(_ff(np.array([False]), np.array([7])), [-1])


# --- next_start_after (the row-decomposed reverse-cummin scan) ---

def _nsa_ref(starts):
    size = len(starts)
    out = np.empty(size, np.int64)
    nxt = size
    for i in range(size - 1, -1, -1):
        out[i] = nxt
        if starts[i]:
            nxt = i
    return out


def test_next_start_after_sizes():
    """Exact at sizes hitting the (64, C) row path, the flat fallback
    (size % 64 != 0 or C < 64), and degenerate start patterns."""
    from fastk_tpu.ops.count import next_start_after

    rng = np.random.default_rng(11)
    for size in (1, 7, 63, 64, 96, 4096, 4160, 32768, 32768 + 64, 131072):
        for p in (0.0, 1.0, 0.2):
            starts = rng.random(size) < p
            starts[0] = True
            got = np.asarray(next_start_after(jnp.asarray(starts), size))
            assert np.array_equal(got, _nsa_ref(starts)), (size, p)
