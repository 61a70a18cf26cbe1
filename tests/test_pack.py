"""Packed host<->device transfer round-trip."""

import numpy as np

from fastk_tpu.ops.pack import pack_stream, unpack_stream


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 10_001, dtype=np.uint8)
    codes[rng.integers(0, len(codes), 37)] = 4
    packed, exc = pack_stream(codes)
    got = np.asarray(unpack_stream(packed, exc, len(codes)))
    assert np.array_equal(got, codes)


def test_pack_no_exceptions():
    codes = np.array([0, 1, 2, 3, 3, 2, 1, 0, 1], dtype=np.uint8)
    packed, exc = pack_stream(codes)
    assert (exc == 0xFFFFFFFF).all()
    got = np.asarray(unpack_stream(packed, exc, len(codes)))
    assert np.array_equal(got, codes)
