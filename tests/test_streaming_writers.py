"""Streaming writers (KtabWriter / ProfWriter / bulk encoder) must be
byte-identical to the buffered in-memory writers."""

import filecmp
import os

import numpy as np
import pytest

from fastk_tpu.formats.ktab import (
    KmerTable, KtabWriter, kbytes, write_ktab,
)
from fastk_tpu.formats.prof import (
    ProfWriter, encode_profile, encode_profiles_bulk, decode_profile,
    write_prof,
)


def _rand_table(n, k, seed=0):
    rng = np.random.default_rng(seed)
    kb = kbytes(k)
    packed = rng.integers(0, 256, (n, kb), dtype=np.uint8).astype(np.uint8)
    if k % 4:
        packed[:, -1] &= 0xFF << (2 * (4 - k % 4)) & 0xFF
    view = packed.view(f"S{kb}").ravel()
    order = np.argsort(view)
    packed = packed[order]
    keep = np.ones(n, dtype=bool)
    keep[1:] = view[order][1:] != view[order][:-1]
    packed = packed[keep]
    counts = rng.integers(1, 1000, len(packed)).astype(np.uint16)
    return KmerTable(k, 1, packed, counts)


@pytest.mark.parametrize("k,n,nparts", [(12, 500, 1), (21, 3000, 4),
                                        (40, 10000, 3), (31, 1, 2),
                                        # k <= 4: single-byte keys
                                        (4, 100, 2), (3, 20, 1)])
def test_ktab_writer_matches_write_ktab(tmp_path, k, n, nparts):
    t = _rand_table(n, k, seed=k)
    a = str(tmp_path / "mem")
    b = str(tmp_path / "stream")
    write_ktab(a, t, nparts=nparts)
    w = KtabWriter(b, k, 1, nparts=nparts)
    # feed in uneven chunks
    cuts = [0, len(t) // 3, len(t) // 3 + 1, len(t)]
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        w.add(t.packed[lo:hi], t.counts[lo:hi])
    w.close()
    assert _cmp_bytes(a + ".ktab", b + ".ktab")
    for p in range(1, nparts + 1):
        assert _cmp_bytes(str(tmp_path / f".mem.ktab.{p}"),
                          str(tmp_path / f".stream.ktab.{p}"))
    assert not os.path.exists(b + ".ktab.tmp")


@pytest.mark.parametrize("spill", [0, 6000])
def test_ktab_writer_spill_equivalence(tmp_path, spill):
    """The disk-spool path (forced by a tiny budget) writes bytes identical
    to the in-RAM path, including a mid-stream RAM->spool handoff."""
    k, nparts = 21, 3
    t = _rand_table(4000, k, seed=5)
    a = str(tmp_path / "ram")
    b = str(tmp_path / "spill")
    write_ktab(a, t, nparts=nparts)
    w = KtabWriter(b, k, 1, nparts=nparts, spill_bytes=spill)
    step = max(1, len(t) // 7)
    for lo in range(0, len(t), step):
        w.add(t.packed[lo: lo + step], t.counts[lo: lo + step])
    assert w._tmp is not None  # the budget actually forced a spill
    w.close()
    assert _cmp_bytes(a + ".ktab", b + ".ktab")
    for p in range(1, nparts + 1):
        assert _cmp_bytes(str(tmp_path / f".ram.ktab.{p}"),
                          str(tmp_path / f".spill.ktab.{p}"))
    assert not os.path.exists(b + ".ktab.tmp")


def _cmp_bytes(a, b):
    return filecmp.cmp(a, b, shallow=False)


def _tricky_profiles(rng):
    profs = [
        np.zeros(0, np.uint16),
        np.array([5], np.uint16),
        np.array([300], np.uint16),
        np.full(200, 7, np.uint16),          # zero runs > 63
        np.full(63 * 3 + 1, 1000, np.uint16),  # run length multiple of 63
        np.array([0, 31, 0, 32, 100, 69, 32000, 10, 32767, 0], np.uint16),
    ]
    for n in (1, 2, 64, 500):
        profs.append(rng.integers(0, 0x8000, n).astype(np.uint16))
    # mostly-flat with occasional jumps (realistic)
    base = rng.integers(0, 50, 1000).astype(np.uint16)
    base[::97] = rng.integers(0, 0x8000, len(base[::97]))
    profs.append(base)
    return profs


def test_bulk_encoder_matches_scalar():
    rng = np.random.default_rng(1)
    profs = _tricky_profiles(rng)
    flat = np.concatenate([p for p in profs if len(p)] or
                          [np.zeros(0, np.uint16)])
    boff = np.zeros(len(profs), np.int64)
    plen = np.array([len(p) for p in profs], np.int64)
    np.cumsum(plen[:-1], out=boff[1:])
    blob, offs = encode_profiles_bulk(flat, boff, plen)
    ref = b"".join(encode_profile(p) for p in profs)
    assert bytes(blob) == ref
    ends = np.cumsum([len(encode_profile(p)) for p in profs])
    assert np.array_equal(offs, ends)
    # and it round-trips
    lo = 0
    for p, hi in zip(profs, offs):
        dec = decode_profile(np.asarray(blob[lo:hi]))
        assert np.array_equal(dec, p)
        lo = int(hi)


@pytest.mark.parametrize("nparts", [1, 3, 7])
def test_prof_writer_matches_write_prof(tmp_path, nparts):
    rng = np.random.default_rng(2)
    profs = _tricky_profiles(rng) * 3
    a = str(tmp_path / "mem")
    b = str(tmp_path / "stream")
    c = str(tmp_path / "block")
    write_prof(a, 21, profs, nparts=nparts)

    w = ProfWriter(b, 21, len(profs), nparts=nparts)
    for p in profs:
        w.add(p)
    w.close()

    # block path: bulk-encode all, add in a few blocks spanning part cuts
    flat = np.concatenate([p for p in profs if len(p)] or
                          [np.zeros(0, np.uint16)])
    boff = np.zeros(len(profs), np.int64)
    plen = np.array([len(p) for p in profs], np.int64)
    np.cumsum(plen[:-1], out=boff[1:])
    blob, offs = encode_profiles_bulk(flat, boff, plen)
    w2 = ProfWriter(c, 21, len(profs), nparts=nparts)
    step = 7
    prev_bytes = 0
    for i in range(0, len(profs), step):
        j = min(len(profs), i + step)
        hi = int(offs[j - 1])
        w2.add_block(np.asarray(blob[prev_bytes:hi]),
                     offs[i:j] - prev_bytes)
        prev_bytes = hi
    w2.close()

    real_parts = min(nparts, len(profs))
    assert _cmp_bytes(a + ".prof", b + ".prof")
    assert _cmp_bytes(a + ".prof", c + ".prof")
    for p in range(1, real_parts + 1):
        for ext in (".prof", ".pidx"):
            assert _cmp_bytes(str(tmp_path / f".mem{ext}.{p}"),
                              str(tmp_path / f".stream{ext}.{p}")), (ext, p)
            assert _cmp_bytes(str(tmp_path / f".mem{ext}.{p}"),
                              str(tmp_path / f".block{ext}.{p}")), (ext, p)


def test_prof_writer_empty(tmp_path):
    b = str(tmp_path / "empty")
    w = ProfWriter(b, 17, 0, nparts=4)
    w.close()
    from fastk_tpu.formats.prof import ProfileIndex

    pi = ProfileIndex(b)
    assert pi.nreads == 0
