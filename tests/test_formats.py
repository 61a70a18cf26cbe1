"""Round-trip tests for the .hist/.ktab/.prof codecs."""

import numpy as np
import pytest

from fastk_tpu.formats import hist as H
from fastk_tpu.formats import ktab as K
from fastk_tpu.formats import prof as P


# ---------------------------------------------------------------------------
# Histogram
# ---------------------------------------------------------------------------

def test_hist_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    counts = rng.integers(1, 5000, size=200_000)
    counts[:10] = 32767 + rng.integers(0, 100000, size=10)  # clipped tail
    overflow = int(np.maximum(counts - 32767, 0).sum())
    h = H.Histogram.from_clipped_counts(40, np.minimum(counts, 32767), overflow)
    path = str(tmp_path / "x")
    H.write_histogram(path, h)
    h2 = H.read_histogram(path)
    assert h2 == h
    assert h2.total_instances() == int(counts.sum())
    # file size invariant (reference: README.md:952-953)
    assert (tmp_path / "x.hist").stat().st_size == 262_164


def test_hist_unique_instance_toggle():
    counts = np.array([1, 1, 2, 3, 3, 3, 32767])
    h = H.Histogram.from_clipped_counts(21, counts)
    inst = h.as_instance()
    assert inst[2] == 2  # one unique k-mer of freq 2 -> 2 instances
    assert inst[3] == 9
    back = inst.as_unique()
    assert back == h


def test_hist_modify_subrange():
    counts = np.array([1, 2, 2, 5, 5, 5, 9])
    h = H.Histogram.from_clipped_counts(21, counts)
    m = h.modified(2, 6)
    # low bin absorbs freq<=2 uniques: U(1)=1 + U(2)=2
    assert m[2] == 3
    # high bin absorbs freq>=6: U(9)=1
    assert m[6] == 1
    assert m.total_instances() == int(counts.sum())


# ---------------------------------------------------------------------------
# K-mer packing and table
# ---------------------------------------------------------------------------

def test_pack_unpack():
    s = "acgtacgtacgttgca"
    p = K.pack_kmer(s)
    assert K.kmer_to_string(p, len(s)) == s
    # 0xc6 encodes tacg (reference: README.md table spec)
    assert K.pack_kmer("tacg")[0] == 0xC6


def test_pack_partial_byte_zeroed():
    p = K.pack_kmer("ttttt")  # k=5 -> 2 bytes, low 6 bits of byte 2 zero
    assert p[0] == 0xFF and p[1] == 0xC0


def _random_table(rng, n, kmer, minval=1):
    codes = rng.integers(0, 4, size=(n, kmer), dtype=np.uint8)
    packed = K.pack_codes(codes)
    view = packed.view(f"S{packed.shape[1]}").ravel()
    order = np.argsort(view, kind="stable")
    packed = packed[order]
    keep = np.ones(len(packed), dtype=bool)
    keep[1:] = view[order][1:] != view[order][:-1]
    packed = packed[keep]
    counts = rng.integers(minval, 1000, size=len(packed)).astype(np.uint16)
    return K.KmerTable(kmer, minval, packed, counts)


@pytest.mark.parametrize("kmer,nparts", [(11, 1), (20, 3), (40, 4), (16, 2)])
def test_ktab_roundtrip(tmp_path, kmer, nparts):
    rng = np.random.default_rng(kmer)
    t = _random_table(rng, 5000, kmer)
    assert t.check_sorted()
    path = str(tmp_path / "t")
    K.write_ktab(path, t, nparts=nparts)
    t2 = K.read_ktab(path)
    assert t2.kmer == kmer
    assert np.array_equal(t2.packed, t.packed)
    assert np.array_equal(t2.counts, t.counts)


def test_ktab_stream(tmp_path):
    rng = np.random.default_rng(7)
    t = _random_table(rng, 3000, 20)
    path = str(tmp_path / "t")
    K.write_ktab(path, t, nparts=3)
    s = K.KmerStream(path)
    assert s.nels == len(t)
    got = [(bytes(p), c) for p, c in s]
    want = [(bytes(t.packed[i]), int(t.counts[i])) for i in range(len(t))]
    assert got == want
    # goto by index
    s.goto_index(1234)
    p, c = s.current_entry()
    assert bytes(p) == bytes(t.packed[1234])
    # goto by k-mer
    s.goto_kmer(t.kmer_string(42))
    assert s.idx == 42
    # bulk range
    pk, ct = s.read_range(100, 400)
    assert np.array_equal(pk, t.packed[100:400])
    assert np.array_equal(ct, t.counts[100:400])


def test_ktab_find():
    rng = np.random.default_rng(3)
    t = _random_table(rng, 100, 13)
    from fastk_tpu.ops.canonical import canonical_packed

    canon = canonical_packed(t.packed, t.kmer)
    keep = np.flatnonzero(
        (canon.view(f"S{canon.shape[1]}") == t.packed.view(f"S{t.packed.shape[1]}")).ravel()
    )
    t = K.KmerTable(t.kmer, 1, t.packed[keep], t.counts[keep])
    for i in [0, len(t) // 2, len(t) - 1]:
        assert t.find(t.kmer_string(i)) == i
    assert t.find("a" * 13) is None or t.kmer_string(t.find("a" * 13)) == "a" * 13


# ---------------------------------------------------------------------------
# Profiles
# ---------------------------------------------------------------------------

def _scalar_decode(buf):
    """Independent scalar re-implementation of the reference decoder
    (libfastk.c:1710-1805) used to cross-check the vectorized codec."""
    b = list(buf)
    if not b:
        return np.zeros(0, dtype=np.uint16)
    i = 0
    x = b[i]; i += 1
    if x & 0x80:
        d = ((x & 0x7F) << 8) | b[i]; i += 1
    else:
        d = x
    out = [d]
    while i < len(b):
        x = b[i]; i += 1
        if (x & 0xC0) == 0:
            out.extend([d] * x)
        elif x & 0x80:
            v = ((x & 0x7F) << 8) | b[i]; i += 1
            d = (d + v) & 0x7FFF
            out.append(d)
        else:
            if x & 0x20:
                d = (d + (x & 0x1F) - 32) & 0xFFFF
            else:
                d = (d + (x & 0x1F)) & 0xFFFF
            out.append(d)
    return np.array(out, dtype=np.uint16)


@pytest.mark.parametrize("seed", range(5))
def test_profile_codec_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 3000))
    # mix of plateaus (zero runs), small steps, large jumps
    steps = rng.choice(
        [0, 0, 0, 0, 1, -1, 7, -7, 31, -31, 32, -32, 500, -500, 20000, -20000],
        size=n - 1,
    )
    prof = np.clip(np.cumsum(np.concatenate([[100], steps])), 0, 32767).astype(np.uint16)
    enc = P.encode_profile(prof)
    assert np.array_equal(P.decode_profile(enc), prof)
    assert np.array_equal(_scalar_decode(enc), prof)


def test_profile_codec_edges():
    for prof in [
        [0], [127], [128], [32767],
        [5] * 200,               # long zero run (>63 chunks)
        [5] * 63, [5] * 64, [5] * 127,
        [0, 31], [0, 32], [31, 0], [32, 0],
        [100, 20000, 100],       # big jumps both ways
        [32767, 0, 32767],
    ]:
        a = np.array(prof, dtype=np.uint16)
        enc = P.encode_profile(a)
        assert np.array_equal(P.decode_profile(enc), a), prof
        assert np.array_equal(_scalar_decode(enc), a), prof


def test_prof_fileset_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    profs = []
    for _ in range(57):
        n = int(rng.integers(0, 400))
        profs.append(rng.integers(0, 32768, size=n).astype(np.uint16))
    path = str(tmp_path / "p")
    P.write_prof(path, 40, profs, nparts=4)
    pi = P.ProfileIndex(path)
    assert pi.nreads == 57 and pi.kmer == 40 and pi.nparts == 4
    for i, want in enumerate(profs):
        assert np.array_equal(pi.fetch(i), want)
