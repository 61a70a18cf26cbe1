"""Streamed (windowed) fastmerge/logex must equal the in-memory versions,
byte-for-byte on disk, even when windows are tiny (forcing many windows and
cut keys inside shared key runs)."""

import filecmp
import os

import numpy as np
import pytest

from fastk_tpu.formats.hist import Histogram, read_histogram, write_histogram
from fastk_tpu.formats.ktab import KmerTable, kbytes, read_ktab, write_ktab


def _rand_table(n, k, seed):
    rng = np.random.default_rng(seed)
    kb = kbytes(k)
    packed = rng.integers(0, 4, (n, kb), dtype=np.uint8)  # few distinct ->
    # heavy cross-table key overlap
    if k % 4:
        packed[:, -1] &= (0xFF << (2 * (4 - k % 4))) & 0xFF
    view = np.ascontiguousarray(packed).view(f"S{kb}").ravel()
    uv, idx = np.unique(view, return_index=True)
    packed = packed[np.sort(idx)]
    view = np.ascontiguousarray(packed).view(f"S{kb}").ravel()
    order = np.argsort(view)
    packed = packed[order]
    counts = rng.integers(1, 30000, len(packed)).astype(np.uint16)
    return KmerTable(k, 1, packed, counts)


@pytest.fixture(scope="module")
def tabs(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_tools")
    tables = [_rand_table(900 + 137 * i, 16, seed=i) for i in range(3)]
    paths = []
    for i, t in enumerate(tables):
        p = str(d / f"t{i}")
        write_ktab(p, t, nparts=2)
        paths.append(p)
    return d, tables, paths


@pytest.mark.parametrize("window", [64, 1 << 20])
@pytest.mark.parametrize("slice_spec", [None, (1, 3), (2, 3), (3, 3)])
def test_fastmerge_streamed_matches(tabs, tmp_path, window, slice_spec):
    """Streamed fastmerge == in-memory merge in CONTENT; its file layout is
    the reference Fastmerge's (ibyte from the pre-merge source-size sum,
    part cuts at pivot quantiles — Fastmerge.c:748-812), which may cut
    parts differently than write_ktab's equal-entry splits."""
    from fastk_tpu.tools.fastmerge import (_slice_ibyte, merge_streamed,
                                           merge_tables)

    d, tables, paths = tabs
    mem = merge_tables(tables, slice_spec)
    a = str(tmp_path / "mem")
    write_ktab(a, mem, nparts=3)
    write_histogram(a, Histogram.from_clipped_counts(
        mem.kmer, mem.counts.astype(np.int64)))

    b = str(tmp_path / "st")
    assert merge_streamed(paths, b, 3, True, True, slice_spec,
                          window=window) == 0
    got = read_ktab(b)
    assert np.array_equal(got.packed, mem.packed)
    assert np.array_equal(got.counts, mem.counts)
    assert read_histogram(a) == read_histogram(b)
    # stub fields: same prefix width (both sums land in the same ibyte
    # bucket here) -> identical stub bytes even though part cuts differ
    assert _slice_ibyte(sum(len(t) for t in tables)) == 1
    assert filecmp.cmp(a + ".ktab", b + ".ktab", shallow=False)
    # every part parses and the cut count matches the stub
    from fastk_tpu.formats.ktab import KmerStream

    s = KmerStream(b)
    assert s.nels == len(mem.counts)


@pytest.mark.parametrize("window", [64])
def test_logex_streamed_matches(tabs, tmp_path, window):
    from fastk_tpu.algebra import logex_apply, logex_apply_streamed

    d, tables, paths = tabs
    exprs = [("U", "A|+B|+C"), ("I", "A&.B"), ("D", "A-C"),
             ("M", "A[2-100]")]
    mem = logex_apply(exprs, tables, hist_range=(1, 100))

    os.chdir(tmp_path)
    named = [(str(tmp_path / n), e) for n, e in exprs]
    got = logex_apply_streamed(named, paths, hist_range=(1, 100),
                               out_nparts=2, window=window)
    for (name, t_mem, h_mem), (name2, h_got) in zip(mem, got):
        t_got = read_ktab(str(tmp_path / name))
        assert np.array_equal(t_mem.packed, t_got.packed), name
        assert np.array_equal(t_mem.counts, t_got.counts), name
        assert h_mem == h_got, name


def test_fastmerge_cli_accepts_suffixed_sources(tabs, tmp_path, monkeypatch):
    """USAGE advertises <source>[.hist|.ktab]; suffixed roots must open."""
    from fastk_tpu.tools.fastmerge import main

    d, tables, paths = tabs
    out = str(tmp_path / "m")
    rc = main(["-t", out] + [p + ".ktab" for p in paths])
    assert rc == 0
    got = read_ktab(out)
    assert len(got) > 0


@pytest.mark.parametrize("slice_spec", [(1, 3), (2, 3)])
def test_fastmerge_node_cache(tabs, tmp_path, slice_spec):
    """-P copies only each source's slice byte range to local disk
    (Open_Kmer_Cache, libfastk.c:1056-1139): output identical, cache
    directory cleaned up."""
    import glob

    from fastk_tpu.tools.fastmerge import merge_streamed

    d, tables, paths = tabs
    a = str(tmp_path / "plain")
    b = str(tmp_path / "cached")
    assert merge_streamed(paths, a, 3, True, True, slice_spec) == 0
    assert merge_streamed(paths, b, 3, True, True, slice_spec,
                          cache_dir=str(tmp_path)) == 0
    ta, tb = read_ktab(a), read_ktab(b)
    assert np.array_equal(ta.packed, tb.packed)
    assert np.array_equal(ta.counts, tb.counts)
    assert read_histogram(a) == read_histogram(b)
    assert not glob.glob(str(tmp_path / "fastmerge.P.*"))


ALL_SHAPES = [
    ("XU", "A|+B|+C"), ("XI", "A&.B&.C"), ("XD", "(A-B)-C"),
    ("XX", "A^B"), ("XN", "#(A|B)"), ("XM1", "A|<B"), ("XM2", "A|>B"),
    ("XM3", "A|*B"), ("XM4", "A&-B"), ("XF", "A[5-200]|+B[2-]"),
    ("XG", "A{40-60}"), ("XC", "(A&+B)[10-3000]{20-80}"),
    ("XP", "#A|+#B|+#C"),
]


def test_logex_fused_all_shapes(tabs, tmp_path):
    """Every expression-grammar shape through the streamed path (the
    fused native per-key evaluator, fk_logex_windows) must equal the
    in-memory evaluator: tables, histograms, boundary instance sums."""
    from fastk_tpu.algebra import logex_apply, logex_apply_streamed

    d, tables, paths = tabs
    mem = logex_apply(ALL_SHAPES, tables, hist_range=(2, 120))
    named = [(str(tmp_path / n), e) for n, e in ALL_SHAPES]
    got = logex_apply_streamed(named, paths, hist_range=(2, 120),
                               out_nparts=2, window=64)
    for (name, t_mem, h_mem), (_, h_got) in zip(mem, got):
        t_got = read_ktab(str(tmp_path / name))
        assert np.array_equal(t_mem.packed, t_got.packed), name
        assert np.array_equal(t_mem.counts, t_got.counts), name
        assert h_mem == h_got, name


def test_logex_fused_matches_python_fallback(tabs, tmp_path, monkeypatch):
    """The no-native windowed-numpy path and the fused native path must
    produce identical file-sets (guards both against drift)."""
    from fastk_tpu.algebra import logex_apply_streamed

    d, tables, paths = tabs
    exprs = [("Y1", "A&.B"), ("Y2", "A-B"), ("Y3", "A{30-70}[3-]")]
    nat = logex_apply_streamed(
        [(str(tmp_path / ("n" + n)), e) for n, e in exprs], paths,
        hist_range=(1, 50), out_nparts=2, window=128)
    import fastk_tpu.algebra as algebra_mod

    monkeypatch.setattr("fastk_tpu.native.load", lambda: None)
    pyr = logex_apply_streamed(
        [(str(tmp_path / ("p" + n)), e) for n, e in exprs], paths,
        hist_range=(1, 50), out_nparts=2, window=128)
    for (n_name, n_h), (p_name, p_h) in zip(nat, pyr):
        tn = read_ktab(n_name)
        tp = read_ktab(p_name)
        assert np.array_equal(tn.packed, tp.packed)
        assert np.array_equal(tn.counts, tp.counts)
        assert n_h == p_h


def test_logex_hist_only_fused(tabs, tmp_path):
    """-H (histogram only, no table) through the fused engine."""
    from fastk_tpu.algebra import logex_apply, logex_apply_streamed

    d, tables, paths = tabs
    mem = logex_apply([("H", "A|+B")], tables, hist_range=(1, 100))
    got = logex_apply_streamed([(str(tmp_path / "H"), "A|+B")], paths,
                               hist_range=(1, 100), do_table=False,
                               window=64)
    assert got[0][1] == mem[0][2]
    assert not os.path.exists(str(tmp_path / "H") + ".ktab")


def test_logex_threaded_matches_serial(tabs, tmp_path):
    """nthreads > 1 splits output part ranges across worker threads; the
    resulting file-sets must be byte-identical to the serial run (same
    cut keys => same parts)."""
    import filecmp as fc

    from fastk_tpu.algebra import logex_apply_streamed

    d, tables, paths = tabs
    exprs = [("T1U", "A|+B|+C"), ("T1I", "A&.B"), ("T1F", "A[3-500]{20-80}")]
    ser = logex_apply_streamed(
        [(str(tmp_path / n), e) for n, e in exprs], paths,
        hist_range=(1, 90), out_nparts=3, window=64, nthreads=1)
    par = logex_apply_streamed(
        [(str(tmp_path / ("p" + n)), e) for n, e in exprs], paths,
        hist_range=(1, 90), out_nparts=3, window=64, nthreads=3)
    for (sn, sh), (pn, ph) in zip(ser, par):
        assert sh == ph
        assert fc.cmp(sn + ".ktab", pn + ".ktab", shallow=False)
        for p in range(1, 4):
            a = os.path.join(os.path.dirname(sn),
                             f".{os.path.basename(sn)}.ktab.{p}")
            b = os.path.join(os.path.dirname(pn),
                             f".{os.path.basename(pn)}.ktab.{p}")
            assert fc.cmp(a, b, shallow=False), (sn, p)


@pytest.mark.parametrize("slice_spec", [None, (2, 3)])
def test_fastmerge_threaded_matches_serial(tabs, tmp_path, slice_spec):
    import filecmp as fc

    from fastk_tpu.tools.fastmerge import merge_streamed

    d, tables, paths = tabs
    a = str(tmp_path / "ser")
    b = str(tmp_path / "par")
    assert merge_streamed(paths, a, 3, True, True, slice_spec,
                          window=64, nthreads=1) == 0
    assert merge_streamed(paths, b, 3, True, True, slice_spec,
                          window=64, nthreads=3) == 0
    assert fc.cmp(a + ".ktab", b + ".ktab", shallow=False)
    assert fc.cmp(a + ".hist", b + ".hist", shallow=False)
    for p in range(1, 4):
        assert fc.cmp(str(tmp_path / f".ser.ktab.{p}"),
                      str(tmp_path / f".par.ktab.{p}"), shallow=False), p


def test_logex_sum_union_fast_path(tabs, tmp_path):
    """`X = A|+B|+C` without -h takes the fused fastmerge window engine;
    the output table must equal the generic evaluator's."""
    from fastk_tpu.algebra import logex_apply, logex_apply_streamed

    d, tables, paths = tabs
    mem = logex_apply([("U", "A|+B|+C")], tables)
    got = logex_apply_streamed([(str(tmp_path / "U"), "A|+B|+C")], paths,
                               out_nparts=2)
    assert got[0][1] is None
    t_got = read_ktab(str(tmp_path / "U"))
    assert np.array_equal(mem[0][1].packed, t_got.packed)
    assert np.array_equal(mem[0][1].counts, t_got.counts)
