"""CLI tool tests: output parity with the reference tools (golden text) and
file-set management behaviors."""

import io
import os
import shutil
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def run_tool(mod, argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = mod.main(argv)
    return rc, buf.getvalue()


def golden_text(*parts):
    with open(os.path.join(GOLDEN, *parts)) as f:
        return f.read()


# ---------------------------------------------------------------------------
# Histex / Tabex / Profex parity
# ---------------------------------------------------------------------------

HIST = os.path.join(GOLDEN, "small_k40", "small.hist")
KTAB = os.path.join(GOLDEN, "tiny_k12_t1", "tiny.ktab")
PROF = os.path.join(GOLDEN, "tiny_k12_t1", "tiny.prof")


@pytest.mark.parametrize("args,gold", [
    ([HIST], "histex_default.txt"),
    (["-k", "-h2:50", HIST], "histex_k_h2_50.txt"),
    (["-A", HIST], "histex_A.txt"),
    (["-G", HIST], "histex_G.txt"),
])
def test_histex_parity(args, gold):
    from fastk_tpu.tools import histex

    rc, out = run_tool(histex, args)
    assert rc == 0
    assert out == golden_text("small_k40", gold)


@pytest.mark.parametrize("args,gold", [
    ([KTAB], "tabex_all.txt"),
    (["-A", KTAB, "acgt"], "tabex_A_acgt.txt"),
    ([KTAB, "100-120"], "tabex_100_120.txt"),
    (["-t5", KTAB], "tabex_t5.txt"),
])
def test_tabex_parity(args, gold):
    from fastk_tpu.tools import tabex

    rc, out = run_tool(tabex, args)
    assert rc == 0
    assert out == golden_text("tiny_k12_t1", gold)


def test_tabex_check():
    from fastk_tpu.tools import tabex

    rc, out = run_tool(tabex, ["-C", KTAB])
    assert rc == 0 and "Table is OK" in out


@pytest.mark.parametrize("args,gold", [
    ([PROF, "1-20"], "profex_1_20.txt"),
    (["-z", PROF, "5"], "profex_z_5.txt"),
    (["-A", PROF, "3"], "profex_A_3.txt"),
])
def test_profex_parity(args, gold):
    from fastk_tpu.tools import profex

    rc, out = run_tool(profex, args)
    assert rc == 0
    assert out == golden_text("tiny_k12_t1", gold)


# ---------------------------------------------------------------------------
# fastk CLI end-to-end
# ---------------------------------------------------------------------------

def test_fastk_cli_end_to_end(tmp_path):
    from fastk_tpu.tools import fastk

    inp = os.path.join(GOLDEN, "inputs", "tiny.fasta")
    out = str(tmp_path / "tiny")
    rc = fastk.main([f"-k12", "-t1", "-p", f"-N{out}", "-T2", inp])
    assert rc == 0
    with open(out + ".hist", "rb") as f, \
         open(os.path.join(GOLDEN, "tiny_k12_t1", "tiny.hist"), "rb") as g:
        assert f.read() == g.read()
    # table + profiles readable and consistent with goldens
    from fastk_tpu.formats.ktab import read_ktab
    from fastk_tpu.formats.prof import ProfileIndex

    t = read_ktab(out)
    tg = read_ktab(os.path.join(GOLDEN, "tiny_k12_t1", "tiny"))
    assert np.array_equal(t.packed, tg.packed)
    assert np.array_equal(t.counts, tg.counts)
    pi, pg = ProfileIndex(out), ProfileIndex(os.path.join(GOLDEN, "tiny_k12_t1", "tiny"))
    assert pi.nreads == pg.nreads
    for i in range(pi.nreads):
        assert np.array_equal(pi.fetch(i), pg.fetch(i))


def test_fastk_cli_bc(tmp_path):
    """-bc trims read prefixes; counting must see only the suffix."""
    from fastk_tpu.tools import fastk
    from fastk_tpu.formats.hist import read_histogram

    inp = tmp_path / "r.fasta"
    inp.write_text(">r0\n" + "acgt" * 10 + "\n")
    out = str(tmp_path / "o")
    rc = fastk.main(["-k12", "-bc8", f"-N{out}", str(inp)])
    assert rc == 0
    h = read_histogram(out)
    # 40-8=32 bases -> 21 12-mers
    assert h.total_instances() == 21


# ---------------------------------------------------------------------------
# fastrm / fastmv / fastcp
# ---------------------------------------------------------------------------

def _make_set(tmp_path, name="x"):
    from fastk_tpu.formats.prof import write_prof
    from fastk_tpu.formats.ktab import KmerTable, write_ktab, pack_kmer
    from fastk_tpu.formats.hist import Histogram, write_histogram

    base = str(tmp_path / name)
    write_prof(base, 12, [np.array([1, 2, 3], dtype=np.uint16)], nparts=2)
    t = KmerTable(12, 1, pack_kmer("acgtacgtacgt")[None, :],
                  np.array([5], dtype=np.uint16))
    write_ktab(base, t, nparts=2)
    h = Histogram.from_clipped_counts(12, np.array([5]))
    write_histogram(base, h)
    return base


def test_fastrm(tmp_path):
    from fastk_tpu.tools import fastrm

    base = _make_set(tmp_path)
    assert (tmp_path / ".x.ktab.1").exists()
    rc = fastrm.main([base + ".ktab"])
    assert rc == 0
    assert not (tmp_path / "x.ktab").exists()
    assert not (tmp_path / ".x.ktab.1").exists()
    assert (tmp_path / "x.prof").exists()  # other sets untouched
    rc = fastrm.main([base])  # remove remaining sets by root
    assert rc == 0
    assert not (tmp_path / "x.prof").exists()
    assert not (tmp_path / ".x.pidx.1").exists()
    assert not (tmp_path / "x.hist").exists()


def test_fastmv_fastcp(tmp_path):
    from fastk_tpu.tools import fastcp, fastmv
    from fastk_tpu.formats.prof import ProfileIndex

    base = _make_set(tmp_path)
    dst = tmp_path / "sub"
    dst.mkdir()
    rc = fastcp.main([base + ".prof", str(dst)])
    assert rc == 0
    pi = ProfileIndex(str(dst / "x"))
    assert pi.nreads == 1 and pi.fetch(0).tolist() == [1, 2, 3]
    rc = fastmv.main([base + ".prof", str(tmp_path / "y.prof")])
    assert rc == 0
    assert not (tmp_path / "x.prof").exists()
    assert not (tmp_path / ".x.prof.1").exists()
    pi = ProfileIndex(str(tmp_path / "y"))
    assert pi.fetch(0).tolist() == [1, 2, 3]
