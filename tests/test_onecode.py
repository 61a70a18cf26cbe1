"""1-code (-1a) ASCII exports of histex/tabex/profex.

The reference writes binary 1-code (ONElib); we emit the equivalent ASCII
form, so tests verify structure + full content round-trip, not bytes.
"""

import io
import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden", "small_k40", "small")

needs_gold = pytest.mark.skipif(
    not os.path.exists(GOLD + ".hist"), reason="golden files not generated")


def _capture(main, argv, monkeypatch, capsys):
    rc = main(argv)
    assert rc == 0
    return capsys.readouterr().out


def _parse_one(text):
    """Parse ASCII 1-code into (filetype, data-lines as token lists)."""
    lines = text.splitlines()
    head = lines[0].split()
    assert head[0] == "1" and head[3:] == ["2", "1"]
    ftype = head[2]
    assert int(head[1]) == len(ftype)
    assert lines[1].startswith("! 4 ")
    data = []
    for ln in lines[2:]:
        if ln in (".",) or ln.startswith("~"):
            continue
        data.append(ln.split(" "))
    return ftype, data


@needs_gold
def test_khist_export(capsys, monkeypatch):
    from fastk_tpu.formats.hist import read_histogram
    from fastk_tpu.tools.histex import main

    out = _capture(main, ["-1a", "-h1:40", GOLD + ".hist"], monkeypatch, capsys)
    ftype, data = _parse_one(out)
    assert ftype == "khist"
    rec = {d[0]: d[1:] for d in data}
    assert rec["R"] == ["1", "40"]
    h = read_histogram(GOLD).modified(1, 40, True)
    vals = [int(x) for x in rec["H"][1:]]
    assert int(rec["H"][0]) == 40
    assert vals == [int(c) for c in h.counts]


@needs_gold
def test_kmr_export(capsys, monkeypatch):
    from fastk_tpu.formats.ktab import read_ktab, kmer_to_string
    from fastk_tpu.tools.tabex import main

    out = _capture(main, ["-1a", GOLD + ".ktab"], monkeypatch, capsys)
    ftype, data = _parse_one(out)
    assert ftype == "kmr"
    k_line = [d for d in data if d[0] == "K"][0]
    kmer, gmer, minval, _cpre = map(int, k_line[1:])
    t = read_ktab(GOLD)
    assert kmer == t.kmer and minval == t.minval

    # reconstruct all (kmer, count) pairs from prefix groups
    got = []
    cur_pre = None
    pres = iter(range(0, 1 << (2 * gmer)))
    i = 0
    S_lines = [d for d in data if d[0] == "S"]
    C_lines = [d for d in data if d[0] == "C"]
    assert len(S_lines) == len(C_lines)
    all_counts = []
    all_sufs = []
    for s_l, c_l in zip(S_lines, C_lines):
        slen = int(s_l[1])
        seq = s_l[2] if slen else ""
        assert len(seq) == slen
        n = int(c_l[1])
        cnts = [int(x) for x in c_l[2:]]
        assert len(cnts) == n
        suf_len = kmer - gmer
        assert slen == n * suf_len
        all_sufs.extend(seq[j * suf_len:(j + 1) * suf_len] for j in range(n))
        all_counts.extend(cnts)
    assert all_counts == [int(c) for c in t.counts]
    want_sufs = [kmer_to_string(t.packed[i], t.kmer)[gmer:]
                 for i in range(len(t))]
    assert all_sufs == want_sufs


@needs_gold
def test_prf_export(capsys, monkeypatch):
    from fastk_tpu.formats.prof import ProfileIndex
    from fastk_tpu.tools.profex import main

    out = _capture(main, ["-1a", GOLD + ".prof", "1-3"], monkeypatch, capsys)
    ftype, data = _parse_one(out)
    assert ftype == "prf"
    pi = ProfileIndex(GOLD)
    p_lines = [d for d in data if d[0] == "P"]
    assert len(p_lines) == 3
    for r, d in enumerate(p_lines):
        vals = [int(x) for x in d[2:]]
        assert int(d[1]) == len(vals)
        assert vals == [int(v) for v in pi.fetch(r)]
