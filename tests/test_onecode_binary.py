"""Binary ONE-code exports: byte format + interop with the reference ONElib.

The strongest check compiles tests/one_dump.c against the ORACLE's ONElib
(reference reader) and has it consume files produced by our OneBinaryWriter:
if the reference library parses every line and the footer index back
identically, the container is correct.
"""

import os
import shutil
import struct
import subprocess

import pytest

HERE = os.path.dirname(__file__)
GOLD = os.path.join(HERE, "golden", "small_k40", "small")
ORACLE = "/tmp/fastk_oracle"

needs_gold = pytest.mark.skipif(
    not os.path.exists(GOLD + ".hist"), reason="golden files not generated")


# ---------- unit: the ltf varint must match ONElib intPut ----------

def test_ltf_varint_encoding():
    from fastk_tpu.formats.onecode import _ltf

    assert _ltf(0) == bytes([0x40])
    assert _ltf(63) == bytes([0x7F])
    assert _ltf(64) == bytes([0x20, 64])            # 13-bit form, hi then lo
    assert _ltf(0x1FFF) == bytes([0x3F, 0xFF])
    assert _ltf(0x2000) == bytes([1, 0x00, 0x20])   # tag k -> k+1 LE bytes
    assert _ltf(0xFFFF) == bytes([1, 0xFF, 0xFF])
    assert _ltf(0x10000) == bytes([2, 0x00, 0x00, 0x01])
    assert _ltf((1 << 32) - 1) == bytes([3, 0xFF, 0xFF, 0xFF, 0xFF])
    assert _ltf(1 << 32) == bytes([4, 0, 0, 0, 0, 1])
    assert _ltf(-1) == bytes([0xFF])                # 1-byte negative form
    assert _ltf(-64) == bytes([0xC0])
    assert _ltf(-65) == bytes([0x81, 0xBF, 0xFF])   # low 2 LE bytes of -65


def test_int_list_payload_deltas():
    from fastk_tpu.formats.onecode import _int_list_payload

    # first elt varint, width byte, then fixed-width LE deltas
    assert _int_list_payload([5]) == bytes([0x45])
    assert _int_list_payload([5, 7, 6]) == bytes([0x45, 1, 2, 0xFF])
    # a delta of 300 needs 2 bytes
    assert _int_list_payload([0, 300]) == bytes([0x40, 2, 0x2C, 0x01])


def test_binary_file_structure(tmp_path):
    from fastk_tpu.formats.onecode import OneBinaryWriter, KHIST_SCHEMA

    p = tmp_path / "x.khist"
    with open(p, "wb") as f:
        w = OneBinaryWriter("khist", KHIST_SCHEMA, "histex", "cmd", f)
        w.line("N", "src.hist")
        w.line("R", 1, 10)
        w.line("H", [3, 2, 1, 0, 0, 0, 0, 0, 0, 9])
        w.close()
    raw = p.read_bytes()
    assert raw.startswith(b"1 5 khist 2 1\n! 4 ")
    # footer offset trailer points at the ASCII counts block
    foot = struct.unpack("<q", raw[-8:])[0]
    assert raw[foot:foot + 4] == b"# N "
    assert b"\n$ 0\n" in raw
    assert b"^\n" == raw[-10:-8]


# ---------- interop: reference ONElib reads our binary files ----------

def _one_dump():
    if not os.path.exists(os.path.join(ORACLE, "ONElib.c")):
        pytest.skip("oracle tree not built (bash tests/make_golden.sh)")
    exe = os.path.join(ORACLE, "one_dump")
    if not os.path.exists(exe):
        subprocess.run(
            ["gcc", "-O0", "-o", exe, os.path.join(HERE, "one_dump.c"),
             os.path.join(ORACLE, "ONElib.c"), "-I" + ORACLE,
             "-lm", "-lpthread"], check=True)
    return exe


def _dump(path):
    exe = _one_dump()
    r = subprocess.run([exe, path], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return r.stdout.splitlines()


@needs_gold
def test_khist_binary_read_by_reference(tmp_path, monkeypatch):
    from fastk_tpu.formats.hist import read_histogram
    from fastk_tpu.tools.histex import main

    out = tmp_path / "o.khist"
    with open(out, "wb") as f:
        monkeypatch.setattr("sys.stdout",
                            type("S", (), {"buffer": f, "flush": f.flush})())
        assert main(["-1", "-h1:40", GOLD + ".hist"]) == 0
    lines = _dump(str(out))
    assert lines[0] == "TYPE khist"
    rec = {ln.split()[0]: ln.split()[1:] for ln in lines[1:]}
    assert rec["R"] == ["1", "40"]
    h = read_histogram(GOLD).modified(1, 40, True)
    assert [int(x) for x in rec["H"][1:]] == [int(c) for c in h.counts]
    assert int(rec["H"][0]) == len(h.counts)


@needs_gold
def test_kmr_binary_read_by_reference(tmp_path, monkeypatch):
    from fastk_tpu.formats.ktab import read_ktab, kmer_to_string
    from fastk_tpu.tools.tabex import main

    out = tmp_path / "o.kmr"
    with open(out, "wb") as f:
        monkeypatch.setattr("sys.stdout",
                            type("S", (), {"buffer": f, "flush": f.flush})())
        assert main(["-1", GOLD + ".ktab"]) == 0
    lines = _dump(str(out))
    assert lines[0] == "TYPE kmr"
    t = read_ktab(GOLD)
    k_line = [ln for ln in lines if ln[0] == "K"][0].split()
    kmer, gmer = int(k_line[1]), int(k_line[2])
    assert kmer == t.kmer
    sufs, cnts = [], []
    suf_len = kmer - gmer
    for ln in lines[1:]:
        tok = ln.split()
        if tok[0] == "S" and int(tok[1]) > 0:
            seq = tok[2]
            assert len(seq) == int(tok[1])
            sufs.extend(seq[j:j + suf_len]
                        for j in range(0, len(seq), suf_len))
        elif tok[0] == "C":
            cnts.extend(int(x) for x in tok[2:])
    assert cnts == [int(c) for c in t.counts]
    assert sufs == [kmer_to_string(t.packed[i], t.kmer)[gmer:]
                    for i in range(len(t))]


@needs_gold
def test_prf_binary_read_by_reference(tmp_path, monkeypatch):
    from fastk_tpu.formats.prof import ProfileIndex
    from fastk_tpu.tools.profex import main

    out = tmp_path / "o.prf"
    with open(out, "wb") as f:
        monkeypatch.setattr("sys.stdout",
                            type("S", (), {"buffer": f, "flush": f.flush})())
        assert main(["-1", GOLD + ".prof", "1-5"]) == 0
    lines = _dump(str(out))
    assert lines[0] == "TYPE prf"
    pi = ProfileIndex(GOLD)
    p_lines = [ln.split() for ln in lines[1:] if ln[0] == "P"]
    assert len(p_lines) == 5
    for r, tok in enumerate(p_lines):
        vals = [int(x) for x in tok[2:]]
        assert int(tok[1]) == len(vals)
        assert vals == [int(v) for v in pi.fetch(r)]


@needs_gold
def test_prf_full_export_compresses_and_decodes(tmp_path, monkeypatch):
    """A full-range prf export crosses the 100KB codec-training volume, so
    later P lines are Huffman-compressed; the reference reader must decode
    every profile back (vcDeserialize + vcDecode on our codec + stream)."""
    from fastk_tpu.formats.prof import ProfileIndex
    from fastk_tpu.tools.profex import main

    out = tmp_path / "full.prf"
    with open(out, "wb") as f:
        monkeypatch.setattr("sys.stdout",
                            type("S", (), {"buffer": f, "flush": f.flush})())
        assert main(["-1", GOLD + ".prof"]) == 0
    pi = ProfileIndex(GOLD)
    raw = sum(len(pi.fetch(r)) for r in range(pi.nreads))
    assert raw > 150_000          # enough delta bytes to trigger the codec
    lines = _dump(str(out))
    p_lines = [ln.split() for ln in lines[1:] if ln[0] == "P"]
    assert len(p_lines) == pi.nreads
    for r, tok in enumerate(p_lines):
        assert [int(x) for x in tok[2:]] == [int(v) for v in pi.fetch(r)]
    # and the compressed form actually saves space vs the delta bytes
    assert out.stat().st_size < raw


def test_vc_codec_escape_path(tmp_path):
    """Bytes unseen during training must ride the escape code: train on
    payloads of small deltas, then emit a line with out-of-alphabet delta
    bytes, and have the reference reader decode it."""
    from fastk_tpu.formats.onecode import OneBinaryWriter, PRF_SCHEMA

    p = tmp_path / "esc.prf"
    rows = []
    with open(p, "wb") as f:
        w = OneBinaryWriter("prf", PRF_SCHEMA, "profex", "cmd", f)
        v = 1
        for i in range(60):           # ~120KB of {0,1,-1} delta bytes
            row = [(v + (j % 2)) for j in range(2000)]
            rows.append(row)
            w.line("P", row)
        assert w.infos["P"].codec.ready
        rows.append([5, 300, 5, 70000, 5])   # deltas needing 1-4 bytes
        w.line("P", rows[-1])
        w.close()
    lines = _dump(str(p))
    p_lines = [ln.split() for ln in lines[1:] if ln[0] == "P"]
    assert len(p_lines) == len(rows)
    for row, tok in zip(rows, p_lines):
        assert [int(x) for x in tok[2:]] == row
