"""One end-to-end toolchain run: every CLI consuming the previous one's
outputs, the way the reference ecosystem chains (README.md job plans)."""

import os

import numpy as np
import pytest

import fastk_tpu as fk
from fastk_tpu.tools import (fastcat, fastk, fastmerge, histex, kmermap,
                             logex, profex, symmex, tabex)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("chain")
    rng = np.random.default_rng(13)
    genome = rng.integers(0, 4, size=2500)
    paths = []
    for fno in range(2):
        p = d / f"reads{fno}.fasta"
        with open(p, "w") as f:
            for i in range(40):
                s = int(rng.integers(0, len(genome) - 100))
                r = genome[s: s + 100]
                if rng.random() < 0.5:
                    r = (3 - r)[::-1]
                f.write(f">r{i}\n{''.join('acgt'[c] for c in r)}\n")
        paths.append(str(p))
    return d, paths


def test_toolchain(world, capsys):
    d, paths = world
    a, b = str(d / "A"), str(d / "B")

    # 1. count both read sets (hist + table + profiles)
    assert fastk.main(["-k21", "-t1", "-p", f"-P{d}", paths[0], f"-N{a}"]) == 0
    assert fastk.main(["-k21", "-t1", "-p", f"-P{d}", paths[1], f"-N{b}"]) == 0

    # 2. inspect: histex/tabex/profex consume them
    assert histex.main(["-h5", a + ".hist"]) == 0
    assert tabex.main(["-C", a + ".ktab"]) == 0
    assert profex.main([a + ".prof", "1-2"]) == 0
    capsys.readouterr()

    # 3. table algebra: union with summed counts == fastmerge of the tables
    u = str(d / "U")
    assert logex.main([f"{u}=A|+B", a + ".ktab", b + ".ktab"]) == 0
    m = str(d / "M")
    assert fastmerge.main(["-t", m, a + ".ktab", b + ".ktab"]) == 0
    tu, tm = fk.read_ktab(u), fk.read_ktab(m)
    assert np.array_equal(tu.packed, tm.packed)
    assert np.array_equal(tu.counts, tm.counts)

    # 4. symmetric table stays sorted and doubles non-palindromes
    s = str(d / "S")
    assert symmex.main([m + ".ktab", s + ".ktab"]) == 0
    ts = fk.read_ktab(s)
    assert ts.check_sorted()
    assert len(ts) >= len(tm)

    # 5. keyspace slices via fastmerge -S, re-spliced by fastcat == merge
    s1, s2 = str(d / "S1"), str(d / "S2")
    assert fastmerge.main(["-t", "-S1of2", s1, a + ".ktab", b + ".ktab"]) == 0
    assert fastmerge.main(["-t", "-S2of2", s2, a + ".ktab", b + ".ktab"]) == 0
    c = str(d / "C")
    assert fastcat.main(["-k", "-t", c, s1, s2]) == 0
    tc = fk.read_ktab(c)
    assert np.array_equal(tc.packed, tm.packed)
    assert np.array_equal(tc.counts, tm.counts)
    # with -k the splice COPIES (hardlinking would alias live inodes:
    # an in-place rewrite of one table would corrupt the other)
    from fastk_tpu.formats.paths import part_path
    assert os.stat(part_path(c, ".ktab", 1)).st_nlink == 1
    # destructive splice (sources removed) may hardlink: re-run without -k
    c2 = str(d / "C2")
    assert fastcat.main(["-t", c2, s1, s2]) == 0
    assert not os.path.exists(s1 + ".ktab")
    tc2 = fk.read_ktab(c2)
    assert np.array_equal(tc2.packed, tm.packed)
    # target colliding with a source is rejected before any unlink
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        fastcat.main(["-k", "-t", c2, c2, c])
    assert fk.read_ktab(c2).check_sorted()

    # 6. kmermap: map table A onto read set B
    bed = str(d / "map")
    assert kmermap.main([a + ".ktab", paths[1], bed]) == 0
    bedfile = f"{bed}.reads1.kmers.bed"
    assert os.path.exists(bedfile)
    with open(bedfile) as f:
        rows = [ln.split("\t") for ln in f.read().splitlines()]
    assert rows and all(int(r[1]) < int(r[2]) for r in rows)

    # 7. 1-code exports parse (-1 = binary container, -1a = ASCII)
    assert histex.main(["-1a", a + ".hist"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("1 5 khist 2 1\n")
