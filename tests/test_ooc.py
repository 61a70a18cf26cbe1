"""Out-of-core (bounded-memory) counting equals the in-core pipeline."""

import os

import numpy as np
import pytest

from fastk_tpu.pipeline.count import count_files
from fastk_tpu.pipeline.outofcore import count_files_ooc


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, size=3000)
    reads = []
    for _ in range(60):
        s = int(rng.integers(0, len(genome) - 120))
        r = genome[s: s + 120].copy()
        if rng.random() < 0.5:
            r = (3 - r)[::-1]
        seq = "".join("acgt"[c] for c in r)
        if rng.random() < 0.2:  # sprinkle invalid bases
            i = int(rng.integers(0, len(seq)))
            seq = seq[:i] + "N" + seq[i + 1:]
        reads.append(seq)
    p = tmp_path_factory.mktemp("ooc") / "in.fasta"
    with open(p, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    return str(p)


@pytest.mark.parametrize("parts", [1, 3])
def test_ooc_matches_incore(data, tmp_path, parts):
    a = count_files([data], 21, table_min=1, profiles=True,
                    batch_bases=2000)
    b = count_files_ooc([data], 21, parts, sort_path=str(tmp_path),
                        table_min=1, profiles=True, batch_bases=2000)
    assert a.hist == b.hist
    assert np.array_equal(a.table.packed, b.table.packed)
    assert np.array_equal(a.table.counts, b.table.counts)
    assert len(a.profiles) == len(b.profiles)
    for x, y in zip(a.profiles, b.profiles):
        assert np.array_equal(x, y)


def test_ooc_cli_trigger(data, tmp_path, monkeypatch):
    """fastk -M tiny forces the out-of-core path; outputs must match."""
    from fastk_tpu.tools.fastk import main
    import fastk_tpu as fk

    o1 = str(tmp_path / "incore")
    o2 = str(tmp_path / "ooc")
    assert main([f"-k21", "-t1", f"-P{tmp_path}", data, f"-N{o1}"]) == 0
    # -M is in GB; fractional values are not in the reference CLI, so force
    # the split by monkeypatching the estimate to be huge
    import fastk_tpu.tools.fastk as fastk_mod
    real_getsize = fastk_mod.os.path.getsize
    monkeypatch.setattr(fastk_mod.os.path, "getsize",
                        lambda p: real_getsize(p) * 10_000_000)
    assert main([f"-k21", "-t1", f"-P{tmp_path}", data, f"-N{o2}"]) == 0
    h1 = fk.read_histogram(o1)
    h2 = fk.read_histogram(o2)
    assert h1 == h2
    t1 = fk.read_ktab(o1)
    t2 = fk.read_ktab(o2)
    assert np.array_equal(t1.packed, t2.packed)
    assert np.array_equal(t1.counts, t2.counts)


@pytest.mark.parametrize("parts", [1, 3])
def test_ooc_streamed_outputs_match(data, tmp_path, parts):
    """out_base streaming writes byte-compatible .ktab/.prof file-sets while
    keeping nothing in memory; contents must equal the in-memory path."""
    import fastk_tpu as fk
    from fastk_tpu.formats.ktab import write_ktab
    from fastk_tpu.formats.prof import read_profiles, write_prof

    a = count_files_ooc([data], 21, parts, sort_path=str(tmp_path),
                        table_min=1, profiles=True, batch_bases=2000)
    ob = str(tmp_path / f"st{parts}")
    b = count_files_ooc([data], 21, parts, sort_path=str(tmp_path),
                        table_min=1, profiles=True, batch_bases=2000,
                        out_base=ob, out_nparts=2)
    assert b.table is None and b.profiles is None
    assert b.table_entries == len(a.table)
    assert a.hist == b.hist

    t2 = fk.read_ktab(ob)
    assert np.array_equal(a.table.packed, t2.packed)
    assert np.array_equal(a.table.counts, t2.counts)

    # profile file-set must be byte-identical to the buffered writer's
    import filecmp
    mb = str(tmp_path / f"mem{parts}")
    write_prof(mb, 21, a.profiles, nparts=2)
    for ext, i in ((".prof", 1), (".prof", 2), (".pidx", 1), (".pidx", 2)):
        pa = tmp_path / f".mem{parts}{ext}.{i}"
        pb = tmp_path / f".st{parts}{ext}.{i}"
        assert filecmp.cmp(str(pa), str(pb), shallow=False), (ext, i)
    got = read_profiles(ob)
    assert len(got) == len(a.profiles)
    for x, y in zip(got, a.profiles):
        assert np.array_equal(x, y)


def test_incore_streamed_outputs_match(data, tmp_path):
    import fastk_tpu as fk
    from fastk_tpu.formats.prof import read_profiles

    a = count_files([data], 21, table_min=2, profiles=True, batch_bases=2000)
    ob = str(tmp_path / "inc")
    b = count_files([data], 21, table_min=2, profiles=True, batch_bases=2000,
                    out_base=ob, out_nparts=3)
    assert b.table is None and b.profiles is None
    t2 = fk.read_ktab(ob)
    assert np.array_equal(a.table.packed, t2.packed)
    got = read_profiles(ob)
    for x, y in zip(got, a.profiles):
        assert np.array_equal(x, y)


def test_part_overflow_subsplit(data, tmp_path):
    """A part bigger than part_cap is sub-split at word0 quantiles and still
    produces identical outputs (skew recovery without retraining)."""
    a = count_files_ooc([data], 21, 2, sort_path=str(tmp_path),
                        table_min=1, profiles=True, batch_bases=2000)
    b = count_files_ooc([data], 21, 2, sort_path=str(tmp_path),
                        table_min=1, profiles=True, batch_bases=2000,
                        part_cap=50)  # force many sub-splits
    assert a.hist == b.hist
    assert np.array_equal(a.table.packed, b.table.packed)
    assert np.array_equal(a.table.counts, b.table.counts)
    for x, y in zip(a.profiles, b.profiles):
        assert np.array_equal(x, y)


def test_skewed_input_completes(tmp_path):
    """One dominating repeated k-mer region (maximal skew) completes and
    counts exactly."""
    reads = ["a" * 500] * 30 + ["acgtacgtacgtacgtacgtacgtacgt"]
    p = tmp_path / "skew.fasta"
    with open(p, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    out = count_files_ooc([str(p)], 21, 3, sort_path=str(tmp_path),
                          table_min=1, batch_bases=1000, part_cap=200)
    # 30 reads of a^500 -> (500-21+1)*30 = 14400 instances of a^21
    i = out.table.find("a" * 21)
    assert i is not None
    assert out.table.counts[i] == min(14400, 32767)


def test_resume_after_crash(data, tmp_path):
    """Kill phase 1 mid-run; a resume rerun skips the already-spilled
    batches and produces identical outputs."""
    import fastk_tpu.pipeline.outofcore as ooc

    kw = dict(k=21, parts=3, sort_path=str(tmp_path), table_min=1,
              profiles=True, batch_bases=2000)
    want = count_files_ooc([data], resume=False, **kw)

    calls = {"n": 0}
    real = ooc.unique_batch_inst

    def dying(*a, **k2):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt("simulated kill")
        return real(*a, **k2)

    ooc.unique_batch_inst = dying
    try:
        with pytest.raises(KeyboardInterrupt):
            count_files_ooc([data], resume=True, **kw)
    finally:
        ooc.unique_batch_inst = real
    # manifest + spill survived
    import glob
    assert glob.glob(str(tmp_path / "fastk_tpu_ooc.*" / "manifest.json"))

    calls2 = {"n": 0}

    def counting(*a, **k2):
        calls2["n"] += 1
        return real(*a, **k2)

    ooc.unique_batch_inst = counting
    try:
        got = count_files_ooc([data], resume=True, **kw)
    finally:
        ooc.unique_batch_inst = real
    # at least one batch's device work was skipped
    assert calls2["n"] < calls["n"] + ooc_total_batches(data, 2000) - 1
    assert want.hist == got.hist
    assert np.array_equal(want.table.packed, got.table.packed)
    assert np.array_equal(want.table.counts, got.table.counts)
    for x, y in zip(want.profiles, got.profiles):
        assert np.array_equal(x, y)
    # spill dir cleaned up after the successful resume
    assert not glob.glob(str(tmp_path / "fastk_tpu_ooc.*" / "manifest.json"))


def ooc_total_batches(path, batch_bases):
    from fastk_tpu.io.reader import batched_reads

    return sum(1 for _ in batched_reads([path], batch_bases))


def test_resume_multislice_batch(tmp_path, monkeypatch):
    """A batch processed in SEVERAL device slices must only enter the
    resume manifest once its LAST slice is spilled: killing between two
    slices of the same batch and resuming must still be exact."""
    import fastk_tpu.pipeline.count as pc
    import fastk_tpu.pipeline.outofcore as ooc

    # force every batch to split into multiple device slices (slices are
    # at least _MIN_SIZE=2^15 positions, so the input must exceed that)
    monkeypatch.setattr(pc, "MAX_DEVICE_POSITIONS", 1 << 15)
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, size=4000)
    p = tmp_path / "big.fasta"
    with open(p, "w") as f:
        for i in range(500):
            s = int(rng.integers(0, len(genome) - 150))
            f.write(f">r{i}\n" + "".join(
                "acgt"[c] for c in genome[s: s + 150]) + "\n")
    data = str(p)

    kw = dict(k=21, parts=3, sort_path=str(tmp_path), table_min=1,
              profiles=True, batch_bases=90_000)
    want = count_files_ooc([data], resume=False, **kw)

    calls = {"n": 0}
    real = ooc.unique_batch_inst

    def dying(*a, **k2):
        calls["n"] += 1
        if calls["n"] == 2:  # die on the SECOND slice (same batch)
            raise KeyboardInterrupt("simulated kill")
        return real(*a, **k2)

    monkeypatch.setattr(ooc, "unique_batch_inst", dying)
    with pytest.raises(KeyboardInterrupt):
        count_files_ooc([data], resume=True, **kw)
    monkeypatch.setattr(ooc, "unique_batch_inst", real)

    got = count_files_ooc([data], resume=True, **kw)
    assert want.hist == got.hist
    assert np.array_equal(want.table.packed, got.table.packed)
    for x, y in zip(want.profiles, got.profiles):
        assert np.array_equal(x, y)


def test_ooc_plan_bounds():
    """The -M plan: in-core only when the worst-case footprint fits both
    HBM and -M; otherwise parts sized so a part's ~96B/record merge
    transients stay under -M, flat as input grows."""
    from fastk_tpu.tools.fastk import _ooc_plan

    # tiny input, default -M12: in-core
    parts, cap = _ooc_plan(10_000_000, 12, profiles=False)
    assert parts == 1

    # 84MB of bases at -M1 must go out-of-core (1GB < 84M * 56B)
    parts1, cap1 = _ooc_plan(84_000_000, 1, profiles=False)
    assert parts1 > 1 and cap1 * 96 <= 1e9

    # 3x the input at the same -M: more parts, SAME cap (flat peak)
    parts3, cap3 = _ooc_plan(252_000_000, 1, profiles=False)
    assert cap3 == cap1
    assert parts3 >= 3 * parts1 - 2

    # profile jobs go out-of-core earlier (larger per-position state)
    p_hist, _ = _ooc_plan(200_000_000, 12, profiles=False)
    p_prof, _ = _ooc_plan(200_000_000, 12, profiles=True)
    assert p_hist == 1 and p_prof > 1


def test_measured_plan_coverage_aware(tmp_path):
    """parts=None sizes the plan from the first batch's measured dedup
    ratio (FastK.c:417-429's `ratio` trick): high-coverage input plans
    ~coverage-fold fewer parts than the worst case, outputs identical."""
    import io as _io
    from contextlib import redirect_stdout

    from fastk_tpu.pipeline.count import count_files
    from fastk_tpu.pipeline.outofcore import count_files_ooc

    rng = np.random.default_rng(9)
    genome = rng.integers(0, 4, size=400)  # tiny genome -> ~20X coverage
    p = tmp_path / "hi.fasta"
    with open(p, "w") as f:
        for i in range(80):
            s = int(rng.integers(0, len(genome) - 100))
            r = "".join("acgt"[c] for c in genome[s: s + 100])
            f.write(f">r{i}\n{r}\n")
    est = os.path.getsize(p)  # ~8000 bases

    import re

    # table-only job: parts come from the measured dedup ratio alone
    want = count_files([str(p)], 17, table_min=1, batch_bases=2000)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        got = count_files_ooc([str(p)], 17, None, sort_path=str(tmp_path),
                              table_min=1, batch_bases=2000,
                              part_cap=400, est_bases=est, verbose=True)
    log = buf.getvalue()
    assert "measured dedup ratio" in log
    measured_parts = int(re.search(r"planning (\d+) parts", log).group(1))
    # worst case would be ceil(est/part_cap) = ~20 parts; ~20X coverage
    # dedups the batch ~5x (batch 2000 vs genome 400), so the measured
    # plan must be several-fold smaller
    worst = -(-est // 400)
    assert measured_parts <= worst // 3
    assert want.hist == got.hist
    assert np.array_equal(want.table.packed, got.table.packed)
    assert np.array_equal(want.table.counts, got.table.counts)

    # profile job: the INSTANCE spill (one record per position, no dedup)
    # must bound the plan too — parts stay ~worst-case here, and the
    # outputs still match (this exact case OOMed when parts were sized
    # from uniques alone: a 300M-base -p run planned 2 parts and padded a
    # 150M-instance join past HBM)
    wantp = count_files([str(p)], 17, table_min=1, profiles=True,
                        batch_bases=2000)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        gotp = count_files_ooc([str(p)], 17, None, sort_path=str(tmp_path),
                               table_min=1, profiles=True, batch_bases=2000,
                               part_cap=400, est_bases=est, verbose=True)
    pparts = int(re.search(r"planning (\d+) parts", buf.getvalue()).group(1))
    assert pparts >= worst  # instance-bounded
    assert wantp.hist == gotp.hist
    for x, y in zip(wantp.profiles, gotp.profiles):
        assert np.array_equal(x, y)


def test_part_consolidation(data, tmp_path):
    """An over-provisioned plan (many near-empty parts) consolidates into
    few device merges with identical outputs."""
    import io as _io
    from contextlib import redirect_stdout

    from fastk_tpu.pipeline.count import count_files
    from fastk_tpu.pipeline.outofcore import count_files_ooc

    want = count_files([data], 17, table_min=1, profiles=True,
                       batch_bases=4000)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        got = count_files_ooc([data], 17, 16, sort_path=str(tmp_path),
                              table_min=1, profiles=True, batch_bases=4000,
                              verbose=True)
    assert "consolidated into" in buf.getvalue()
    assert want.hist == got.hist
    assert np.array_equal(want.table.packed, got.table.packed)
    for x, y in zip(want.profiles, got.profiles):
        assert np.array_equal(x, y)


def test_join_chunking_exact(data, tmp_path, monkeypatch):
    """Phase-2 instance joins window the queries (bounding the joint
    table+query sort); tiny windows must not change any output."""
    monkeypatch.setenv("FASTK_TPU_JOIN_QCAP", "1000")
    want = count_files([data], 21, table_min=1, profiles=True,
                       batch_bases=2000)
    got = count_files_ooc([data], 21, 3, sort_path=str(tmp_path),
                          table_min=1, profiles=True, batch_bases=2000)
    assert want.hist == got.hist
    for x, y in zip(want.profiles, got.profiles):
        assert np.array_equal(x, y)
