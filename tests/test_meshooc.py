"""The scale-out mesh path (parallel.meshooc): owner-resident cross-batch
merges, per-chip keyspace spill, streamed per-host output slices, mesh
profiles, and the 2-process slice-splice flow — all equal to the
single-chip paths (reference's multi-node property: arbitrary input on
bounded memory, README.md:44-46, 245-353)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax


def _write_fasta(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")


def _rand_reads(rng, genome, n, L, nfrac=0.0):
    out = []
    for _ in range(n):
        s = int(rng.integers(0, len(genome) - L))
        r = genome[s: s + L].copy()
        if nfrac and rng.random() < nfrac:
            j = int(rng.integers(0, L - 3))
            r[j: j + 3] = 99
        out.append("".join("acgt"[c] if c < 4 else "n" for c in r))
    return out


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    rng = np.random.default_rng(7)
    d = tmp_path_factory.mktemp("meshooc")
    genome = rng.integers(0, 4, size=3000)
    paths = []
    for fno in range(2):
        p = d / f"f{fno}.fasta"
        _write_fasta(p, _rand_reads(rng, genome, 40, 100, nfrac=0.15))
        paths.append(str(p))
    return paths


def test_mesh_matches_incore_multibatch(data):
    """Multi-batch mesh run (table + profiles + Ns) equals the single-chip
    in-core pipeline exactly."""
    from fastk_tpu.parallel.meshooc import count_files_mesh
    from fastk_tpu.pipeline.count import count_files

    want = count_files(data, 17, table_min=1, profiles=True,
                       batch_bases=4000)
    got = count_files_mesh(data, 17, table_min=1, profiles=True,
                           batch_bases=4000, parts_per_chip=2)
    assert want.hist == got.hist
    assert np.array_equal(want.table.packed, got.table.packed)
    assert np.array_equal(want.table.counts, got.table.counts)
    assert (want.nreads, want.totlen) == (got.nreads, got.totlen)
    assert len(want.profiles) == len(got.profiles)
    for a, b in zip(want.profiles, got.profiles):
        assert np.array_equal(a, b)
    # the structural bound: no round held more than its own batch's records
    st = got.mesh_stats
    assert st["max_round_records"] < st["total_spilled"]


def test_mesh_streamed_filesets_equal_ooc_k40(data, tmp_path):
    """Streamed .ktab/.prof slice file-sets are byte-identical to the
    single-chip out-of-core writer's, at a multi-word k (k=40)."""
    from fastk_tpu.parallel.meshooc import count_files_mesh
    from fastk_tpu.pipeline.outofcore import count_files_ooc

    oa, ob = str(tmp_path / "ref"), str(tmp_path / "mesh")
    wa = count_files_ooc(data, 40, parts=3, sort_path=str(tmp_path),
                         table_min=1, profiles=True, batch_bases=5000,
                         out_base=oa, out_nparts=3)
    wb = count_files_mesh(data, 40, table_min=1, profiles=True,
                          batch_bases=5000, sort_path=str(tmp_path),
                          parts_per_chip=2, out_base=ob, out_nparts=3)
    assert wa.hist == wb.hist
    assert wa.table_entries == wb.table_entries

    def fset(base):
        dd, bb = os.path.dirname(base), os.path.basename(base)
        out = {}
        for f in sorted(os.listdir(dd)):
            if f.startswith((bb + ".", "." + bb + ".")):
                with open(os.path.join(dd, f), "rb") as fh:
                    out[f.replace(bb, "X")] = fh.read()
        return out

    fa, fb = fset(oa), fset(ob)
    assert fa.keys() == fb.keys()
    for kk in fa:
        assert fa[kk] == fb[kk], f"fileset member {kk} differs"


def test_mesh_bounded_rounds_disjoint_batches(tmp_path):
    """Many batches of (nearly) disjoint k-mers: the spill grows with the
    input but no single round's host-resident records do — the bounded-
    memory property that the old per-round allgather design lacked."""
    from fastk_tpu.parallel.meshooc import count_files_mesh
    from fastk_tpu.pipeline.count import count_files

    rng = np.random.default_rng(3)
    reads = []
    for b in range(6):  # fresh genome per "batch" worth of reads
        g = rng.integers(0, 4, size=4000)
        reads += _rand_reads(rng, g, 25, 120)
    p = tmp_path / "big.fasta"
    _write_fasta(p, reads)

    want = count_files([str(p)], 40, table_min=1, batch_bases=3000)
    got = count_files_mesh([str(p)], 40, table_min=1, batch_bases=3000,
                           sort_path=str(tmp_path))
    assert want.hist == got.hist
    assert np.array_equal(want.table.packed, got.table.packed)
    st = got.mesh_stats
    # ~6 rounds of ~equal unique volume: a round held < half the total
    assert st["max_round_records"] * 2 < st["total_spilled"]


def test_mesh_skewed_batch_recovers(tmp_path):
    """Batches dominated by a single k-mer (every instance must route to
    ONE chip — no splitter can spread them) overflow the routing capacity
    and recover by retrain + slack escalation, never by moving keyspace
    boundaries after a spill. Results stay exact."""
    from fastk_tpu.parallel.meshooc import count_files_mesh
    from fastk_tpu.pipeline.count import count_files

    rng = np.random.default_rng(5)
    g = rng.integers(0, 4, size=3000)
    diverse = _rand_reads(rng, g, 30, 100)
    skewed = ["a" * 100] * 600  # one canonical 17-mer, ~50k instances
    p = tmp_path / "skew.fasta"
    _write_fasta(p, diverse + skewed)

    want = count_files([str(p)], 17, table_min=1, profiles=True,
                       batch_bases=60000)
    got = count_files_mesh([str(p)], 17, table_min=1, profiles=True,
                           batch_bases=60000, sort_path=str(tmp_path))
    assert want.hist == got.hist
    assert np.array_equal(want.table.packed, got.table.packed)
    assert np.array_equal(want.table.counts, got.table.counts)
    for a, b in zip(want.profiles, got.profiles):
        assert np.array_equal(a, b)
    # the recovery path must actually have fired
    assert got.mesh_stats["slack_escalations"] >= 1


def test_mesh_single_key_batch_dedup_recovery(tmp_path):
    """Adversarial COUNT batch: every position one canonical k-mer, all
    routed to one chip of the 8-device mesh — per-source skew that no
    slack under D can absorb. The recovery ladder flips on pre-routing
    dedup (each source exchanges its shard's UNIQUES with local counts),
    making it a D-record exchange: the run completes under a hard slack
    cap of 2 with no round splits, so the slack=D memory cliff is never
    approached on the count path."""
    from fastk_tpu.parallel.meshooc import count_files_mesh
    from fastk_tpu.pipeline.count import count_files

    p = tmp_path / "one.fasta"
    _write_fasta(p, ["a" * 200] * 300)  # one canonical 17-mer everywhere
    want = count_files([str(p)], 17, table_min=1, batch_bases=30000)
    os.environ["FASTK_TPU_ROUTE_BUDGET_MB"] = "0"  # slack_cap floor == 2
    try:
        got = count_files_mesh([str(p)], 17, table_min=1,
                               batch_bases=30000, sort_path=str(tmp_path))
    finally:
        del os.environ["FASTK_TPU_ROUTE_BUDGET_MB"]
    assert want.hist == got.hist
    assert np.array_equal(want.table.packed, got.table.packed)
    assert np.array_equal(want.table.counts, got.table.counts)
    assert got.mesh_stats["pre_dedup"] == 1
    assert got.mesh_stats["batch_splits"] == 0


def test_mesh_instance_skew_splits_round(tmp_path):
    """Adversarial INSTANCE batch (profiles: per-position records cannot
    dedup) under a tiny route-buffer budget: slack caps below D, the
    round splits into sub-slices (halved shard => halved buffer bound),
    and results stay exact — the bounded-memory recovery for the
    slack=D cliff."""
    from fastk_tpu.parallel.meshooc import count_files_mesh
    from fastk_tpu.pipeline.count import count_files

    rng = np.random.default_rng(11)
    g = rng.integers(0, 4, size=2000)
    reads = _rand_reads(rng, g, 20, 100) + ["a" * 100] * 400
    p = tmp_path / "skew.fasta"
    _write_fasta(p, reads)
    want = count_files([str(p)], 17, table_min=1, profiles=True,
                       batch_bases=60000)
    # 1 MB: slack caps below D at the full shard; halving the shard
    # doubles the cap until slack can reach D at bounded memory
    os.environ["FASTK_TPU_ROUTE_BUDGET_MB"] = "1"
    try:
        got = count_files_mesh([str(p)], 17, table_min=1, profiles=True,
                               batch_bases=60000, sort_path=str(tmp_path))
    finally:
        del os.environ["FASTK_TPU_ROUTE_BUDGET_MB"]
    assert want.hist == got.hist
    assert np.array_equal(want.table.packed, got.table.packed)
    assert np.array_equal(want.table.counts, got.table.counts)
    for a, b in zip(want.profiles, got.profiles):
        assert np.array_equal(a, b)
    assert got.mesh_stats["batch_splits"] >= 1


_WORKER = r"""
import os, sys, json
import numpy as np
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
from fastk_tpu.parallel.meshooc import count_files_mesh, default_mesh
from fastk_tpu.formats.hist import write_histogram

paths = json.loads(sys.argv[3])
out_base = sys.argv[4]
out = count_files_mesh(paths, 17, mesh=default_mesh(), table_min=1,
                       profiles=True, batch_bases=3000, out_base=out_base,
                       out_nparts=2, sort_path=os.path.dirname(out_base))
write_histogram(out.slice_base + ".h", out.hist)
with open(sys.argv[5], "w") as f:
    json.dump(dict(nreads=out.nreads, totlen=out.totlen,
                   entries=out.table_entries,
                   slice_base=out.slice_base, stats=out.mesh_stats), f)
"""


@pytest.mark.slow
def test_mesh_two_process_slices_splice(data, tmp_path):
    """Two REAL processes (jax.distributed over a localhost coordinator),
    each streaming its keyspace slice; fastcat splices the slices into the
    final table/profile sets, equal to a single-chip out-of-core run over
    the same global read order."""
    from fastk_tpu.formats.hist import read_histogram
    from fastk_tpu.formats.ktab import read_ktab
    from fastk_tpu.formats.prof import read_profiles
    from fastk_tpu.parallel.multihost import shard_files
    from fastk_tpu.pipeline.outofcore import count_files_ooc
    from fastk_tpu.tools.fastcat import (
        cat_profiles_spliced,
        cat_tables_spliced,
        cat_tables_streamed,
    )

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out_base = str(tmp_path / "mh")
    outs = [str(tmp_path / f"o{i}.json") for i in range(2)]
    env = {**os.environ}
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    def attempt():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coord = f"127.0.0.1:{port}"
        procs = [subprocess.Popen(
            [sys.executable, str(worker), coord, str(i), json.dumps(data),
             out_base, outs[i]], env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE) for i in range(2)]
        for p in procs:
            try:
                p.wait(timeout=900)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                    q.wait()
                return "mesh worker timed out"
        for p in procs:
            if p.returncode != 0:
                return "worker failed: " + p.stderr.read().decode()[-2000:]
        return None

    fail = attempt()
    if fail is not None:
        fail = attempt()
    if fail is not None:
        pytest.fail(fail)

    # global read order is per-host file shards in pid order
    order = shard_files(data, 0, 2) + shard_files(data, 1, 2)
    want = count_files_ooc(order, 17, parts=2, sort_path=str(tmp_path),
                           table_min=1, profiles=True, batch_bases=3000,
                           out_base=str(tmp_path / "ref"), out_nparts=2)

    slices = [out_base + ".0", out_base + ".1"]
    tgt = str(tmp_path / "spliced")
    if not cat_tables_spliced(slices, tgt, keep=True):
        cat_tables_streamed(slices, tgt, 2)
    cat_profiles_spliced(slices, tgt, keep=True)

    h0 = read_histogram(out_base + ".0.h")
    h1 = read_histogram(out_base + ".1.h")
    assert h0 == h1 == want.hist  # every host computed the GLOBAL hist
    ta, tb = read_ktab(tgt), read_ktab(str(tmp_path / "ref"))
    assert np.array_equal(ta.packed, tb.packed)
    assert np.array_equal(ta.counts, tb.counts)
    pa, pb = read_profiles(tgt), read_profiles(str(tmp_path / "ref"))
    assert len(pa) == len(pb)
    for a, b in zip(pa, pb):
        assert np.array_equal(a, b)

    # phase 3 is OWNER-ADDRESSED: across hosts the returned profile rows
    # sum to the instance total exactly once (the former allgather shipped
    # nprocs x rows: every host received everything and filtered)
    total_inst = sum(int((x > 0).sum()) for x in pb)  # valid positions
    stats = [json.load(open(o))["stats"] for o in outs]
    returned = [s["profile_rows_returned"] for s in stats]
    assert sum(returned) == total_inst
    assert all(0 < r < total_inst for r in returned)


_WORKER_RESUME = r"""
import os, sys, json
import numpy as np
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
import fastk_tpu.parallel.meshooc as mo
from fastk_tpu.formats.hist import write_histogram

die_at = int(os.environ.get("FK_TEST_DIE_AT_ROUND", "-1"))
if die_at >= 0 and int(sys.argv[2]) == 1:
    real = mo._local_shard_rows
    calls = [0]
    def dying(*a, **k):
        if calls[0] >= die_at:
            os._exit(9)           # simulated host crash mid-round
        calls[0] += 1
        return real(*a, **k)
    mo._local_shard_rows = dying

paths = json.loads(sys.argv[3])
out_base = sys.argv[4]
out = mo.count_files_mesh(paths, 17, mesh=mo.default_mesh(), table_min=1,
                          profiles=True, batch_bases=3000,
                          out_base=out_base, out_nparts=2,
                          sort_path=os.path.dirname(out_base), resume=True)
write_histogram(out.slice_base + ".h", out.hist)
with open(sys.argv[5], "w") as f:
    json.dump(dict(entries=out.table_entries), f)
"""


@pytest.mark.slow
def test_mesh_kill_resume_two_process(data, tmp_path):
    """Kill one of two mesh processes mid-round: the survivor must exit
    with a clear error within the watchdog timeout (no infinite
    process_allgather hang), both hosts' manifests + spills survive, and
    a resume rerun agrees on min(batches_done) and produces outputs
    byte-equal to the single-chip reference."""
    import glob

    from fastk_tpu.formats.hist import read_histogram
    from fastk_tpu.formats.ktab import read_ktab
    from fastk_tpu.formats.prof import read_profiles
    from fastk_tpu.parallel.multihost import shard_files
    from fastk_tpu.pipeline.outofcore import count_files_ooc
    from fastk_tpu.tools.fastcat import (
        cat_profiles_spliced,
        cat_tables_spliced,
        cat_tables_streamed,
    )

    worker = tmp_path / "worker_resume.py"
    worker.write_text(_WORKER_RESUME)
    out_base = str(tmp_path / "mr")
    outs = [str(tmp_path / f"r{i}.json") for i in range(2)]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "FASTK_TPU_MESH_TIMEOUT": "20"}
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    def run(env2, timeout):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coord = f"127.0.0.1:{port}"
        procs = [subprocess.Popen(
            [sys.executable, str(worker), coord, str(i), json.dumps(data),
             out_base, outs[i]], env=env2, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE) for i in range(2)]
        rcs, errs = [], []
        for p in procs:
            try:
                p.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                    q.wait()
                pytest.fail("mesh worker exceeded containment deadline")
            rcs.append(p.returncode)
            errs.append(p.stderr.read().decode())
        return rcs, errs

    # 1) crash run: pid 1 dies entering round 2; pid 0 must NOT hang
    rcs, errs = run({**env, "FK_TEST_DIE_AT_ROUND": "1"}, timeout=120)
    assert rcs[1] == 9
    assert rcs[0] != 0  # watchdog abort (17) or collective error — not 0
    # both hosts kept a resumable manifest + spill
    assert glob.glob(str(tmp_path / "fastk_tpu_mesh.*" / "manifest.json"))

    # 2) resume rerun completes and matches the single-chip reference
    rcs, errs = run(env, timeout=600)
    assert rcs == [0, 0], errs

    order = shard_files(data, 0, 2) + shard_files(data, 1, 2)
    want = count_files_ooc(order, 17, parts=2, sort_path=str(tmp_path),
                           table_min=1, profiles=True, batch_bases=3000,
                           out_base=str(tmp_path / "rref"), out_nparts=2)
    slices = [out_base + ".0", out_base + ".1"]
    tgt = str(tmp_path / "rspliced")
    if not cat_tables_spliced(slices, tgt, keep=True):
        cat_tables_streamed(slices, tgt, 2)
    cat_profiles_spliced(slices, tgt, keep=True)
    assert read_histogram(out_base + ".0.h") == want.hist
    ta, tb = read_ktab(tgt), read_ktab(str(tmp_path / "rref"))
    assert np.array_equal(ta.packed, tb.packed)
    assert np.array_equal(ta.counts, tb.counts)
    pa, pb = read_profiles(tgt), read_profiles(str(tmp_path / "rref"))
    for a, b in zip(pa, pb):
        assert np.array_equal(a, b)
    # successful resume cleaned the manifests up
    assert not glob.glob(
        str(tmp_path / "fastk_tpu_mesh.*" / "manifest.json"))


def test_relative_sharded_streamed(data, tmp_path):
    """Multi-chip -p:<table> with streamed ProfWriter output (disk spool,
    bounded RAM) equals the single-chip relative run."""
    from fastk_tpu.formats.prof import read_profiles
    from fastk_tpu.parallel.dist import make_mesh
    from fastk_tpu.parallel.host import relative_profiles_sharded
    from fastk_tpu.pipeline.count import count_files

    base = count_files([data[0]], 17, table_min=1, batch_bases=100000)
    want = count_files([data[1]], 17, profiles=True,
                       relative_table=base.table, batch_bases=3000)
    out = relative_profiles_sharded([data[1]], base.table, make_mesh(8),
                                    batch_bases=3000,
                                    out_base=str(tmp_path / "rel"))
    ps = read_profiles(str(tmp_path / "rel"))
    assert len(ps) == len(want.profiles)
    for a, b in zip(ps, want.profiles):
        assert np.array_equal(a, b)
    assert not any(f.endswith(("profspool", "lenspool"))
                   for f in os.listdir(tmp_path))


@pytest.mark.slow
def test_cli_multihost_two_process(data, tmp_path):
    """The fastk CLI in multi-host mode (FASTK_TPU_COORD env on 2
    processes): spliced .hist/.ktab/.prof equal a single-process run over
    the same global read order; slice file-sets are cleaned up. A second
    2-process run does -p:<table> (relative) against the spliced table."""
    import fastk_tpu as fk
    from fastk_tpu.parallel.multihost import shard_files
    from fastk_tpu.pipeline.count import count_files

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {**os.environ}
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["FASTK_TPU_NPROCS"] = "2"
    env["FASTK_TPU_BATCH_BASES"] = "3000"
    out = str(tmp_path / "mh")

    def run2(args, port):
        e0 = {**env, "FASTK_TPU_COORD": f"127.0.0.1:{port}"}
        procs = [subprocess.Popen(
            [sys.executable, "-m", "fastk_tpu.tools.fastk", *args],
            env={**e0, "FASTK_TPU_PROC": str(i)}, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            for i in range(2)]
        for p in procs:
            try:
                p.wait(timeout=900)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                    q.wait()
                pytest.fail("multihost CLI timed out")
        for p in procs:
            assert p.returncode == 0, p.stderr.read().decode()[-2000:]

    run2(["-k17", "-t1", "-p", f"-P{tmp_path}", *data, f"-N{out}"], port)

    order = shard_files(data, 0, 2) + shard_files(data, 1, 2)
    want = count_files(order, 17, table_min=1, profiles=True,
                       batch_bases=3000)
    assert fk.read_histogram(out) == want.hist
    t = fk.read_ktab(out)
    assert np.array_equal(t.packed, want.table.packed)
    assert np.array_equal(t.counts, want.table.counts)
    ps = fk.read_profiles(out)
    assert len(ps) == len(want.profiles)
    for a, b in zip(ps, want.profiles):
        assert np.array_equal(a, b)
    assert not any("mh.0" in f or "mh.1" in f for f in os.listdir(tmp_path))

    # relative profiles (-p:<table>) across 2 processes
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port2 = s.getsockname()[1]
    rout = str(tmp_path / "rel")
    run2(["-k17", f"-p:{out}.ktab", f"-P{tmp_path}", data[0],
          f"-N{rout}"], port2)
    rwant = count_files([data[0]], 17, profiles=True,
                        relative_table=want.table, batch_bases=3000)
    rps = fk.read_profiles(rout)
    assert len(rps) == len(rwant.profiles)
    for a, b in zip(rps, rwant.profiles):
        assert np.array_equal(a, b)


def test_mesh_hc_bc_match_incore(data, tmp_path):
    """-c (homopolymer compression) and -bc flow through the mesh path's
    native ingest identically to the single-chip pipeline."""
    from fastk_tpu.parallel.meshooc import count_files_mesh
    from fastk_tpu.pipeline.count import count_files

    want = count_files(data, 17, table_min=1, profiles=True,
                       batch_bases=4000, hc=True, bc=2)
    got = count_files_mesh(data, 17, table_min=1, profiles=True,
                           batch_bases=4000, hc=True, bc=2,
                           sort_path=str(tmp_path))
    assert want.hist == got.hist
    assert np.array_equal(want.table.packed, got.table.packed)
    assert np.array_equal(want.table.counts, got.table.counts)
    for a, b in zip(want.profiles, got.profiles):
        assert np.array_equal(a, b)
