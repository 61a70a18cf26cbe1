#!/usr/bin/env python
"""Host-side tool throughput vs the reference C binaries, same box.

Builds two multi-million-entry tables with the ORACLE (so table bytes are
identical for both sides), then times, on identical inputs:

  fastmerge  (streamed window sum-merge)    vs  oracle Fastmerge
  logex A|+B (streamed window truth-table)  vs  oracle Logex
  symmex     (canonical -> symmetric table) vs  oracle Symmex

Prints one JSON line per tool: {"tool", "ours_s", "oracle_s", "ratio"}.
The point: the numpy window engine must stay within a small factor of C on
a single core (it also parallelizes across windows where C does threads).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ORACLE = "/tmp/fastk_oracle"
HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def make_fasta(path: str, nbases: int, seed: int) -> None:
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"acgt", dtype=np.uint8)
    with open(path, "w") as f:
        read_len = 2000
        n = nbases // read_len
        for i in range(n):
            s = bases[rng.integers(0, 4, size=read_len)].tobytes().decode()
            f.write(f">r{i}\n{s}\n")


def _rm_set(cwd, root):
    """Remove a .ktab stub + hidden parts: the reference Logex PROMPTS
    when its output exists and `while (getc(stdin) != '\\n')` spins forever
    at EOF under automation (Logex.c:1333-1346) — outputs must not
    pre-exist when timing it."""
    import glob

    for f in glob.glob(os.path.join(cwd, root + ".ktab")) + glob.glob(
            os.path.join(cwd, "." + root + ".ktab.*")):
        try:
            os.unlink(f)
        except OSError:
            pass


def run(cmd, cwd, timeout=900):
    # timeout guards against EOF-stdin prompt loops in the reference
    # binaries (see _rm_set); a timed-out run reports +inf
    t0 = time.perf_counter()
    try:
        r = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"# TIMEOUT: {' '.join(cmd)}", file=sys.stderr)
        return float("inf")
    dt = time.perf_counter() - t0
    assert r.returncode == 0, (cmd, r.stderr[-500:])
    return dt


def tool(mod, args, cwd, expect_fail=False, timeout=900):
    # the shipped bin/ launcher: what a real CLI user runs. It clears
    # interpreter-startup device hooks (this box's sitecustomize imports
    # jax on EVERY python start, ~1.7s) before exec'ing python, so the
    # raw wall here includes the honest ~0.3-0.5s interpreter+numpy
    # startup a launcher user actually pays.
    t0 = time.perf_counter()
    repo = os.path.dirname(HERE)
    launcher = os.path.join(repo, "bin", mod)
    try:
        r = subprocess.run(
            [launcher, *args], cwd=cwd, capture_output=True, text=True,
            timeout=timeout,
            env={**os.environ, "FASTK_PYTHON": sys.executable})
    except subprocess.TimeoutExpired:
        print(f"# TIMEOUT: ours {mod}", file=sys.stderr)
        return float("inf")
    dt = time.perf_counter() - t0
    if not expect_fail:
        assert r.returncode == 0, (mod, args, r.stderr[-500:])
    return dt


def main() -> int:
    mb = int(os.environ.get("BENCH_TOOLS_MB", "24"))
    with tempfile.TemporaryDirectory(prefix="fkbt") as d:
        for i in (1, 2):
            make_fasta(os.path.join(d, f"in{i}.fasta"), mb << 20, seed=i)
            dt = run([os.path.join(ORACLE, "FastK"), "-k40", "-t1", "-P.",
                      f"-NA{i}", f"in{i}.fasta"], d)
            print(f"# oracle FastK table {i}: {dt:.1f}s", file=sys.stderr)

        # the launcher's fixed startup (interpreter + numpy; the bin/
        # scripts clear this box's jax-importing sitecustomize before
        # python starts); reported so the tool-work ratio is visible
        # next to the raw wall ratio
        startup = min(
            tool("fastmerge", [], d, expect_fail=True) for _ in range(2))
        print(f"# launcher startup: {startup:.2f}s", file=sys.stderr)

        results = []
        jobs = [
            ("fastmerge", ["-t", "M", "A1", "A2"],
             ("Fastmerge", ["-t", "OM", "A1", "A2"]), "OM"),
            ("logex", ["U = A|+B", "A1", "A2"],
             ("Logex", ["OU = A|+B", "A1", "A2"]), "OU"),
            ("logex", ["I = A&.B", "A1", "A2"],
             ("Logex", ["OI = A&.B", "A1", "A2"]), "OI"),
            ("logex", ["D = (A-B)|+(B-A)", "A1", "A2"],
             ("Logex", ["OD = (A-B)|+(B-A)", "A1", "A2"]), "OD"),
            ("logex", ["F = (A&+B)[4-100]", "A1", "A2"],
             ("Logex", ["OF = (A&+B)[4-100]", "A1", "A2"]), "OF"),
            ("symmex", ["A1", "S"], ("Symmex", ["A1", "OS"]), "OS"),
        ]
        for mod, margs, (otool, oargs), oout in jobs:
            # best-of-2 for BOTH sides: this box's disk/memory throttling
            # swings single runs ~40%, and the second run gives each side
            # the same warm page cache for the input tables
            ours = min(tool(mod, margs, d) for _ in range(2))
            oracle = float("inf")
            for _ in range(2):
                _rm_set(d, oout)  # see _rm_set: oracle prompts + spins
                oracle = min(oracle,
                             run([os.path.join(ORACLE, otool), *oargs], d))
            results.append(dict(tool=mod, ours_s=round(ours, 2),
                                oracle_s=round(oracle, 2),
                                ratio=round(ours / oracle, 2),
                                ratio_net_startup=round(
                                    max(ours - startup, 0.01) / oracle, 2)))
            print(json.dumps(results[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
