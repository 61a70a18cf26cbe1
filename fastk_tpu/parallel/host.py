"""Host orchestration of the multi-chip counting step: shard placement,
splitter training, result extraction and host-side assembly."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

import fastk_tpu.jaxenv  # noqa: F401  (honor JAX_PLATFORMS over plugins)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastk_tpu.ops.kmers import nwords, pad_needed
from fastk_tpu.parallel.dist import (
    prefix_histogram,
    sharded_count_fn,
    splitters_from_prefix_hist,
)


def _shard_codes(codes: np.ndarray, k: int, mesh: Mesh, shard_size: int):
    D = mesh.devices.size
    halo = pad_needed(k)
    out = np.full((D, shard_size + halo), 4, dtype=np.uint8)
    for d in range(D):
        lo = d * shard_size
        hi = min(len(codes), lo + shard_size + halo)
        if hi > lo:
            out[d, : hi - lo] = codes[lo:hi]
    flat = out.reshape(D * (shard_size + halo))
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.device_put(flat, sharding)


def train_splitters(codes: np.ndarray, k: int, mesh: Mesh,
                    sample: int = 1 << 20, bits: int = 10,
                    exact: bool = False) -> np.ndarray:
    """Train keyspace splitters on a sample (single-chip prefix histogram).

    The analog of the reference's minimizer-scheme trainer on the first
    ~1Gbp block (Determine_Scheme, split.c:491-803).

    exact: place splitters at empirical word0 quantiles of the sample
    (full 32-bit resolution) instead of `bits`-bit prefix-histogram
    boundaries — the rebalance path uses this, since a single hot prefix
    can exceed a chip's bucket at any histogram granularity."""
    D = mesh.devices.size
    if D == 1:
        return np.zeros(0, dtype=np.uint32)
    n = min(len(codes), sample)
    size = 1 << max(15, int(np.ceil(np.log2(max(n, 2)))))
    buf = np.full(size + pad_needed(k), 4, dtype=np.uint8)
    buf[:n] = codes[:n]
    if not exact:
        ph = np.asarray(prefix_histogram(jnp.asarray(buf), k, size, bits))
        return splitters_from_prefix_hist(ph, D)

    from fastk_tpu.ops.count import fold_invalid
    from fastk_tpu.ops.kmers import canonical_kmers

    @jax.jit
    def w0_sorted(c):
        words, invalid = canonical_kmers(c, k, size)
        f0 = fold_invalid((words[0],), invalid)[0]
        # unstable: no payload, and the stable default costs a hidden
        # iota tiebreak operand
        return jax.lax.sort((f0,), num_keys=1, is_stable=False)[0]

    sw = np.asarray(w0_sorted(jnp.asarray(buf)))
    nvalid = int(np.searchsorted(sw, 0xFFFFFFFF))
    if nvalid == 0:
        return splitters_from_prefix_hist(
            np.ones(1 << bits, np.int64), D)
    # exclusive upper bounds: chip d owns w0 in [spl[d-1], spl[d])
    return sw[[min(nvalid - 1, nvalid * t // D)
               for t in range(1, D)]].astype(np.uint32)


def count_files_sharded(
    paths,
    k: int,
    mesh: Mesh,
    table_min: Optional[int] = None,
    profiles: bool = False,
    batch_bases: int = 64 << 20,
    verbose: bool = False,
    relative_table=None,
):
    """Multi-chip version of pipeline.count.count_files.

    Each batch's code stream shards data-parallel across the mesh, keys
    route by range over ICI, and each chip merges ITS keyspace range
    across batches (owner-resident, spilled out-of-core between rounds —
    parallel.meshooc.count_files_mesh, which this delegates to). Chip
    order == key order, so the per-chip outputs concatenate into the
    globally sorted table. Returns a CountOutput."""
    if relative_table is not None:
        # -p:<table> mode: profiles against the given table, no counting
        return relative_profiles_sharded(
            paths, relative_table, mesh, batch_bases=batch_bases,
            verbose=verbose)

    from fastk_tpu.parallel.meshooc import count_files_mesh

    return count_files_mesh(list(paths), k, mesh=mesh, table_min=table_min,
                            profiles=profiles, batch_bases=batch_bases,
                            verbose=verbose)


def relative_profiles_sharded(
    paths,
    table,
    mesh: Mesh,
    batch_bases: int = 64 << 20,
    slack: float = 1.8,
    route_impl: str = "auto",
    verbose: bool = False,
):
    """Multi-chip `-p:<table>`: profiles of the input reads RELATIVE to a
    reference table (count = table count, or 0 if absent).

    The table is range-partitioned across chips at its own word0 quantiles
    (it is sorted, so the quantiles are exact) and stays chip-resident for
    every batch; each batch's queries route to their owner chip over ICI.
    Returns a CountOutput with profiles only (like the single-chip
    -p:<table> path, which writes no .hist/.ktab)."""
    from fastk_tpu.formats.ktab import KmerTable  # noqa: F401 (doc types)
    from fastk_tpu.io.reader import batched_reads
    from fastk_tpu.ops.count import HIST_HIGH
    from fastk_tpu.ops.kmers import packed_to_words
    from fastk_tpu.parallel.dist import sharded_relative_fn
    from fastk_tpu.pipeline.count import CountOutput, _profiles_from_positions

    k = table.kmer
    D = mesh.devices.size
    W = nwords(k)
    words = packed_to_words(table.packed, k)
    n = words.shape[0]

    # range-partition the (sorted) table at its word0 quantiles; the router
    # computes dest = #{splitters <= word0} (searchsorted side="right",
    # _route_chip), i.e. splitters are EXCLUSIVE upper bounds of each chip —
    # so the table cut for chip d is the first row with word0 >= splitter
    # (side="left"), keeping ownership consistent
    if D > 1 and n:
        splitters = words[:, 0][
            [min(n - 1, n * t // D) for t in range(1, D)]].astype(np.uint32)
    else:
        splitters = np.zeros(max(D - 1, 0), dtype=np.uint32)
    cuts = [0] + [int(np.searchsorted(words[:, 0], s, side="left"))
                  for s in splitters] + [n]
    table_cap = 1 << max(15, int(np.ceil(np.log2(max(
        max(cuts[d + 1] - cuts[d] for d in range(D)), 2)))))
    tw = np.full((D, table_cap, W), 0xFFFFFFFF, dtype=np.uint32)
    tc = np.zeros((D, table_cap), dtype=np.int32)
    for d in range(D):
        lo, hi = cuts[d], cuts[d + 1]
        tw[d, : hi - lo] = words[lo:hi]
        tc[d, : hi - lo] = np.minimum(table.counts[lo:hi], HIST_HIGH)
    axis_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    t_words = tuple(jax.device_put(np.ascontiguousarray(tw[:, :, j]),
                                   axis_sharding) for j in range(W))
    t_counts = jax.device_put(tc, axis_sharding)
    spl = jax.device_put(jnp.asarray(splitters), NamedSharding(mesh, P()))

    fn = None
    shard_size = 0
    profs = []
    nreads = totlen = 0
    for batch, _ord in batched_reads(list(paths), batch_bases):
        codes = batch.codes
        # batches can exceed batch_bases (a read is never split), so size
        # shards per batch and rebuild the program only when a batch
        # outgrows the current geometry (pow2-stepped to bound recompiles)
        need = (max(len(codes), D) + D - 1) // D
        step = 1 << 14
        need = ((need + step - 1) // step) * step
        if fn is None or need > shard_size:
            shard_size = max(need, 2 * shard_size)
            fn = sharded_relative_fn(mesh, k, shard_size, table_cap,
                                     slack=slack, route_impl=route_impl)
        out = fn(_shard_codes(codes, k, mesh, shard_size), spl,
                 t_words, t_counts)
        if int(out["route_overflow"]) > 0:
            raise RuntimeError("bucket capacity exceeded; raise slack")
        pc = np.asarray(out["pos_counts"]).reshape(-1)[
            : len(codes)].astype(np.int32)
        profs.extend(_profiles_from_positions(
            batch, np.minimum(pc, HIST_HIGH), k))
        nreads += batch.nreads
        totlen += batch.totlen
        if verbose:
            print(f"  sharded relative batch: {batch.nreads} reads",
                  flush=True)
    return CountOutput(k, None, None, profs, nreads, totlen)


def sharded_count(
    codes: np.ndarray,
    k: int,
    mesh: Mesh,
    splitters: Optional[np.ndarray] = None,
    want_positions: bool = False,
    slack: float = 1.8,
    route_impl: str = "auto",
    rebalance_state: Optional[dict] = None,
    auto_rebalance: bool = True,
    verbose: bool = False,
):
    """Count canonical k-mers of one host code stream across the mesh.

    Returns (words (n,W) uint32 sorted, counts int64, hist_arr int32[32768],
    overflow int, pos_counts int32[len(codes)] or None).

    Adaptive rebalance: when keyspace routing overflows a chip's bucket
    (splitters trained on an earlier, differently-composed sample — the
    reference refines its trie the same way, split.c:437-472), splitters
    retrain on THIS stream and the batch retries; a second overflow retries
    once more with doubled slack before failing. Results are unaffected:
    every batch's output is globally key-sorted whatever the splitters.
    rebalance_state (a dict) carries retrained splitters to later batches.
    """
    D = mesh.devices.size
    W = nwords(k)
    shard_size = (len(codes) + D - 1) // D
    step = 1 << 14
    shard_size = ((shard_size + step - 1) // step) * step

    if rebalance_state is not None and "splitters" in rebalance_state:
        splitters = rebalance_state["splitters"]
    if splitters is None:
        splitters = train_splitters(codes, k, mesh)

    def put_spl(s):
        return jax.device_put(jnp.asarray(s, dtype=jnp.uint32),
                              NamedSharding(mesh, P()))

    fn = sharded_count_fn(mesh, k, shard_size, slack=slack,
                          want_positions=want_positions,
                          route_impl=route_impl)
    codes_dev = _shard_codes(codes, k, mesh, shard_size)
    out = fn(codes_dev, put_spl(splitters))
    route_ovf = int(out["route_overflow"])
    if route_ovf > 0 and D > 1 and auto_rebalance:
        # retrain on the full current stream at exact word0 quantiles
        splitters = train_splitters(codes, k, mesh, sample=len(codes),
                                    exact=True)
        if rebalance_state is not None:
            rebalance_state["splitters"] = splitters
        if verbose:
            print(f"  route overflow ({route_ovf} records): splitters "
                  "retrained on current batch", flush=True)
        out = fn(codes_dev, put_spl(splitters))
        route_ovf = int(out["route_overflow"])
    if route_ovf > 0 and D > 1 and auto_rebalance:
        fn2 = sharded_count_fn(mesh, k, shard_size, slack=min(2 * slack, D),
                               want_positions=want_positions,
                               route_impl=route_impl)
        if verbose:
            print("  still overflowing: retrying with doubled slack",
                  flush=True)
        out = fn2(codes_dev, put_spl(splitters))
        route_ovf = int(out["route_overflow"])
    if route_ovf > 0:
        raise RuntimeError(
            f"bucket capacity exceeded by {route_ovf} records; "
            "retrain splitters or raise slack")

    # extract per-chip segments; chip order == key order
    nseg = np.asarray(out["nseg"])
    seg_valid = np.asarray(out["seg_valid"])
    seg_counts = np.asarray(out["seg_counts"])
    seg_words = [np.asarray(w) for w in out["seg_words"]]
    words_list, counts_list = [], []
    for d in range(D):
        ns = int(nseg[d])
        v = seg_valid[d, :ns]
        words_list.append(
            np.stack([w[d, :ns][v] for w in seg_words], axis=1)
            if ns else np.zeros((0, W), np.uint32))
        counts_list.append(seg_counts[d, :ns][v].astype(np.int64))
    words = np.concatenate(words_list) if words_list else np.zeros((0, W), np.uint32)
    counts = np.concatenate(counts_list) if counts_list else np.zeros(0, np.int64)

    hist_arr = np.asarray(out["hist"])
    overflow = int(out["overflow"])

    pos_counts = None
    if want_positions:
        pc = np.asarray(out["pos_counts"]).reshape(D, shard_size)
        pos_counts = pc.reshape(-1)[: len(codes)]
    return words, counts, hist_arr, overflow, pos_counts
