"""Multi-host (multi-process) execution scaffolding.

The reference scales across nodes by running FastK per file block and
merging tables afterwards (README.md:245-353 job plans). The TPU-native
design instead runs ONE global mesh over all hosts' chips (SURVEY §2.4
multi-node → multi-host pjit over DCN):

- `jax.distributed.initialize` connects the processes (init_from_env);
- input files shard across hosts deterministically (shard_files), reads
  keep a global order (process-major, then file, then read);
- every host feeds only its ADDRESSABLE devices of the global mesh
  (jax.make_array_from_process_local_data), and the existing shard_map
  counting program (parallel.dist.sharded_count_fn) runs unchanged — its
  all_to_all keyspace routing rides ICI within a host and DCN across
  hosts, inserted by XLA from the same code;
- hosts stay in LOCKSTEP: the global batch count is the max over hosts
  (short hosts feed sentinel-filled shards), and keyspace splitters are
  trained once on host 0's first batch and broadcast.

Single-process use degrades gracefully (process_count == 1), which is how
the driver's dryrun exercises this path without real multi-host hardware.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

import fastk_tpu.jaxenv  # noqa: F401  (honor JAX_PLATFORMS over plugins)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastk_tpu.ops.kmers import nwords, pad_needed


def init_from_env() -> Tuple[int, int]:
    """Initialize jax.distributed from FASTK_TPU_COORD / _NPROCS / _PROC
    (no-op when unset or already initialized). Returns (pid, nprocs).

    The env check comes FIRST: jax.distributed.initialize must run before
    ANY backend-initializing JAX call (even jax.process_count()), or it
    raises. Only after initialize (or when the env is unset) is it safe
    to query the process topology."""
    coord = os.environ.get("FASTK_TPU_COORD")
    if coord and "FASTK_TPU_NPROCS" in os.environ:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["FASTK_TPU_NPROCS"]),
                process_id=int(os.environ["FASTK_TPU_PROC"]),
            )
        except RuntimeError:
            pass  # already initialized (idempotent re-entry)
    return jax.process_index(), jax.process_count()


def shard_files(paths: Sequence[str], pid: int, nprocs: int) -> List[str]:
    """Deterministic per-host file assignment: size-descending greedy onto
    the least-loaded host (every process computes the same plan)."""
    sizes = []
    for p in paths:
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            sizes.append(0)
    order = sorted(range(len(paths)), key=lambda i: (-sizes[i], i))
    load = [0] * nprocs
    mine: List[Tuple[int, str]] = []
    for i in order:
        h = min(range(nprocs), key=lambda j: (load[j], j))
        load[h] += sizes[i]
        if h == pid:
            mine.append((i, paths[i]))
    return [p for _, p in sorted(mine)]


def _local_shard_rows(codes: np.ndarray, k: int, mesh: Mesh,
                      shard_size: int) -> jax.Array:
    """This process's rows of the global (D_global * (shard+halo),) code
    array, assembled into a global jax.Array without any host holding the
    whole thing."""
    halo = pad_needed(k)
    local_devices = [d for d in mesh.devices.flat
                     if d.process_index == jax.process_index()]
    dl = len(local_devices)
    rows = np.full((dl, shard_size + halo), 4, dtype=np.uint8)
    for r in range(dl):
        lo = r * shard_size
        hi = min(len(codes), lo + shard_size + halo)
        if hi > lo:
            rows[r, : hi - lo] = codes[lo:hi]
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    D = mesh.devices.size
    return jax.make_array_from_process_local_data(
        sharding, rows.reshape(dl * (shard_size + halo)),
        (D * (shard_size + halo),))


def _allgather_ragged(arr: np.ndarray) -> List[np.ndarray]:
    """Gather a per-host variable-length array to every host (pads to the
    max length under the hood). Single-process: identity."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return [arr]
    n = np.array([arr.shape[0]], np.int64)
    ns = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    cap = int(ns.max())
    pad_shape = (cap,) + arr.shape[1:]
    padded = np.zeros(pad_shape, dtype=arr.dtype)
    padded[: arr.shape[0]] = arr
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [gathered[i, : int(ns[i])] for i in range(len(ns))]


def count_files_multihost(
    paths: Sequence[str],
    k: int,
    mesh: Optional[Mesh] = None,
    table_min: Optional[int] = None,
    batch_bases: int = 64 << 20,
    slack: float = 1.8,
    verbose: bool = False,
):
    """Global-mesh counting across hosts: histogram + sorted table, every
    host returning the complete result (CountOutput). Profiles follow the
    reference's per-block model and are produced per host with
    count_files_sharded on the host's own shard when needed."""
    from jax.experimental import multihost_utils

    from fastk_tpu.formats.hist import Histogram
    from fastk_tpu.formats.ktab import KmerTable
    from fastk_tpu.io.reader import batched_reads
    from fastk_tpu.ops.count import HIST_HIGH
    from fastk_tpu.ops.kmers import words_to_packed
    from fastk_tpu.ops.tables import merge_counted
    from fastk_tpu.parallel.dist import sharded_count_fn
    from fastk_tpu.parallel.host import train_splitters
    from fastk_tpu.pipeline.count import CountOutput

    pid, nprocs = jax.process_index(), jax.process_count()
    if mesh is None:
        dev = np.array(jax.devices())
        mesh = Mesh(dev, ("d",))
    D = mesh.devices.size
    W = nwords(k)
    my_paths = shard_files(paths, pid, nprocs) if nprocs > 1 else list(paths)

    # STREAMED lockstep: batches are never materialized up front (host RAM
    # stays O(batch)); each round every host contributes "do I still have
    # data" to a tiny allgather, and rounds continue while ANY host does —
    # short hosts feed sentinel-filled shards to keep the collectives
    # aligned.
    gen = (b for b, _ in batched_reads(my_paths, batch_bases))

    # shared shard geometry + splitters (host 0 trains, everyone agrees):
    # each host's ~batch_bases batch shards over its LOCAL devices, with
    # headroom for the final read of a batch overshooting the target
    n_local = sum(1 for d in mesh.devices.flat
                  if d.process_index == pid)
    shard_size = (3 * batch_bases // 2 + n_local - 1) // max(n_local, 1)
    step = 1 << 14
    shard_size = ((shard_size + step - 1) // step) * step
    first_batch = next(gen, None)
    first_codes = (first_batch.codes if first_batch is not None
                   else np.full(1024, 4, np.uint8))
    splitters = train_splitters(first_codes, k, mesh)
    if nprocs > 1:
        splitters = np.asarray(multihost_utils.broadcast_one_to_all(
            splitters.astype(np.uint32)))
    spl = jax.device_put(jnp.asarray(splitters, dtype=jnp.uint32),
                         NamedSharding(mesh, P()))
    fn = sharded_count_fn(mesh, k, shard_size, slack=slack,
                          want_positions=False)

    words_list, counts_list = [], []
    nvalid = 0
    nreads = totlen = 0
    empty = np.full(16, 4, dtype=np.uint8)
    i = 0
    batch = first_batch
    while True:
        if nprocs > 1:
            flags = np.asarray(multihost_utils.process_allgather(
                np.array([0 if batch is None else 1], np.int64))).reshape(-1)
            if int(flags.max()) == 0:
                break
        elif batch is None:
            break
        codes = batch.codes if batch is not None else empty
        if len(codes) > n_local * shard_size:
            raise ValueError("batch exceeds this host's shard capacity; "
                             "lower batch_bases")
        out = fn(_local_shard_rows(codes, k, mesh, shard_size), spl)
        if int(out["route_overflow"]) > 0:
            raise RuntimeError("bucket capacity exceeded; raise slack")
        if batch is not None:
            nreads += batch.nreads
            totlen += batch.totlen
        # this host's keyspace slices live on its local devices; gather the
        # compacted segments host-locally, then exchange across hosts
        local_words, local_counts, chip_ids = _local_segments(out, mesh, W)
        for g in _allgather_ragged(np.concatenate([
                chip_ids[:, None].astype(np.uint32),
                local_words.astype(np.uint32),
                local_counts[:, None].astype(np.uint32)], axis=1)
                if len(chip_ids) else np.zeros((0, W + 2), np.uint32)):
            if len(g):
                words_list.append(g[:, 1: 1 + W])
                counts_list.append(g[:, 1 + W].astype(np.int64))
        if verbose and pid == 0:
            print(f"  multihost round {i + 1}", flush=True)
        del batch
        batch = next(gen, None)
        i += 1

    if not words_list:
        words_list = [np.zeros((0, W), np.uint32)]
        counts_list = [np.zeros(0, np.int64)]
    u_words, u_counts = merge_counted(words_list, counts_list)
    clipped = np.minimum(u_counts, HIST_HIGH)
    overflow = int((u_counts - clipped).sum())
    hist = Histogram.from_clipped_counts(k, clipped, overflow)
    table = None
    if table_min is not None:
        keep = clipped >= table_min
        table = KmerTable(k, table_min, words_to_packed(u_words[keep], k),
                          clipped[keep].astype(np.uint16))
    if nprocs > 1:
        tot = np.asarray(multihost_utils.process_allgather(
            np.array([nreads, totlen], np.int64)))
        nreads, totlen = int(tot[:, 0].sum()), int(tot[:, 1].sum())
    return CountOutput(k, hist, table, None, nreads, totlen)


def _local_segments(out, mesh: Mesh, W: int):
    """Extract the compacted (words, counts) of the chips THIS process
    addresses, tagged with their global chip index (= keyspace order).
    seg_valid alone delimits real segments (False beyond nseg and at the
    invalid tail, segmented_count)."""
    dev_order = {d: i for i, d in enumerate(mesh.devices.flat)}

    def rows_of(arr):
        rows = [(dev_order[s.device], np.asarray(s.data))
                for s in arr.addressable_shards]
        rows.sort(key=lambda t: t[0])
        return rows

    rows_c = rows_of(out["seg_counts"])
    rows_v = rows_of(out["seg_valid"])
    rows_w = [rows_of(out["seg_words"][j]) for j in range(W)]

    words_out, counts_out, chips_out = [], [], []
    for idx in range(len(rows_c)):
        d, cvals = rows_c[idx]
        v = rows_v[idx][1].reshape(-1).astype(bool)
        cv = cvals.reshape(-1)[v]
        wv = (np.stack([rows_w[j][idx][1].reshape(-1)[v]
                        for j in range(W)], axis=1)
              if v.any() else np.zeros((0, W), np.uint32))
        words_out.append(wv)
        counts_out.append(np.minimum(cv, 0x7FFFFFFF))
        chips_out.append(np.full(len(cv), d, np.int64))
    if words_out:
        return (np.concatenate(words_out), np.concatenate(counts_out),
                np.concatenate(chips_out))
    return (np.zeros((0, W), np.uint32), np.zeros(0, np.int64),
            np.zeros(0, np.int64))
