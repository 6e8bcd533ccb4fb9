"""Multi-process pipeline execution: query sharding, shared-FS exchange,
cross-process gathers.

The reference's WGS story is N independent jobs over a shared filesystem
whose per-chromosome outputs are concatenated and then band-passed against
the *global* coverage median (volcanosv-vc-large-indel.py:266-278 +
filter_vcf_by_sig_cov_insdel.py:38-55, Merge_VCF.py).  Here every host is
one `jax.distributed` process and the same joins become:

  * `gather_across_processes` — the WGS rel_cov union: every process
    contributes its OWN chromosomes' vectors (per-host-distinct data) and
    gets back the identical global array (device all_gather via
    multihost_utils, padded to the max local size).
  * `exchange_by_chrom`       — the alignment-record all-to-all: each host
    aligns a contiguous 1/P slice of the query set against the (replicated)
    full-reference index, then per-chromosome record lists are exchanged
    over the shared filesystem (the reference's cluster medium) so each
    host receives exactly its owned chromosomes' records.  Concatenating
    parts in process order and stable-sorting by position reproduces the
    single-process record order byte-for-byte (contiguous slices preserve
    global query order on ties).
  * `barrier`                 — sync_global_devices fence between the
    produce and consume sides of an exchange.

All helpers are identity/no-op when running single-process, so the serial
and distributed paths share one driver code path.
"""
from __future__ import annotations

import os
import pickle

import numpy as np


def n_processes() -> int:
    import jax
    return jax.process_count()


def process_id() -> int:
    import jax
    return jax.process_index()


def is_rank0() -> bool:
    return process_id() == 0


def barrier(name: str) -> None:
    """Global fence across all processes (no-op single-process)."""
    if n_processes() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def shard_interval(n: int, pid: int | None = None,
                   n_procs: int | None = None) -> tuple[int, int]:
    """This process's contiguous [lo, hi) slice of an n-item work list.

    Contiguous (not round-robin) so that concatenating per-process outputs
    in pid order restores the original global item order — the property
    exchange_by_chrom's tie-breaking relies on."""
    p = process_id() if pid is None else pid
    P = n_processes() if n_procs is None else n_procs
    return (n * p) // P, (n * (p + 1)) // P


def gather_across_processes(values: np.ndarray) -> np.ndarray:
    """Union of every process's local float32 vector, ordered by process id.

    Identity when single-process.  This is the collective behind the
    WGS-global coverage median under per-host-distinct chromosome shards:
    lengths are allgathered first, vectors are padded to the max and
    allgathered, and the valid prefixes are concatenated — every process
    returns the identical global array.  Every process MUST call this the
    same number of times (it is a collective)."""
    v = np.asarray(values, np.float32).reshape(-1)
    if n_processes() == 1:
        return v
    from jax.experimental import multihost_utils
    sizes = np.asarray(multihost_utils.process_allgather(
        np.asarray([v.size], np.int32))).reshape(-1)
    s_max = int(sizes.max()) if sizes.size else 0
    if s_max == 0:
        return np.zeros(0, np.float32)
    pad = np.zeros(s_max, np.float32)
    pad[: v.size] = v
    allv = np.asarray(multihost_utils.process_allgather(pad))
    allv = allv.reshape(len(sizes), s_max)
    return np.concatenate([allv[p, : sizes[p]] for p in range(len(sizes))])


def _atomic_pickle(path: str, obj) -> None:
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        pickle.dump(obj, fh, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def broadcast_from_rank0(obj, out_dir: str, tag: str):
    """Rank 0 computes once; every other process loads its pickle after
    the barrier (dedups the WGS-global complex-SV stage, which round 3 ran
    P× — once per host — for identical output).  Single-process: identity.
    Non-rank-0 callers pass obj=None."""
    P = n_processes()
    if P == 1:
        return obj
    xch = os.path.join(out_dir, "xch")
    os.makedirs(xch, exist_ok=True)
    path = os.path.join(xch, f"{tag}_P{P}_bcast.pkl")
    if is_rank0():
        _atomic_pickle(path, obj)
    barrier(f"bcast:{tag}")
    if is_rank0():
        return obj
    with open(path, "rb") as fh:
        return pickle.load(fh)


def exchange_by_chrom(local: dict[str, list], out_dir: str, tag: str,
                      want: list[str] | None = None,
                      sort_key=lambda r: r.pos) -> dict[str, list]:
    """All-to-all of per-chromosome object lists over the shared filesystem.

    Each process contributes `local` (its query slice's records grouped by
    chromosome); after the barrier each process loads every part and keeps
    the chromosomes in `want` (None = all).  Parts concatenate in process
    order and stable-sort by `sort_key`, so ties keep global query order
    (see shard_interval).  Single-process: pure dict filter, no I/O."""
    P = n_processes()
    if P == 1:
        if want is None:
            return local
        return {c: local.get(c, []) for c in want}
    xch = os.path.join(out_dir, "xch")
    os.makedirs(xch, exist_ok=True)
    mine = os.path.join(xch, f"{tag}_P{P}_p{process_id()}.pkl")
    _atomic_pickle(mine, local)
    barrier(f"xch:{tag}")
    merged: dict[str, list] = {c: [] for c in (want or [])}
    for p in range(P):
        with open(os.path.join(xch, f"{tag}_P{P}_p{p}.pkl"), "rb") as fh:
            part = pickle.load(fh)
        for c, recs in part.items():
            if want is not None and c not in merged:
                continue
            merged.setdefault(c, []).extend(recs)
    for c in merged:
        merged[c].sort(key=sort_key)            # stable → query-order ties
    return merged
