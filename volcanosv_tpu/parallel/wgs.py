"""WGS cross-shard collectives: signature merge + global call statistics.

The reference's WGS story is chromosome-aligned shards whose outputs are
file-concatenated (volcanosv-vc-large-indel.py:266-278, Merge_VCF.py) and
whose coverage band-pass uses a *global* per-run median
(filter_vcf_by_sig_cov_insdel.py) — computed after the concat.  On a device
mesh the same joins become collectives over the "genome" axis:

  * `build_sig_merge_step` — all_gather each shard's (pos, svlen) signature
    tensor, sort globally, drop near-duplicate neighbors (the cross-shard
    boundary dedup; match = shift ≤ max_shift ∧ size-sim ≥ min_size_sim,
    same rule as remove_redundancy.py:92-125).
  * `build_global_median_step` — all_gather per-shard rel_cov vectors and
    take the masked global median on device: the WGS statistic the
    coverage filter bands against.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mesh import AXES


def _sig_merge_local(pos, svlen, valid, *, max_shift: int,
                     min_size_sim: float):
    """Per-shard body: gather all shards' sigs, sort, neighbor-dedup."""
    gp = jax.lax.all_gather(pos, AXES.genome).reshape(-1)
    gl = jax.lax.all_gather(svlen, AXES.genome).reshape(-1)
    gv = jax.lax.all_gather(valid, AXES.genome).reshape(-1)
    # sort by (valid desc, pos): invalid rows sink to the end
    key = jnp.where(gv, gp, jnp.iinfo(gp.dtype).max)
    order = jnp.argsort(key)
    sp, sl, sv = gp[order], gl[order], gv[order]
    prev_pos = jnp.concatenate([sp[:1] - max_shift - 1, sp[:-1]])
    prev_len = jnp.concatenate([sl[:1], sl[:-1]])
    ssim = jnp.minimum(sl, prev_len) / jnp.maximum(
        jnp.maximum(sl, prev_len), 1)
    dup = (sp - prev_pos <= max_shift) & (ssim >= min_size_sim)
    keep = sv & ~dup
    return sp, sl, keep


def build_sig_merge_step(mesh: Mesh, *, max_shift: int = 100,
                         min_size_sim: float = 0.5):
    """jit(shard_map): per-shard padded sig arrays (S,) → globally sorted
    (S·n_shards,) arrays + keep mask, replicated on every device."""
    fn = shard_map(
        functools.partial(_sig_merge_local, max_shift=max_shift,
                          min_size_sim=min_size_sim),
        mesh=mesh,
        in_specs=(P(AXES.genome), P(AXES.genome), P(AXES.genome)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def _median_local(x, valid):
    gx = jax.lax.all_gather(x, AXES.genome).reshape(-1)
    gv = jax.lax.all_gather(valid, AXES.genome).reshape(-1)
    n = jnp.sum(gv)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, gx.dtype)
    sx = jnp.sort(jnp.where(gv, gx, big))
    lo = jnp.clip((n - 1) // 2, 0, gx.shape[0] - 1)
    hi = jnp.clip(n // 2, 0, gx.shape[0] - 1)
    med = (sx[lo] + sx[hi]) / 2
    return jnp.where(n > 0, med, 0.0)


def build_global_median_step(mesh: Mesh):
    """jit(shard_map): per-shard (S,) float values + valid mask → global
    masked median scalar, replicated."""
    fn = shard_map(
        _median_local,
        mesh=mesh,
        in_specs=(P(AXES.genome), P(AXES.genome)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def wgs_global_median(values_by_shard: list, mesh: Mesh | None = None,
                      ) -> float:
    """WGS-global median of per-chromosome value vectors — THE statistic the
    coverage band-pass bands against (filter_vcf_by_sig_cov_insdel.py:38-55
    takes the 0.5 quantile of the concatenated all-chromosome rel_cov set,
    after the concat at volcanosv-vc-large-indel.py:266-278).

    This is the pipeline's execution path for the large-indel drivers
    (cli.cmd_vc_large_indel / cmd_run): each chromosome's rel_cov vector is
    a genome-axis shard, padded to a common length, and the median is an
    all_gather + masked device sort over the mesh.  Falls back to a host
    median when no multi-device mesh is available (or when values are
    empty), producing the identical float32 statistic."""
    import numpy as np
    arrs = [np.asarray(v, np.float32).reshape(-1) for v in values_by_shard]
    flat = np.concatenate(arrs) if arrs else np.zeros(0, np.float32)
    if flat.size == 0:
        return 0.0
    if mesh is None or mesh.devices.size <= 1:
        # float32 mirror of _median_local so the mesh and serial paths
        # produce bit-identical medians (→ byte-identical VCFs)
        s = np.sort(flat)
        n = len(s)
        return float((s[(n - 1) // 2] + s[n // 2]) / np.float32(2))
    n_sh = mesh.shape[AXES.genome]
    # pack chromosome vectors into n_sh equal shards (round-robin), padded
    per = [list() for _ in range(n_sh)]
    for i, a in enumerate(arrs):
        per[i % n_sh].append(a)
    shards = [np.concatenate(p) if p else np.zeros(0, np.float32)
              for p in per]
    S = max(max(len(s) for s in shards), 1)
    vals = np.zeros((n_sh, S), np.float32)
    valid = np.zeros((n_sh, S), bool)
    for i, s in enumerate(shards):
        vals[i, :len(s)] = s
        valid[i, :len(s)] = True
    from jax.sharding import NamedSharding
    sh = NamedSharding(mesh, P(AXES.genome))
    v = jax.device_put(jnp.asarray(vals.reshape(-1)), sh)
    m = jax.device_put(jnp.asarray(valid.reshape(-1)), sh)
    med = build_global_median_step(mesh)(v, m)
    return float(jax.device_get(med))
