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
from jax.experimental.shard_map import shard_map

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
        check_rep=False,
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
        check_rep=False,
    )
    return jax.jit(fn)
