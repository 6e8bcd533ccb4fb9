"""WGS collectives on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from volcanosv_tpu.parallel import make_mesh
from volcanosv_tpu.parallel.mesh import AXES, batch_sharding
from volcanosv_tpu.parallel.wgs import (build_global_median_step,
                                        build_sig_merge_step)


def _shard_put(mesh, x):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(AXES.genome)))


def test_sig_merge_dedups_boundary_duplicates():
    mesh = make_mesh(8, genome_shards=4)
    S = 8                                  # per-shard padded sig slots
    n_sh = mesh.shape[AXES.genome]
    pos = np.full((n_sh * S,), 0, np.int64)
    svlen = np.full((n_sh * S,), 1, np.int64)
    valid = np.zeros((n_sh * S,), bool)
    # shard 0: sigs at 1000 (len 100) and 5000 (len 60)
    pos[0:2] = [1000, 5000]; svlen[0:2] = [100, 60]; valid[0:2] = True
    # shard 1: boundary duplicate of the 5000 sig (shift 40, same size)
    pos[S] = 5040; svlen[S] = 58; valid[S] = True
    # shard 2: distinct sig
    pos[2 * S] = 9000; svlen[2 * S] = 200; valid[2 * S] = True
    step = build_sig_merge_step(mesh, max_shift=100, min_size_sim=0.5)
    sp, sl, keep = step(_shard_put(mesh, pos), _shard_put(mesh, svlen),
                        _shard_put(mesh, valid))
    sp, sl, keep = map(np.asarray, (sp, sl, keep))
    kept = sorted(zip(sp[keep].tolist(), sl[keep].tolist()))
    assert kept == [(1000, 100), (5000, 60), (9000, 200)], kept


def test_global_median_matches_numpy():
    mesh = make_mesh(8, genome_shards=4)
    rng = np.random.default_rng(0)
    n_sh = mesh.shape[AXES.genome]
    S = 16
    x = rng.uniform(0, 10, n_sh * S).astype(np.float32)
    valid = rng.random(n_sh * S) < 0.7
    step = build_global_median_step(mesh)
    med = float(step(_shard_put(mesh, x), _shard_put(mesh, valid)))
    want = float(np.median(x[valid]))
    assert abs(med - want) < 1e-5, (med, want)


def test_global_median_empty():
    mesh = make_mesh(8, genome_shards=4)
    S = 8
    n_sh = mesh.shape[AXES.genome]
    step = build_global_median_step(mesh)
    med = float(step(_shard_put(mesh, np.zeros(n_sh * S, np.float32)),
                     _shard_put(mesh, np.zeros(n_sh * S, bool))))
    assert med == 0.0


def test_init_multihost_noop_single_process():
    from volcanosv_tpu.parallel import init_multihost
    assert init_multihost() is False     # no coordinator → local mode


def test_host_chromosome_shard_partition():
    from volcanosv_tpu.parallel import host_chromosome_shard
    chroms = [f"chr{i}" for i in range(1, 23)]
    shards = [host_chromosome_shard(chroms, p, 4) for p in range(4)]
    # disjoint cover
    flat = [c for s in shards for c in s]
    assert sorted(flat) == sorted(chroms)
    assert all(len(s) in (5, 6) for s in shards)
    # current (single) process owns everything
    assert host_chromosome_shard(chroms) == chroms


def test_wgs_global_median_ragged_chrom_vectors():
    """The pipeline's own path (cli._call_large_indels): ragged per-chrom
    rel_cov vectors → collective median == host median."""
    from volcanosv_tpu.parallel.wgs import wgs_global_median
    mesh = make_mesh(8, genome_shards=4)
    rng = np.random.default_rng(3)
    rels = [rng.uniform(0, 5, n).astype(np.float32)
            for n in (7, 0, 23, 11, 5)]
    got = wgs_global_median(rels, mesh)
    want = float(np.median(np.concatenate(rels)))
    assert abs(got - want) < 1e-5, (got, want)
    # serial fallback (mesh=None) must agree bit-for-bit with itself
    host = wgs_global_median(rels, None)
    assert abs(host - want) < 1e-5


def test_wgs_global_median_empty():
    from volcanosv_tpu.parallel.wgs import wgs_global_median
    assert wgs_global_median([], None) == 0.0
    assert wgs_global_median([np.zeros(0, np.float32)], None) == 0.0
