"""Real multi-process (2-host) demo of the pipeline's distributed layer.

Spawns N python processes that join ONE jax.distributed process group over
a localhost coordinator (CPU backend, 4 virtual devices per process), then
exercises the pipeline's actual multi-host path end to end:

  * `init_multihost`       — every process joins the group
  * `host_chromosome_shard`— each host owns a disjoint chromosome share
                             (the '22 SLURM jobs' replacement)
  * `make_mesh` + `wgs_global_median` — the WGS coverage median as a
    genome-axis collective over the GLOBAL mesh (both hosts' devices),
    validated against the single-host answer
  * `build_sharded_align_step` — one sharded DP step over the global mesh
    (ICI/DCN collectives in the real deployment)

Writes MULTIHOST.json with per-host shard ownership, the cross-host median
check, and step timings.  Runnable anywhere (no TPU pod needed):

  python tools/multihost.py            # parent: spawns 2 workers
  python tools/multihost.py --n 4      # 4 processes
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 39617


def worker(pid: int, n: int, devs_per_proc: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from volcanosv_tpu.parallel.mesh import (host_chromosome_shard,
                                             init_multihost, make_mesh)
    ok = init_multihost(coordinator_address=f"127.0.0.1:{PORT}",
                        num_processes=n, process_id=pid)
    assert ok, "process group init failed"
    assert jax.process_count() == n
    assert len(jax.devices()) == n * devs_per_proc     # global device view

    chroms = [f"chr{i}" for i in range(1, 23)]
    own = host_chromosome_shard(chroms)

    import numpy as np

    from volcanosv_tpu.parallel import build_sharded_align_step
    from volcanosv_tpu.parallel.mesh import batch_sharding
    from volcanosv_tpu.parallel.wgs import wgs_global_median

    mesh = make_mesh()                                  # global mesh
    # every process contributes the same per-chromosome rel_cov vectors
    # (deterministic), so the collective median must equal the host median
    rng = np.random.default_rng(7)
    rels = [rng.uniform(0, 4, m).astype(np.float32) for m in (11, 5, 17, 8)]
    med = wgs_global_median(rels, mesh)
    want = float(np.median(np.concatenate(rels)))
    assert abs(med - want) < 1e-5, (med, want)

    step = build_sharded_align_step(mesh, W=64, d_lo=-32, k=6)
    B, M = 4 * len(jax.devices()), 128
    sh = batch_sharding(mesh)
    # multi-process sharded arrays: build from per-device local shards
    from jax.sharding import NamedSharding
    def gput(x):
        return jax.make_array_from_process_local_data(sh, x)
    q = gput(rng.integers(0, 4, (B, M), dtype=np.int8))
    t = gput(rng.integers(0, 4, (B, M + 64), dtype=np.int8))
    qlen = gput(np.full((B,), M, np.int32))
    tlen = gput(np.full((B,), M + 8, np.int32))
    t0 = time.perf_counter()
    out = step(q, t, qlen, tlen)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({"pid": pid, "devices": len(jax.devices()),
                      "own_chroms": own, "median_ok": True,
                      "step_s": round(dt, 3)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--devs", type=int, default=4)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "MULTIHOST.json"))
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.n, args.devs)
        return
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = REPO
    env_base.pop("JAX_PLATFORMS", None)
    procs = []
    for pid in range(args.n):
        env = dict(env_base)
        env["JAX_PLATFORMS"] = "cpu"
        inherited = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                            f"{args.devs} " + inherited).strip()
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(pid),
             "--n", str(args.n), "--devs", str(args.devs)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO))
    rows = []
    ok = True
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        if p.returncode != 0:
            ok = False
            print(err[-2000:], file=sys.stderr)
            continue
        rows.append(json.loads(out.strip().splitlines()[-1]))
    # shard ownership must partition the chromosome set
    all_chroms = sorted(c for r in rows for c in r["own_chroms"])
    result = {
        "n_processes": args.n,
        "devices_per_process": args.devs,
        "ok": ok and len(rows) == args.n
              and all_chroms == sorted(f"chr{i}" for i in range(1, 23)),
        "rows": rows,
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
