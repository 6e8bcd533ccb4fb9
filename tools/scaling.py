"""1→N-device scaling harness for the pipeline's sharded DP step.

Measures alignment-window throughput of parallel.step.build_sharded_align_step
(the jitted shard_map the multi-chip path runs: banded DP batch + psum'd
k-mer table + genome-axis all_gather) at several device counts and writes
SCALING.json: {n_devices, windows_per_s, cells_per_s, efficiency_vs_1}.

Each device count runs in a fresh subprocess with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N
so it is runnable anywhere (SURVEY.md §4's CPU-mesh strategy).  NOTE: on a
CPU host the N virtual devices SHARE the physical cores — wall-clock
efficiency there reflects host-core count, not mesh scalability; on real
multi-chip hardware the same harness yields the true ICI scaling curve
(BASELINE target: ≥80% linear at 2 hosts).  host_cores is recorded so the
reader can tell which regime a number came from.

Usage:
  python tools/scaling.py                 # full harness → SCALING.json
  python tools/scaling.py --child N       # one measurement (internal)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(n_devices: int, per_dev_windows: int = 8, M: int = 512,
            W: int = 128) -> dict:
    import jax
    import numpy as np

    from volcanosv_tpu.parallel import build_sharded_align_step, make_mesh
    from volcanosv_tpu.parallel.mesh import batch_sharding

    assert len(jax.devices()) == n_devices, (len(jax.devices()), n_devices)
    mesh = make_mesh(n_devices)
    step = build_sharded_align_step(mesh, W=W, d_lo=-W // 2, k=8)
    B = per_dev_windows * n_devices          # weak scaling: fixed work/device
    N = M + W
    rng = np.random.default_rng(0)
    sh = batch_sharding(mesh)
    q = jax.device_put(rng.integers(0, 4, (B, M), dtype=np.int8), sh)
    t = jax.device_put(rng.integers(0, 4, (B, N), dtype=np.int8), sh)
    qlen = jax.device_put(np.full((B,), M, np.int32), sh)
    tlen = jax.device_put(np.full((B,), M + 16, np.int32), sh)

    jax.block_until_ready(step(q, t, qlen, tlen))       # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = step(q, t, qlen, tlen)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return {
        "n_devices": n_devices,
        "batch_windows": B,
        "windows_per_s": round(B / best, 2),
        "cells_per_s": round(B * M * W / best, 0),
    }


def run_child(n: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n} "
                        + env.get("XLA_FLAGS", ""))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", str(n)],
        capture_output=True, text=True, env=env, timeout=600, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING.json"))
    args = ap.parse_args()
    if args.child is not None:
        print(json.dumps(measure(args.child)))
        return
    rows = [run_child(n) for n in args.devices]
    base = rows[0]["windows_per_s"] / rows[0]["n_devices"]
    for r in rows:
        per_dev = r["windows_per_s"] / r["n_devices"]
        r["efficiency_vs_1dev"] = round(per_dev / base, 3)
    result = {
        "metric": "sharded_dp_step_weak_scaling",
        "host_cores": os.cpu_count(),
        "note": ("virtual CPU devices share host cores; efficiency here is "
                 "bounded by host_cores/n_devices — on real multi-chip the "
                 "same harness measures true ICI scaling"),
        "rows": rows,
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
