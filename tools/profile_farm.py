"""Profile the assembly farm (overlap + layout + polish) on a synthetic
chromosome, mimicking the pipeline's phase-block hap groups.

Usage: python tools/profile_farm.py [--mb 1.0] [--profile]
"""
import argparse
import cProfile
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from volcanosv_tpu import sim
from volcanosv_tpu.assembly import run_assembly
from volcanosv_tpu.config import AssemblyConfig


def build_groups(mb: float, block_kb: float = 250.0, coverage: float = 12.0,
                 read_len: int = 7000, seed: int = 7):
    rng = np.random.default_rng(seed)
    ref = sim.random_genome(rng, int(mb * 1e6), n_chroms=1)
    hap1, hap2, _t = sim.implant_svs(rng, ref, n_del=int(3 * mb),
                                     n_ins=int(3 * mb),
                                     min_len=80, max_len=500)
    groups = {}
    L = len(ref["chr1"])
    bl = int(block_kb * 1000)
    for hp, hap in ((1, hap1), (2, hap2)):
        hseq = hap["chr1"]
        for bi, start in enumerate(range(0, L, bl)):
            end = min(start + bl, len(hseq))
            if end - start < 20000:
                continue
            block = hseq[start:end]
            reads = sim.simulate_reads(rng, {1: {"chr1": block}},
                                       coverage=coverage, read_len=read_len,
                                       sub_rate=0.002, indel_rate=0.001)
            groups[f"PS{bi}_{start}_{end}_hp{hp}"] = [s for _n, s, *_ in reads]
    return groups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=1.0)
    ap.add_argument("--block_kb", type=float, default=250.0)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--rounds", type=int, default=None)
    args = ap.parse_args()
    groups = build_groups(args.mb, block_kb=args.block_kb)
    n_reads = sum(len(v) for v in groups.values())
    print(f"{len(groups)} groups, {n_reads} reads")
    cfg = AssemblyConfig()
    if args.rounds is not None:
        cfg = AssemblyConfig(consensus_rounds=args.rounds)
    t0 = time.time()
    if args.profile:
        pr = cProfile.Profile()
        pr.enable()
        contigs, failed = run_assembly(groups, cfg)
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(40)
    else:
        contigs, failed = run_assembly(groups, cfg)
    dt = time.time() - t0
    total = sum(len(c) for c in contigs.values())
    print(f"wall {dt:.1f}s  contigs={len(contigs)} total_bp={total} "
          f"failed={len(failed)}  s/Mb={dt/args.mb:.1f}")


if __name__ == "__main__":
    main()
