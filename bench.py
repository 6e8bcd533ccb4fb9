"""Headline benchmark: banded affine-gap DP on one chip — plus the honest
supporting metrics (traceback-path throughput, %-of-peak arithmetic, and
end-to-end reads-aligned/s through the full aligner).

The DP kernel backs every alignment path in the engine (contig→ref,
reads→ref, read overlap, edit distance — see ops/banded_align.py +
ops/pallas/banded_dp.py), i.e. it plays the role minimap2's ksw2 plays for
the reference pipeline.

Output contract: EXACTLY ONE JSON line on stdout (the headline metric, the
driver's contract); every supporting metric goes to stderr as its own JSON
line and the whole set is written to BENCH_DETAIL.json next to this file.

%-of-peak is arithmetic, not vibes:
  * score-only mode is VPU-bound.  ops/cell is counted from the kernel body
    (ops_per_cell below, derived in _DP_OPS_COMMENT); the chip's elementwise
    int32 peak is MEASURED by a fused add/max microbenchmark on the same
    device, so pct_vpu_peak = gcups * ops_per_cell / measured_peak compares
    like with like.
  * traceback mode additionally streams 1 byte/cell of direction bits to
    HBM; its speed-of-light is HBM write bandwidth (819 GB/s on v5e), so
    pct_hbm_sol = tb_cells_per_s / 819e9.

vs_baseline normalizes to ksw2_extz2_sse (minimap2's/hifiasm's extension
DP, the engine the reference burns its alignment CPU-hours in): ~1 GCUPS
on one modern CPU core.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_GCUPS = 1.0        # ksw2-class CPU core
HBM_BW_V5E = 819e9          # bytes/s, public TPU v5e spec
# pct-of-peak denominator: pinned to the best add/max microbenchmark result
# observed on this chip (rounds 1-2 measured 5.58-7.47 TOPS run to run —
# host-RPC noise over the tunnel).  Pinning makes pct_vpu_peak comparable
# across commits; the live measurement is still reported as
# vpu_peak_measured_tops for drift tracking.
VPU_PEAK_CALIBRATED = 7.471e12

# ops/cell of the Pallas kernel inner loop (ops/pallas/banded_dp.py _kernel),
# counting one VPU op per elementwise add/max/cmp/select on the (W, B) tile:
#   substitution (eq + 2 range cmps + 2 ands + select)      6
#   E: open add, ext add, max, h_up cmp                     4
#   H: diag add, max(Hdiag,E), inject select                3
#   F prefix scan: x sub, log2(W) maxes, 2 adds, f_open 2   5 + log2(W)
#   H_new max + h_left cmp                                  2
#   validity: 2 cmps + 2 ands + 2 selects                   6
#   (traceback adds ~6 selects/adds + the u8 store)
def _ops_per_cell(W: int, traceback: bool) -> int:
    return 26 + int(np.log2(W)) + (6 if traceback else 0)


def _time_best(fn, n_iter=5, n_batches=3):
    """Best mean-batch seconds — the tunneled chip shows batch-to-batch
    noise (host RPC contention), so peak sustained is the stable stat."""
    import jax
    jax.block_until_ready(fn())           # compile
    best = float("inf")
    for _ in range(n_batches):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def bench_dp(with_traceback: bool):
    """(gcups, cells/s) for the banded DP at pipeline-like shapes."""
    import jax

    from volcanosv_tpu.ops.banded_align import Scores, banded_align_scan
    from volcanosv_tpu.ops.pallas import banded_align_pallas, pallas_available

    W, d_lo = 256, -128
    B, M = 256, 2048
    N = M + W
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (B, M), dtype=np.int8)
    t = rng.integers(0, 4, (B, N), dtype=np.int8)
    qlen = np.full((B,), M, np.int32)
    tlen = np.full((B,), M + 64, np.int32)

    if pallas_available():
        kernel = "pallas"

        def run():
            s, tb, ej = banded_align_pallas(
                q, t, qlen, tlen, W=W, d_lo=d_lo, scores=Scores(),
                with_traceback=with_traceback)
            return (s, ej) if tb is None else (s, tb, ej)
    else:
        kernel = "scan"
        qj, tj = np.asarray(q), np.asarray(t)

        def run():
            s, tb, ej = banded_align_scan(
                qj, tj, qlen, tlen, W=W, d_lo=d_lo, scores=Scores(),
                with_traceback=with_traceback)
            return (s, ej) if tb is None else (s, tb, ej)

    dt = _time_best(run)
    cells = B * M * W
    return cells / dt / 1e9, cells / dt, kernel, W


def bench_vpu_peak():
    """Measured elementwise int32 add+max throughput (ops/s) — the
    like-for-like denominator for the DP kernel's VPU utilization."""
    import jax
    import jax.numpy as jnp

    shape = (2048, 128)          # 1MB int32 tile, VMEM-resident inner loop
    iters = 512

    @jax.jit
    def chain(y, x):
        def body(_, y):
            return jnp.maximum(y + 1, x)       # 2 ops/element
        return jax.lax.fori_loop(0, iters, body, y)

    y0 = jnp.zeros(shape, jnp.int32)
    x0 = jnp.ones(shape, jnp.int32)
    dt = _time_best(lambda: chain(y0, x0))
    return 2 * iters * shape[0] * shape[1] / dt


def bench_reads_aligned():
    """End-to-end reads/s and bp/s through Aligner.align (sketch → chain →
    banded DP → CIGAR), the pipeline's map-hifi read-alignment path.

    Workload: 2000 × 8kb reads over an 800kb reference — big enough to
    amortize the per-call fixed costs (RPC round-trips over the tunneled
    chip) the way chromosome-scale batches do in the pipeline."""
    from volcanosv_tpu.aligner import Aligner
    from volcanosv_tpu.config import AlignConfig
    from volcanosv_tpu.sim import random_genome, simulate_reads

    rng = np.random.default_rng(1)
    ref = random_genome(rng, 800_000)
    reads = simulate_reads(rng, {1: ref}, coverage=20.0,
                           read_len=8_000, sub_rate=0.002, indel_rate=0.001)
    read_seqs = [(n, s) for n, s, *_ in reads]
    total_bp = sum(len(s) for _, s in read_seqs)
    aligner = Aligner(ref, AlignConfig.preset("map-hifi"))
    aligner.align(read_seqs)                  # warm: compile bucket shapes
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        alns = aligner.align(read_seqs)
        best = min(best, time.perf_counter() - t0)
    n_aln = len({a.qname for a in alns if not a.is_supplementary})
    return len(read_seqs) / best, total_bp / best, n_aln, len(read_seqs)


def main() -> None:
    # persistent compile cache (same knob the CLI production path sets) —
    # cold-start compiles otherwise dominate the first bench run
    from volcanosv_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    detail: dict = {}

    gcups_s, cells_s, kernel, W = bench_dp(with_traceback=False)
    gcups_t, cells_t, _, _ = bench_dp(with_traceback=True)
    vpu_peak = bench_vpu_peak()

    pct_vpu = 100.0 * cells_s * _ops_per_cell(W, False) / VPU_PEAK_CALIBRATED
    pct_vpu_tb = 100.0 * cells_t * _ops_per_cell(W, True) / VPU_PEAK_CALIBRATED
    pct_hbm_tb = 100.0 * cells_t / HBM_BW_V5E

    detail["kernel"] = kernel
    detail["banded_dp_score_gcups"] = round(gcups_s, 2)
    detail["banded_dp_traceback_gcups"] = round(gcups_t, 2)
    detail["vpu_peak_calibrated_tops"] = round(VPU_PEAK_CALIBRATED / 1e12, 3)
    detail["vpu_peak_measured_tops"] = round(vpu_peak / 1e12, 3)
    detail["ops_per_cell_score"] = _ops_per_cell(W, False)
    detail["ops_per_cell_traceback"] = _ops_per_cell(W, True)
    detail["pct_vpu_peak_score"] = round(pct_vpu, 1)
    detail["pct_vpu_peak_traceback"] = round(pct_vpu_tb, 1)
    detail["pct_hbm_sol_traceback"] = round(pct_hbm_tb, 1)

    try:
        reads_s, bp_s, n_aln, n_reads = bench_reads_aligned()
        detail["reads_aligned_per_s"] = round(reads_s, 1)
        detail["read_bp_aligned_per_s"] = round(bp_s, 0)
        detail["reads_mapped_frac"] = round(n_aln / max(n_reads, 1), 3)
    except Exception as e:                    # keep the headline alive
        detail["reads_aligned_per_s"] = None
        detail["reads_bench_error"] = repr(e)

    for k, v in detail.items():
        print(json.dumps({"metric": k, "value": v}), file=sys.stderr)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BENCH_DETAIL.json")
    with open(out, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps({
        "metric": "banded_dp_throughput",
        "value": round(gcups_s, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups_s / BASELINE_GCUPS, 3),
    }))


if __name__ == "__main__":
    main()
