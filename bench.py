"""Headline benchmark: banded affine-gap DP throughput on one chip (GCUPS).

The DP kernel backs every alignment path in the engine (contig→ref,
reads→ref, read overlap, edit distance — see ops/banded_align.py +
ops/pallas/banded_dp.py), i.e. it plays the role minimap2's ksw2 plays for
the reference pipeline.

Baseline for vs_baseline: ksw2_extz2_sse (minimap2's/hifiasm's extension DP,
the engine the reference burns its alignment CPU-hours in) sustains ~1 GCUPS
on one modern CPU core; we normalize to that single-core figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_GCUPS = 1.0  # ksw2-class CPU core


def main() -> None:
    import jax

    from volcanosv_tpu.ops.banded_align import Scores, banded_align_scan
    from volcanosv_tpu.ops.pallas import banded_align_pallas, pallas_available

    # batch of windows sized like contig→ref refinement work
    W, d_lo = 256, -128
    B, M = 256, 2048
    N = M + W
    rng = np.random.default_rng(0)
    q = rng.integers(0, 4, (B, M), dtype=np.int8)
    t = rng.integers(0, 4, (B, N), dtype=np.int8)
    qlen = np.full((B,), M, np.int32)
    tlen = np.full((B,), M + 64, np.int32)

    use_pallas = pallas_available()
    if use_pallas:
        def run():
            s, _, ej = banded_align_pallas(
                q, t, qlen, tlen, W=W, d_lo=d_lo, scores=Scores(),
                with_traceback=False)
            return s, ej
    else:
        qj, tj = np.asarray(q), np.asarray(t)

        def run():
            s, _, ej = banded_align_scan(
                qj, tj, qlen, tlen, W=W, d_lo=d_lo, scores=Scores(),
                with_traceback=False)
            return s, ej

    jax.block_until_ready(run())  # compile
    # best-of-3 batches of 5: the tunneled chip shows batch-to-batch noise
    # (host RPC contention), so peak sustained throughput is the stable stat
    n_iter, n_batches = 5, 3
    best_dt = float("inf")
    for _ in range(n_batches):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = run()
        jax.block_until_ready(out)
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_iter)

    cells = B * M * W  # banded cells updated per batch
    gcups = cells / best_dt / 1e9
    print(f"kernel={'pallas' if use_pallas else 'scan'}", file=sys.stderr)
    print(json.dumps({
        "metric": "banded_dp_throughput",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
    }))


if __name__ == "__main__":
    main()
