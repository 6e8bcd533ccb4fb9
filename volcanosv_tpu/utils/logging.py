"""Logging + per-stage timing.

The reference copy-pastes a ``logging.basicConfig`` block into every script
(e.g. unphased_reads_assignment_kmer_norm.py:23-29) and has no profiling at
all (SURVEY.md §5).  Here: one logger factory + a context-manager stage timer
that accumulates a per-stage wall-clock table usable for pipeline reports.
"""
from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

_FORMAT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"
_configured = False

# global stage -> [total_seconds, n_calls]
STAGE_TIMES: dict[str, list[float]] = defaultdict(lambda: [0.0, 0])


def get_logger(name: str = "volcanosv") -> logging.Logger:
    global _configured
    if not _configured:
        logging.basicConfig(level=logging.INFO, format=_FORMAT)
        _configured = True
    return logging.getLogger(name)


@contextlib.contextmanager
def stage_timer(stage: str, log: logging.Logger | None = None):
    """Time a pipeline stage; accumulate into STAGE_TIMES."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        rec = STAGE_TIMES[stage]
        rec[0] += dt
        rec[1] += 1
        if log is not None:
            log.info("stage %-28s %8.3fs", stage, dt)


def stage_report() -> str:
    lines = [f"{'stage':<32}{'calls':>8}{'total_s':>12}"]
    for k, (tot, n) in sorted(STAGE_TIMES.items(), key=lambda kv: -kv[1][0]):
        lines.append(f"{k:<32}{n:>8}{tot:>12.3f}")
    return "\n".join(lines)
