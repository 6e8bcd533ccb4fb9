"""Small host-side interval helpers (numpy).

Replaces the reference's ad-hoc interval code and its external `bedtools`
dependency (ref: bin/VolcanoSV-asm/write_fastq_asm_general.py:8-39).
"""
from __future__ import annotations

import numpy as np


def interval_overlap(a_start, a_end, b_start, b_end):
    """Length of overlap between [a_start,a_end) and [b_start,b_end); >=0."""
    return np.maximum(
        0, np.minimum(a_end, b_end) - np.maximum(a_start, b_start)
    )


def reciprocal_overlap(a_start, a_end, b_start, b_end):
    """min(ovl/len_a, ovl/len_b); 0 if disjoint or degenerate."""
    ovl = interval_overlap(a_start, a_end, b_start, b_end)
    la = np.maximum(a_end - a_start, 1)
    lb = np.maximum(b_end - b_start, 1)
    return np.minimum(ovl / la, ovl / lb)


def merge_intervals(starts: np.ndarray, ends: np.ndarray, gap: int = 0):
    """Merge intervals closer than `gap`. Returns (starts, ends) sorted/merged."""
    if len(starts) == 0:
        return starts, ends
    order = np.argsort(starts, kind="stable")
    s, e = np.asarray(starts)[order], np.asarray(ends)[order]
    out_s, out_e = [s[0]], [e[0]]
    for i in range(1, len(s)):
        if s[i] <= out_e[-1] + gap:
            out_e[-1] = max(out_e[-1], e[i])
        else:
            out_s.append(s[i])
            out_e.append(e[i])
    return np.array(out_s), np.array(out_e)


def point_in_intervals(points: np.ndarray, starts: np.ndarray, ends: np.ndarray):
    """Boolean mask: point covered by any [start,end)?  O((n+m) log) via sweep.

    `starts`/`ends` must be merged (non-overlapping, sorted)."""
    if len(starts) == 0:
        return np.zeros(len(points), dtype=bool)
    idx = np.searchsorted(starts, points, side="right") - 1
    idx_clip = np.clip(idx, 0, len(starts) - 1)
    return (idx >= 0) & (points < ends[idx_clip])
