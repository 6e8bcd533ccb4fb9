"""Pallas banded-DP kernel vs the lax.scan oracle (interpret mode on CPU)."""
import numpy as np
import pytest

from volcanosv_tpu.ops.banded_align import (Scores, banded_align_scan,
                                            full_affine_score_np,
                                            traceback_cigar)
from volcanosv_tpu.ops.pallas import banded_align_pallas


def _case(rng, B, M, W, d_lo, indel_rate=0.02):
    q = rng.integers(0, 4, (B, M), dtype=np.int8)
    t = np.empty((B, M + W), dtype=np.int8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for b in range(B):
        # mutated copy so scores are non-trivial
        seq = list(q[b])
        i = 0
        out = []
        while i < len(seq):
            r = rng.random()
            if r < indel_rate / 2:
                out.extend(rng.integers(0, 4, rng.integers(1, 4)))
            elif r < indel_rate:
                i += int(rng.integers(1, 3))
                continue
            out.append(seq[i])
            i += 1
        tl = min(len(out), M + W)
        ql = M - int(rng.integers(0, 8))
        # keep the band feasible: (tlen-qlen) - d_lo < W
        tl = min(tl, ql + d_lo + W - 1)
        tl = max(tl, max(1, ql + d_lo + 1))
        t[b, :tl] = np.array(out[:tl], np.int8)
        t[b, tl:] = 4
        q[b, ql:] = 4
        qlen[b], tlen[b] = ql, tl
    return q, t, qlen, tlen


@pytest.mark.parametrize("W,d_lo,M,B", [(128, -64, 256, 4), (256, -128, 512, 3)])
def test_pallas_matches_scan(W, d_lo, M, B):
    rng = np.random.default_rng(3)
    q, t, qlen, tlen = _case(rng, B, M, W, d_lo)
    s_ref, tb_ref, ej_ref = banded_align_scan(
        q, t, qlen, tlen, W=W, d_lo=d_lo)
    s_pl, tb_pl, ej_pl = banded_align_pallas(
        q, t, qlen, tlen, W=W, d_lo=d_lo, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pl))
    np.testing.assert_array_equal(np.asarray(ej_ref), np.asarray(ej_pl))
    # tracebacks must produce identical CIGARs (bitwise tb may differ in
    # tie-break regions that the walk never visits)
    tb_ref = np.asarray(tb_ref)
    tb_pl = np.asarray(tb_pl)
    for b in range(B):
        c1 = traceback_cigar(tb_ref[:, b], int(qlen[b]), int(tlen[b]), d_lo)
        c2 = traceback_cigar(tb_pl[:, :, b], int(qlen[b]), int(tlen[b]), d_lo)
        assert c1 == c2, b


def test_pallas_matches_full_dp_scores():
    """Against the O(mn) numpy oracle on tiny inputs."""
    rng = np.random.default_rng(9)
    W, d_lo, M, B = 128, -64, 64, 2
    q, t, qlen, tlen = _case(rng, B, M + 64, W, d_lo)
    q, qlen = q[:, :M], np.minimum(qlen, M)
    tlen = np.minimum(tlen, M + d_lo + W - 1)
    s_pl, _, _ = banded_align_pallas(
        q, t, qlen, tlen, W=W, d_lo=d_lo, with_traceback=False,
        interpret=True)
    for b in range(B):
        want = full_affine_score_np(q[b, :qlen[b]], t[b, :tlen[b]])
        assert int(s_pl[b]) == want, b


def test_pallas_free_t_end():
    rng = np.random.default_rng(4)
    W, d_lo, M, B = 128, -64, 128, 2
    q, t, qlen, tlen = _case(rng, B, M, W, d_lo)
    s_ref, _, ej_ref = banded_align_scan(
        q, t, qlen, tlen, W=W, d_lo=d_lo, free_t_end=True,
        with_traceback=False)
    s_pl, _, ej_pl = banded_align_pallas(
        q, t, qlen, tlen, W=W, d_lo=d_lo, free_t_end=True,
        with_traceback=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pl))
    np.testing.assert_array_equal(np.asarray(ej_ref), np.asarray(ej_pl))


def test_pallas_row0_matches_scan():
    rng = np.random.default_rng(6)
    W, d_lo, M, B = 128, -64, 128, 2
    q, t, qlen, tlen = _case(rng, B, M, W, d_lo)
    _, _, _, r0_ref = banded_align_scan(
        q, t, qlen, tlen, W=W, d_lo=d_lo, with_traceback=False,
        row0_scores=True)
    from volcanosv_tpu.ops.pallas import banded_align_pallas
    _, _, _, r0_pl = banded_align_pallas(
        q, t, qlen, tlen, W=W, d_lo=d_lo, with_traceback=False,
        row0_scores=True, interpret=True)
    r0_ref = np.asarray(r0_ref)
    r0_pl = np.asarray(r0_pl)[:, :B]
    # rows >= qlen carry backend-specific NEG sentinels; consumers only read
    # rows < qlen (the split-DP fwd/bwd profiles)
    for b in range(B):
        np.testing.assert_array_equal(r0_ref[:qlen[b], b], r0_pl[:qlen[b], b])


def test_pallas_dual_affine_matches_scan():
    from volcanosv_tpu.ops.banded_align import Scores
    DUAL = Scores(match=2, mismatch=-4, gap_open=-4, gap_extend=-2,
                  gap_open2=-24, gap_extend2=-1)
    rng = np.random.default_rng(8)
    W, d_lo, M, B = 128, -64, 256, 4
    q, t, qlen, tlen = _case(rng, B, M, W, d_lo)
    s_ref, tb_ref, _ = banded_align_scan(q, t, qlen, tlen, W=W, d_lo=d_lo,
                                         scores=DUAL)
    s_pl, tb_pl, _ = banded_align_pallas(q, t, qlen, tlen, W=W, d_lo=d_lo,
                                         scores=DUAL, interpret=True)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_pl))
    tb_ref = np.asarray(tb_ref)
    tb_pl = np.asarray(tb_pl)
    for b in range(B):
        c1 = traceback_cigar(tb_ref[:, b], int(qlen[b]), int(tlen[b]), d_lo)
        c2 = traceback_cigar(tb_pl[:, :, b], int(qlen[b]), int(tlen[b]), d_lo)
        assert c1 == c2, b
