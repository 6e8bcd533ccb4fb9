"""Hand-tiled Pallas TPU kernel for the banded affine-gap DP.

Same semantics as ops.banded_align.banded_align_scan (the correctness
oracle) — one band-diagonal wavefront per query row — but laid out for the
TPU VPU:

  * state lives as (W, B) tiles: the band's W diagonal lanes on the
    *sublane* axis, a 128-alignment batch on the *lane* axis.  The target
    window slides by one row per step, which in this layout is a cheap
    dynamic **sublane** slice of the pre-transposed target (no lane
    rotates); the vertical-gap shift (lane l+1) and the log2(W) max-plus
    prefix scan for the affine F-recurrence are sublane shifts.
  * H/E rows persist in VMEM scratch across the row-tile grid (the TPU grid
    is sequential per core), so HBM traffic is only the int8 inputs once
    and the optional 1 byte/cell traceback stream.
  * arithmetic is int16 (scores are bounded by ±2·M for the score presets
    used; NEG sentinel −20000 keeps all adds inside int16).

Replaces the per-cell work minimap2's ksw2_extz2_sse does on CPU for every
alignment in the reference pipeline (SURVEY.md §2.2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..banded_align import (Scores, TB_E2_OPEN, TB_E_OPEN, TB_F2_OPEN,
                            TB_F_OPEN, TB_LEFT, TB_LEFT2, TB_UP, TB_UP2)

LANES = 128          # batch tile width (TPU lane count)
ROW_TILE = 8         # query rows per grid step (traceback stream block)
NEG16 = -20000


def pallas_available() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _kernel(qT_ref, tT_ref, qlen_ref, tlen_ref,      # inputs
            score_ref, endj_ref, *rest,
            W: int, d_lo: int, scores: Scores, R: int, n_m: int,
            with_traceback: bool, free_t_end: bool, row0_scores: bool):
    rest = list(rest)
    tb_ref = rest.pop(0) if with_traceback else None
    row0_ref = rest.pop(0) if row0_scores else None
    dual = scores.dual
    if dual:
        H, E, E2, best, bestj = rest
    else:
        H, E, best, bestj = rest
        E2 = None
    m = pl.program_id(1)
    go = jnp.int32(scores.gap_open)
    ge = jnp.int32(scores.gap_extend)
    if dual:
        go2 = jnp.int32(scores.gap_open2)
        ge2 = jnp.int32(scores.gap_extend2)
    match = jnp.int32(scores.match)
    mismatch = jnp.int32(scores.mismatch)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)         # (W,1)
    ge_l = l_iota * ge        # (W,1)
    if dual:
        ge2_l = l_iota * ge2
    tlen = tlen_ref[0:1, :]                                          # (1,B)
    qlen = qlen_ref[0:1, :]

    def gap_score(k):
        s = go + ge * k
        return jnp.maximum(s, go2 + ge2 * k) if dual else s

    @pl.when(m == 0)
    def _init():
        j_init = -1 + d_lo + l_iota                                  # (W,1)
        in_t = (j_init >= 0) & (j_init < tlen)                       # (W,B)
        H0 = jnp.where(
            j_init == -1, 0,
            jnp.where(in_t, gap_score(j_init + 1), NEG16))
        H[:, :] = H0.astype(jnp.int32)
        E[:, :] = jnp.full(E.shape, NEG16, jnp.int32)
        if dual:
            E2[:, :] = jnp.full(E2.shape, NEG16, jnp.int32)
        best[:, :] = jnp.full(best.shape, -(10 ** 9), jnp.int32)
        bestj[:, :] = jnp.zeros(bestj.shape, jnp.int32)

    neg_row = jnp.full((1, H.shape[1]), NEG16, jnp.int32)

    # one aligned load per grid step (dynamic sublane offsets must be
    # 8-aligned for Mosaic; base = m*R with R=8 provably is), then the R
    # rows unroll statically so all inner slices are static
    base = m * R
    qtile = qT_ref[pl.ds(base, R), :].astype(jnp.int32)              # (R,B)
    tspan = tT_ref[pl.ds(base, W + R), :].astype(jnp.int32)          # (W+R,B)
    H_prev = H[:, :]
    E_prev = E[:, :]
    E2_prev = E2[:, :] if dual else None
    best_v = best[:, :]
    bestj_v = bestj[:, :]

    def prefix_max_excl(x):
        pm = jnp.concatenate([neg_row, x[:-1, :]], 0)
        s = 1
        while s < W:
            pm = jnp.maximum(
                pm, jnp.concatenate(
                    [jnp.full((s, H.shape[1]), NEG16, jnp.int32),
                     pm[:-s, :]], 0))
            s *= 2
        return pm

    for r in range(R):
        i = base + r
        qi = qtile[r:r + 1, :]                                       # (1,B)
        tw = tspan[r:r + W, :]                                       # (W,B)
        is_match = (qi == tw) & (qi < 4) & (tw < 4)
        sub = jnp.where(is_match, match, mismatch)

        H_up = jnp.concatenate([H_prev[1:, :], neg_row], 0)
        E_up = jnp.concatenate([E_prev[1:, :], neg_row], 0)
        E_open = H_up + (go + ge)
        E_ext = E_up + ge
        E_new = jnp.maximum(E_open, E_ext)

        Hdiag = H_prev + sub
        Htmp = jnp.maximum(Hdiag, E_new)
        choice = jnp.where(E_new > Hdiag, TB_UP, 0)
        if dual:
            E2_up = jnp.concatenate([E2_prev[1:, :], neg_row], 0)
            E2_open = H_up + (go2 + ge2)
            E2_ext = E2_up + ge2
            E2_new = jnp.maximum(E2_open, E2_ext)
            choice = jnp.where(E2_new > Htmp, TB_UP2, choice)
            Htmp = jnp.maximum(Htmp, E2_new)

        lb = -1 - i - d_lo                                           # scalar
        boundary = gap_score(i + 1)
        inject = l_iota == lb                                        # (W,1)
        Htmp = jnp.where(inject, boundary, Htmp)

        # F-recurrence: exclusive max-plus prefix along sublanes
        pm = prefix_max_excl(Htmp - ge_l)
        F = pm + ge_l + go
        H_left = jnp.concatenate([neg_row, Htmp[:-1, :]], 0)
        f_open = (H_left + go + ge) >= F

        H_new = jnp.maximum(Htmp, F)
        choice = jnp.where(F > Htmp, TB_LEFT, choice)
        if dual:
            pm2 = prefix_max_excl(Htmp - ge2_l)
            F2 = pm2 + ge2_l + go2
            f2_open = (H_left + go2 + ge2) >= F2
            choice = jnp.where(F2 > H_new, TB_LEFT2, choice)
            H_new = jnp.maximum(H_new, F2)

        j = i + d_lo + l_iota                                        # (W,1)
        j_valid = (j >= 0) & (j < tlen)                              # (W,B)
        row_valid = i < qlen                                         # (1,B)
        cell_valid = j_valid & row_valid
        H_new = jnp.where(cell_valid | inject, H_new, NEG16)
        E_new = jnp.where(cell_valid, E_new, NEG16)
        if dual:
            E2_new = jnp.where(cell_valid, E2_new, NEG16)

        last = i == (qlen - 1)                                       # (1,B)
        H32 = H_new
        if free_t_end:
            masked = jnp.where(j_valid, H32, NEG16)
            val = jnp.max(masked, axis=0, keepdims=True)             # (1,B)
            jbest = jnp.max(
                jnp.where((masked == val) & j_valid, j, -(10 ** 9)),
                axis=0, keepdims=True)
            best_v = jnp.where(last, val, best_v)
            bestj_v = jnp.where(last, jbest, bestj_v)
        else:
            l_star = tlen - qlen - d_lo                              # (1,B)
            val = jnp.max(
                jnp.where(l_iota == l_star, H32, NEG16),
                axis=0, keepdims=True)
            best_v = jnp.where(last, val, best_v)
            bestj_v = jnp.where(last, tlen - 1, bestj_v)

        if with_traceback:
            # bits in i32 (packed-u8 selects unsupported), cast on store
            tb = choice
            tb = tb + jnp.where(E_open >= E_ext, TB_E_OPEN, 0)
            tb = tb + jnp.where(f_open, TB_F_OPEN, 0)
            if dual:
                tb = tb + jnp.where(E2_open >= E2_ext, TB_E2_OPEN, 0)
                tb = tb + jnp.where(f2_open, TB_F2_OPEN, 0)
            tb_ref[r:r + 1, :, :] = tb.astype(jnp.uint8)[None, :, :]

        if row0_scores:
            # H on diagonal 0 (sublane -d_lo, static) — split-DP profiles
            row0_ref[r:r + 1, :] = H_new[-d_lo:-d_lo + 1, :]

        H_prev, E_prev = H_new, E_new
        if dual:
            E2_prev = E2_new

    H[:, :] = H_prev
    E[:, :] = E_prev
    if dual:
        E2[:, :] = E2_prev
    best[:, :] = best_v
    bestj[:, :] = bestj_v

    @pl.when(m == n_m - 1)
    def _emit():
        score_ref[0:1, :] = best[:, :]
        endj_ref[0:1, :] = bestj[:, :]


# imported late so the module can be parsed without pallas on exotic builds
from jax.experimental import pallas as pl                     # noqa: E402
from jax.experimental.pallas import tpu as pltpu              # noqa: E402


@functools.partial(
    jax.jit,
    static_argnames=("W", "d_lo", "scores", "with_traceback", "free_t_end",
                     "row0_scores", "interpret"))
def _banded_pallas_jit(q, t, qlen, tlen, *, W: int, d_lo: int,
                       scores: Scores, with_traceback: bool,
                       free_t_end: bool, row0_scores: bool, interpret: bool):
    B, M = q.shape
    N = t.shape[1]
    R = ROW_TILE
    n_m = M // R
    n_bt = B // LANES
    qT = q.T                                          # (M, B)
    # target in band coordinates: row s holds target col s + d_lo
    pad_l = -d_lo
    pad_r = max(0, M + W + d_lo - N)
    tT = jnp.pad(t, ((0, 0), (pad_l, pad_r)),
                 constant_values=4)[:, :M + W].T      # (M+W, B)
    qlen2 = qlen.astype(jnp.int32)[None, :]
    tlen2 = tlen.astype(jnp.int32)[None, :]

    kern = functools.partial(
        _kernel, W=W, d_lo=d_lo, scores=scores, R=R, n_m=n_m,
        with_traceback=with_traceback, free_t_end=free_t_end,
        row0_scores=row0_scores)

    in_specs = [
        pl.BlockSpec((M, LANES), lambda bt, m: (0, bt),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((M + W, LANES), lambda bt, m: (0, bt),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda bt, m: (0, bt),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda bt, m: (0, bt),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((1, LANES), lambda bt, m: (0, bt),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LANES), lambda bt, m: (0, bt),
                     memory_space=pltpu.VMEM),
    ]
    if with_traceback:
        out_shape.append(jax.ShapeDtypeStruct((M, W, B), jnp.uint8))
        out_specs.append(
            pl.BlockSpec((R, W, LANES), lambda bt, m: (m, 0, bt),
                         memory_space=pltpu.VMEM))
    if row0_scores:
        out_shape.append(jax.ShapeDtypeStruct((M, B), jnp.int32))
        out_specs.append(
            pl.BlockSpec((R, LANES), lambda bt, m: (m, bt),
                         memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((W, LANES), jnp.int32)]     # H
    scratch.append(pltpu.VMEM((W, LANES), jnp.int32))  # E
    if scores.dual:
        scratch.append(pltpu.VMEM((W, LANES), jnp.int32))  # E2
    scratch += [
        pltpu.VMEM((1, LANES), jnp.int32),            # best
        pltpu.VMEM((1, LANES), jnp.int32),            # best_j
    ]
    outs = pl.pallas_call(
        kern,
        grid=(n_bt, n_m),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=20 * B * M * W, transcendentals=0,
            bytes_accessed=B * (M + M + W) + (B * M * W if with_traceback
                                              else 0)),
    )(qT, tT, qlen2, tlen2)
    score, endj = outs[0][0], outs[1][0]
    k = 2
    tb = None
    row0 = None
    if with_traceback:
        tb = outs[k]
        k += 1
    if row0_scores:
        row0 = outs[k]
    return score, tb, endj, row0


def banded_align_pallas(q, t, qlen, tlen, W: int = 256, d_lo: int = -64,
                        scores: Scores = Scores(),
                        with_traceback: bool = True,
                        free_t_end: bool = False,
                        row0_scores: bool = False,
                        interpret: bool = False):
    """Drop-in for banded_align_scan (traceback path).

    Returns (score (B,), tb (M, W, B) uint8 | None, end_j (B,)).
    NOTE the traceback layout is (M, W, B) — slice per alignment with
    tb[:, :, b] (the scan variant is (M, B, W)).

    Batch is padded to a multiple of 128 lanes internally; M must be a
    multiple of 8 (all _BUCKETS qualify)."""
    B, M = q.shape
    if M % ROW_TILE:
        raise ValueError(f"M={M} not a multiple of {ROW_TILE}")
    Bp = -(-B // LANES) * LANES
    if Bp != B:
        q = np.concatenate([q, np.full((Bp - B, M), 4, np.int8)])
        t = np.concatenate([t, np.full((Bp - B, t.shape[1]), 4, np.int8)])
        qlen = np.concatenate([qlen, np.ones(Bp - B, np.int32)])
        tlen = np.concatenate([tlen, np.ones(Bp - B, np.int32)])
    score, tb, endj, row0 = _banded_pallas_jit(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
        jnp.asarray(tlen), W=W, d_lo=d_lo, scores=scores,
        with_traceback=with_traceback, free_t_end=free_t_end,
        row0_scores=row0_scores, interpret=interpret)
    if Bp != B:
        score, endj = score[:B], endj[:B]
        if tb is not None:
            tb = tb[:, :, :B]
        if row0 is not None:
            row0 = row0[:, :B]
    if row0_scores:
        return score, tb, endj, row0
    return score, tb, endj
