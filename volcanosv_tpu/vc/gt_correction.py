"""Genotype re-estimation + coverage band-pass from read-signature support.

Replaces the reference's filter_GT_correction.py chain (SURVEY.md §3.2):

* sig_extract.py (cuteSV-style)  → here: `aggregate_read_sigs` — per-read
  merged signatures deduplicated into (pos, svlen, n_reads) cluster rows
  (the reference's sort|uniq reduce, sig_extract.py:637-643).
* calculate_signature_support.py → `rel_coverage` — svlen mass of read
  signatures within ±flank of each call, rel_cov = cov/svlen.
* filter_vcf_by_sig_cov_insdel.py → `coverage_filter` — band-pass on
  rel_cov in multiples of the per-run median (filter_para.csv bounds).
* correct_gt_{del,ins}_real_data.py → `correct_genotypes` — n_ratio =
  support/span-depth against learned per-dtype thresholds
  (para/GT_correction_para_*.txt), size classes split at 1kb.
"""
from __future__ import annotations

import numpy as np

from ..config import CovFilterConfig, GTCorrectionConfig
from ..io.vcf import VcfRecord
from ..utils.logging import get_logger
from .signatures import Signature

log = get_logger("gt_correction")


def aggregate_read_sigs(sigs: list[Signature], svtype: str,
                        min_size: int = 0,
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(pos, svlen, n_reads) sorted by pos — duplicate (pos, svlen) rows
    from different reads collapse with a count (the reference's sort|uniq
    reduce over per-read rows, sig_extract.py:637-643).  min_size drops
    merged signatures below the support-calculator floor
    (calculate_signature_support.py:44, '-s 30')."""
    rows = [(s.pos, s.svlen) for s in sigs
            if s.svtype == svtype and s.svlen >= min_size]
    if not rows:
        z = np.zeros(0, np.int64)
        return z, z, z
    arr = np.array(rows, np.int64)
    uniq, counts = np.unique(arr, axis=0, return_counts=True)
    order = np.argsort(uniq[:, 0], kind="stable")
    return uniq[order, 0], uniq[order, 1], counts[order]


def sig_support(call_pos: np.ndarray, call_len: np.ndarray,
                sig_pos: np.ndarray, sig_len: np.ndarray,
                sig_count: np.ndarray, cfg: GTCorrectionConfig) -> np.ndarray:
    """#reads with a matching signature per call.

    ref match_varlist_siglist (correct_gt_del_real_data.py:92-137):
    match = |pos - call_pos| <= max(max_dist_ratio*svlen, 500) and
    svlen in [call_len*min_size_sim, call_len/min_size_sim]."""
    out = np.zeros(len(call_pos), np.int64)
    if len(sig_pos) == 0:
        return out
    shift = np.maximum(call_len * cfg.max_dist_ratio,
                       cfg.min_shift_floor).astype(np.int64)
    lo = np.searchsorted(sig_pos, call_pos - shift, "left")
    hi = np.searchsorted(sig_pos, call_pos + shift, "right")
    for i in range(len(call_pos)):
        sl = sig_len[lo[i]:hi[i]]
        sc = sig_count[lo[i]:hi[i]]
        ok = (sl >= call_len[i] * cfg.min_size_sim) & \
             (sl <= call_len[i] / cfg.min_size_sim)
        out[i] = int(sc[ok].sum())
    return out


def span_depth(call_pos: np.ndarray, call_len: np.ndarray, is_del: np.ndarray,
               read_start: np.ndarray, read_end: np.ndarray,
               cfg: GTCorrectionConfig) -> np.ndarray:
    """Local depth per call = #reads fully spanning the event.

    ref check_full_cover_reads (correct_gt_del_real_data.py:149-170):
    DEL ≤ 1kb: reads covering [pos, pos+svlen]; DEL > 1kb: mean of 100bp
    spans at 150bp flanks.  INS: span [pos-100, pos+100]
    (correct_gt_ins_real_data.py:188-196)."""
    order = np.argsort(read_start, kind="stable")
    rs, re = read_start[order], read_end[order]
    depth = np.zeros(len(call_pos))

    def count_span(a: int, b: int) -> int:
        # reads with start < a and end > b
        k = np.searchsorted(rs, a, "left")     # candidates rs < a
        return int((re[:k] > b).sum())

    for i in range(len(call_pos)):
        p, L = int(call_pos[i]), int(call_len[i])
        if not is_del[i]:
            depth[i] = count_span(p - cfg.ins_flank, p + cfg.ins_flank)
        elif L <= cfg.size_boundary:
            depth[i] = count_span(p, p + L)
        else:
            f, span = cfg.del_flank, 100
            left = count_span(p - f, p - f + span)
            right = count_span(p + L + f, p + L + f + span)
            depth[i] = (left + right) / 2
    return depth


def _apply_thresholds(gt: str, svlen: int, n_ratio: float,
                      th: tuple, boundary: int) -> str:
    t_large_11, t_small_11, t_large_01, t_small_01 = th
    large = svlen > boundary
    if gt in ("1/1", "1|1"):
        t = t_large_11 if large else t_small_11
    elif gt in ("0/1", "1|0", "0|1"):
        t = t_large_01 if large else t_small_01
    else:
        return gt
    if t is None:
        return gt
    return "1/1" if n_ratio > t else "0/1"


def correct_genotypes(records: list[VcfRecord],
                      reads_sigs: list[Signature],
                      read_start: np.ndarray, read_end: np.ndarray,
                      cfg: GTCorrectionConfig) -> list[VcfRecord]:
    """Re-genotype every call from n_ratio = support/depth.  Phasing of the
    corrected GT is restored by the caller (phase_records)."""
    if not records:
        return records
    for svtype, th in (("DEL", cfg.del_thresholds), ("INS", cfg.ins_thresholds)):
        idx = [i for i, r in enumerate(records) if r.svtype == svtype]
        if not idx:
            continue
        pos = np.array([records[i].pos for i in idx], np.int64)
        ln = np.array([records[i].svlen for i in idx], np.int64)
        sp, sl, sc = aggregate_read_sigs(reads_sigs, svtype)
        sup = sig_support(pos, ln, sp, sl, sc, cfg)
        depth = span_depth(pos, ln, np.full(len(idx), svtype == "DEL"),
                           read_start, read_end, cfg)
        n_ratio = np.where(depth == 0, 1.0, sup / np.maximum(depth, 1e-9))
        n_flip = 0
        for j, i in enumerate(idx):
            r = records[i]
            old = "1/1" if r.gt in ("1/1", "1|1") else "0/1"
            new = _apply_thresholds(old, int(ln[j]), float(n_ratio[j]), th,
                                    cfg.size_boundary)
            if new != old:
                n_flip += 1
                r.gt = new
            r.info["SUPPORT"] = int(sup[j])
        if n_flip:
            log.info("GT correction flipped %d/%d %s genotypes",
                     n_flip, len(idx), svtype)
    return records


def rel_coverage(records: list[VcfRecord], reads_sigs: list[Signature],
                 cfg: CovFilterConfig, svtype: str,
                 ) -> tuple[list[int], np.ndarray]:
    """(record indices, rel_cov) for one svtype.

    rel_cov = (Σ svlen·n_reads of merged read sigs ≥30bp within ±flank of
    the call) / call svlen — calculate_signature_support.py's 'cov/svlen'
    column (:361-366) with the min_size=30 floor (:44) — normalized per
    carrier haplotype (÷2 for hom calls).  The reference bands raw rel_cov
    (filter_vcf_by_sig_cov_insdel.py:38-55), which works at its 56-89×
    envelope where hom/median ≈ 2 < rb_del; at lower coverage the median is
    het-dominated and a true hom call in a high-depth spot lands at
    2.6-2.9× median — outside the 2.605 band.  Per-carrier support keeps
    the filter's anomaly-detection role (collapsed regions show 2×+ the
    *normalized* median) without genotype-correlated drops."""
    idx = [i for i, r in enumerate(records) if r.svtype == svtype]
    if not idx:
        return idx, np.zeros(0, np.float32)
    sp, sl, sc = aggregate_read_sigs(reads_sigs, svtype, min_size=30)
    pos = np.array([records[i].pos for i in idx], np.int64)
    ln = np.array([records[i].svlen for i in idx], np.int64)
    carriers = np.array([2.0 if records[i].gt in ("1/1", "1|1") else 1.0
                         for i in idx])
    if len(sp) == 0:
        return idx, np.zeros(len(idx), np.float32)
    lo = np.searchsorted(sp, pos - cfg.flank, "left")
    hi = np.searchsorted(sp, pos + cfg.flank, "right")
    cov = np.array([
        float((sl[lo[i]:hi[i]] * sc[lo[i]:hi[i]]).sum())
        for i in range(len(idx))])
    return idx, (cov / np.maximum(ln, 1) / carriers).astype(np.float32)


def coverage_filter(records: list[VcfRecord],
                    reads_sigs: list[Signature],
                    cfg: CovFilterConfig,
                    medians: dict[str, float] | None = None,
                    ) -> list[VcfRecord]:
    """Median-relative band-pass on signature coverage (DEL by default).

    rel_cov = (Σ svlen of read sigs within ±flank) / svlen; keep calls with
    rel_cov in [lo*median, hi*median] (filter_vcf_by_sig_cov_insdel.py:
    20-60, filter_para.csv bands).  `medians` supplies the per-run WGS
    median per svtype (the reference computes it over the concatenated
    all-chromosome call set, volcanosv-vc-large-indel.py:266-278 +
    filter_vcf_by_sig_cov_insdel.py:55) — computed on the device mesh by
    parallel.wgs.wgs_global_median in the multi-chrom drivers; when None
    the median of the supplied call set is used (single-chrom mode)."""
    if not records:
        return records
    keep = np.ones(len(records), bool)
    for svtype, apply_it, lo_m, hi_m in (
            ("DEL", cfg.apply_del, cfg.del_low, cfg.del_high),
            ("INS", cfg.apply_ins, cfg.ins_low, cfg.ins_high)):
        if not apply_it:
            continue
        idx, rel = rel_coverage(records, reads_sigs, cfg, svtype)
        if medians is not None and svtype in medians:
            med = float(medians[svtype])
        else:
            if len(idx) < cfg.min_calls:
                continue
            med = float(np.median(rel)) if len(rel) else 0.0
        if med <= 0 or not len(idx):
            continue
        bad = (rel < lo_m * med) | (rel > hi_m * med)
        for j, i in enumerate(idx):
            if bad[j]:
                keep[i] = False
    dropped = int((~keep).sum())
    if dropped:
        log.info("coverage filter dropped %d/%d calls", dropped, len(records))
    return [r for r, k in zip(records, keep) if k]


def phase_aware_gt(records: list[VcfRecord],
                   reads_sigs: list[Signature],
                   read_hp: dict,
                   cfg: GTCorrectionConfig,
                   read_names: list[str] | None = None,
                   read_start: np.ndarray | None = None,
                   read_end: np.ndarray | None = None) -> list[VcfRecord]:
    """Read-evidence zygosity arbitration (a capability the reference
    discards: it writes read_hp_og.p, prepare_info_v1.py:79-85, and never
    uses phasing at vc time).

    Zygosity from carrier-vs-clean SPANNING reads — orientation-free and
    robust to both assembly-bin leaks and per-locus phasing noise:
    * a true hom event has (almost) no clean spanning reads;
    * a het has roughly half clean — whatever the contig pairing said.
    1/1 calls with enough clean spanning reads downgrade to het (phase
    orientation from the majority carrier haplotype within its majority
    phase block — labels are only orientation-consistent per block); het
    calls with (almost) no clean spanning reads upgrade to 1/1."""
    if not records or read_names is None or read_start is None \
            or not len(read_start):
        return records
    order = np.argsort(read_start, kind="stable")
    rs, re_ = read_start[order], read_end[order]
    names_sorted = [read_names[i] for i in order]
    by_type: dict[str, tuple] = {}
    for svtype in ("DEL", "INS"):
        rows = [(s.pos, s.svlen, s.qname) for s in reads_sigs
                if s.svtype == svtype and s.svlen >= 30]
        rows.sort()
        by_type[svtype] = (np.array([r[0] for r in rows], np.int64),
                           np.array([r[1] for r in rows], np.int64),
                           [r[2] for r in rows])
    n_down = n_up = 0
    for r in records:
        if r.svtype not in by_type \
                or r.gt not in ("1/1", "1|1", "0/1", "1|0", "0|1"):
            continue
        sp, sl, names = by_type[r.svtype]
        if not len(sp):
            continue
        L = r.svlen
        shift = int(max(cfg.max_dist_ratio * L, cfg.min_shift_floor))
        lo = int(np.searchsorted(sp, r.pos - shift, "left"))
        hi = int(np.searchsorted(sp, r.pos + shift, "right"))
        carriers = {names[i] for i in range(lo, hi)
                    if sl[i] >= L * cfg.min_size_sim
                    and sl[i] <= L / cfg.min_size_sim}
        # spanning reads (primary): cover the event plus a margin
        if r.svtype == "DEL":
            a, b = r.pos - 30, r.pos + L + 30
        else:
            a, b = r.pos - cfg.ins_flank, r.pos + cfg.ins_flank
        k = int(np.searchsorted(rs, a, "left"))
        span_names = {names_sorted[i] for i in range(k) if re_[i] > b}
        if len(span_names) < 8:
            continue                      # too thin to overrule anything
        clean = span_names - carriers
        n_clean = len(clean)
        n_carr = len(span_names & carriers)
        if r.gt in ("1/1", "1|1"):
            if n_clean >= max(4, 0.25 * len(span_names)):
                # het: orient by majority carrier hap in its majority block
                blocks: dict[int, list[int]] = {}
                for n in carriers:
                    hb = read_hp.get(n) if read_hp else None
                    if hb is None:
                        continue
                    h, bkt = hb if isinstance(hb, tuple) else (hb, 0)
                    blocks.setdefault(bkt, []).append(h)
                hs = max(blocks.values(), key=len) if blocks else [1]
                n1 = sum(1 for h in hs if h == 1)
                r.gt = "1|0" if n1 >= len(hs) - n1 else "0|1"
                n_down += 1
        else:
            if n_carr >= 8 and n_clean <= max(1, 0.12 * len(span_names)):
                r.gt = "1/1"
                n_up += 1
    if n_down or n_up:
        log.info("read-evidence GT: %d hom->het downgrades, %d het->hom "
                 "upgrades", n_down, n_up)
    return records
