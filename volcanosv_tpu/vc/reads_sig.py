"""Read-alignment SV signatures (the FP-filter evidence stream).

ref: extract_reads_signature.py — the same CIGAR walk as the contig
extractor (mapq ≥ 50, min svlen 30) plus split-segment signatures with the
stricter Diffolp < 30 criterion (:190-196); signatures are NOT clustered.
Output is the pos-sorted union of DEL + INS signatures per chromosome
(`chr*_reads_sig.txt` equivalent, kept in memory as arrays).
"""
from __future__ import annotations

import numpy as np

from ..config import FPFilterConfig, GTCorrectionConfig, SignatureConfig
from ..io.bam import BamRecord
from .signatures import Signature, _read_span, cigar_sigs

_S, _H = 4, 5


def _drop_contained_segments(group: list[BamRecord]) -> list[BamRecord]:
    """Remove segments query-contained (≥80%) in a longer segment of the
    same read: an inversion-rescue supplementary lives INSIDE its parent's
    query span, and pairing it with a distant chain segment fabricates a
    multi-kb deletion signature (whose svlen mass then poisons the
    coverage band-pass for every nearby call)."""
    if len(group) < 2:
        return group
    spans = []
    for r in group:
        c = np.asarray(r.cigar)
        if len(c) == 0:
            spans.append((0, 0))
            continue
        s, e, rl = _read_span(c)
        if r.is_reverse:
            s, e = rl - e, rl - s
        spans.append((s, e))
    keep = []
    for i, r in enumerate(group):
        si, ei = spans[i]
        li = ei - si
        contained = any(
            j != i
            and min(ei, spans[j][1]) - max(si, spans[j][0]) >= 0.8 * li
            and (spans[j][1] - spans[j][0]) > li
            for j in range(len(group)))
        if not contained:
            keep.append(r)
    return keep


def _split_sigs_reads(rec1: BamRecord, rec2: BamRecord, chrom: str,
                      min_mapq: int, min_sv: int, max_sv: int):
    """ref extract_sig_from_split (extract_reads_signature.py:148-196):
    same-strand clip-adjacent pair; Diffolp = Ref1e-Ref2s must be < 30;
    DEL at Ref1e len Diffdis; INS at midpoint len |Diffdis|."""
    if rec1.pos > rec2.pos:
        rec1, rec2 = rec2, rec1
    if rec1.is_reverse != rec2.is_reverse:
        return []
    if rec1.mapq < min_mapq or rec2.mapq < min_mapq:
        return []
    c1, c2 = np.asarray(rec1.cigar), np.asarray(rec2.cigar)
    if len(c1) == 0 or len(c2) == 0:
        return []
    if c1[-1, 0] not in (_S, _H) or c2[0, 0] not in (_S, _H):
        return []
    _, read1e, rl1 = _read_span(c1)
    read2s, _, rl2 = _read_span(c2)
    if rl1 != rl2:
        return []
    ref1e, ref2s = rec1.reference_end, rec2.pos
    diffdis = (ref2s - ref1e) - (read2s - read1e)
    diffolp = ref1e - ref2s
    if abs(diffdis) > max_sv or diffolp >= 30:
        return []
    strand = "-" if rec1.is_reverse else "+"
    if diffdis >= min_sv:
        return [Signature(chrom, "DEL", int(ref1e), int(diffdis), rec1.name,
                          int(read1e), int(read2s), strand,
                          "split-alignment", str(rec1.mapq))]
    if diffdis <= -min_sv:
        return [Signature(chrom, "INS", (ref1e + ref2s) // 2,
                          int(abs(diffdis)), rec1.name, int(read1e),
                          int(read2s), strand, "split-alignment",
                          str(rec1.mapq))]
    return []


def extract_reads_signatures(
    records: list[BamRecord], chrom: str, cfg: FPFilterConfig,
    sig_cfg: SignatureConfig | None = None,
) -> list[Signature]:
    """All (unclustered) CIGAR + split signatures of the reads BAM."""
    scfg = sig_cfg or SignatureConfig(
        min_sv_size=cfg.reads_min_sv_size, min_mapq=cfg.reads_min_mapq)
    out: list[Signature] = []
    by_name: dict[str, list[BamRecord]] = {}
    for r in records:
        if r.is_unmapped:
            continue
        if r.mapq >= cfg.reads_min_mapq:
            d, i = cigar_sigs(r, chrom, scfg)
            out.extend(d)
            out.extend(i)
            by_name.setdefault(r.name, []).append(r)
    for name, group in by_name.items():
        if len(group) < 2:
            continue
        group = _drop_contained_segments(group)
        if len(group) < 2:
            continue
        group.sort(key=lambda r: r.pos)
        for a, b in zip(group, group[1:]):
            out.extend(_split_sigs_reads(
                a, b, chrom, cfg.reads_min_mapq, cfg.reads_min_sv_size,
                scfg.max_sv_size))
    out.sort(key=lambda s: s.pos)
    return out


def merge_read_sigs(sigs: list[Signature], svtype: str, merge_dis: int
                    ) -> list[Signature]:
    """Distance-based merge of one read's pos-sorted signatures.

    ref generate_combine_sigs (sig_extract.py:373-435): walking the sorted
    sigs, a signature joins the running merge when its pos is within
    merge_dis of the previous signature's endpoint — for INS the previous
    signature's pos, for DEL its pos+svlen — and merged svlen is the sum."""
    if len(sigs) < 2:
        return list(sigs)
    out: list[Signature] = []
    cur = sigs[0]
    cur_len = cur.svlen
    # INS tracks last merged pos (temp_sig[3]); DEL tracks pos+len (sum(i))
    cur_end = cur.pos if svtype == "INS" else cur.pos + cur.svlen
    for s in sigs[1:]:
        if s.pos - cur_end <= merge_dis:
            cur_len += s.svlen
            cur_end = s.pos if svtype == "INS" else s.pos + s.svlen
        else:
            out.append(Signature(cur.chrom, svtype, cur.pos, cur_len,
                                 cur.qname, cur.q_start, cur.q_end,
                                 cur.strand, cur.source, cur.mapq))
            cur, cur_len = s, s.svlen
            cur_end = s.pos if svtype == "INS" else s.pos + s.svlen
    out.append(Signature(cur.chrom, svtype, cur.pos, cur_len, cur.qname,
                         cur.q_start, cur.q_end, cur.strand, cur.source,
                         cur.mapq))
    return out


def extract_gt_read_sigs(
    records: list[BamRecord], chrom: str, cfg: GTCorrectionConfig,
    min_mapq: int = 20, min_read_len: int = 500,
    include_bed: list[tuple[int, int]] | None = None,
) -> list[Signature]:
    """Task-grid wrapper: the genome is decomposed into task_window bins
    (the reference's 10Mb batches, sig_extract.py:603-644 main_ctrl) — each
    read is processed in the bin its alignment starts in, so bins are
    embarrassingly parallel and peak memory is per-bin.  Results are the
    pos-sorted concat (the reference's sort|uniq reduce).

    include_bed restricts the task grid to bins intersecting the given
    [start, end) intervals — sig_extract.py's `-include_bed` contract
    (BED-restricted single-chromosome runs, filter_GT_correction.py:67-82)."""
    if not records:
        return []
    win = max(int(cfg.task_window), 1)
    # a read's segments all go to the bin of its leftmost alignment, so
    # split-pair analysis never straddles bins (cuteSV assigns whole reads
    # to tasks the same way)
    first_pos: dict[str, int] = {}
    for r in records:
        p = max(r.pos, 0)
        if r.name not in first_pos or p < first_pos[r.name]:
            first_pos[r.name] = p
    bins: dict[int, list[BamRecord]] = {}
    for r in records:
        bins.setdefault(first_pos[r.name] // win, []).append(r)
    if include_bed is not None:
        def _hits(b: int) -> bool:
            lo, hi = b * win, (b + 1) * win
            return any(s < hi and e > lo for s, e in include_bed)
        bins = {b: rs for b, rs in bins.items() if _hits(b)}
    out: list[Signature] = []
    for b in sorted(bins):
        out.extend(_extract_gt_read_sigs_task(bins[b], chrom, cfg,
                                              min_mapq, min_read_len))
    out.sort(key=lambda s: s.pos)
    return out


def _extract_gt_read_sigs_task(
    records: list[BamRecord], chrom: str, cfg: GTCorrectionConfig,
    min_mapq: int = 20, min_read_len: int = 500,
) -> list[Signature]:
    """The cuteSV-style merged signature stream driving GT correction.

    ref sig_extract.py parse_read (:438-493) with the driver's defaults
    (sig_extract.py:700-742, filter_GT_correction.py:108-116): signatures
    ≥ min_siglength (10) from reads ≥ 500bp at mapq ≥ 20, merged per read
    with merge_ins_threshold=100 / merge_del_threshold=0; split-segment
    signatures appended unmerged (analysis_split_read)."""
    from ..config import SignatureConfig
    scfg = SignatureConfig(min_sv_size=cfg.merge_min_siglength,
                           min_mapq=min_mapq)
    out: list[Signature] = []
    by_name: dict[str, list[BamRecord]] = {}
    for r in records:
        if r.is_unmapped or r.mapq < min_mapq:
            continue
        if r.seq and len(r.seq) < min_read_len:
            continue
        d, i = cigar_sigs(r, chrom, scfg, merge=False)
        out.extend(merge_read_sigs(d, "DEL", cfg.merge_del_dis))
        out.extend(merge_read_sigs(i, "INS", cfg.merge_ins_dis))
        by_name.setdefault(r.name, []).append(r)
    for name, group in by_name.items():
        if len(group) < 2:
            continue
        group = _drop_contained_segments(group)
        if len(group) < 2:
            continue
        group.sort(key=lambda r: r.pos)
        for a, b in zip(group, group[1:]):
            out.extend(_split_sigs_reads(a, b, chrom, min_mapq, 30,
                                         scfg.max_sv_size))
    # the reference's `sort -u` reduce (sig_extract.py:637-638) drops
    # duplicate (type, chrom, pos, len, read) rows — without it a read
    # whose primary AND inverted-supplementary alignments both show an
    # event double-counts, inflating n_ratio and flipping hets to hom
    seen: set = set()
    dedup: list[Signature] = []
    for s in out:
        key = (s.svtype, s.pos, s.svlen, s.qname)
        if key in seen:
            continue
        seen.add(key)
        dedup.append(s)
    dedup.sort(key=lambda s: s.pos)
    return dedup


def support_counts(call_pos: np.ndarray, call_len: np.ndarray,
                   sig_pos: np.ndarray, sig_len: np.ndarray,
                   cfg: FPFilterConfig, max_dist: int = 1000,
                   ) -> np.ndarray:
    """#read signatures supporting each call (type-agnostic, like the
    reference: FP_filter_v1.py compare_sigs has no type check).

    match = shift ≤ max_shift & size-sim ≥ min_size_sim, scanned in a
    ±max_dist window of the pos-sorted signature array (eval_sig :106-123).
    Vectorized per call."""
    order = np.argsort(sig_pos, kind="stable")
    sp, sl = sig_pos[order], sig_len[order]
    out = np.zeros(len(call_pos), np.int64)
    lo = np.searchsorted(sp, call_pos - max_dist, "left")
    hi = np.searchsorted(sp, call_pos + max_dist, "right")
    for i in range(len(call_pos)):
        p, L = call_pos[i], call_len[i]
        w_p, w_l = sp[lo[i]:hi[i]], sl[lo[i]:hi[i]]
        if len(w_p) == 0:
            continue
        shift_ok = np.abs(w_p - p) <= cfg.max_shift
        size_sim = np.minimum(w_l, L) / np.maximum(w_l, L)
        out[i] = int(np.sum(shift_ok & (size_sim >= cfg.min_size_sim)))
    return out
