"""Complex SV calling (INV / DUP / TRA) from haplotype contig alignments.

Replaces the reference's complex-SV chain (volcanosv-vc-complex-sv.py):
svim-asm diploid mode (SVIM_COLLECT.py segment collection, SVIM_inter.py
segment-pair typing, SVIM_COMBINE.py hap pairing) + DUP recovery from INS
calls (align_ins2ref.py:82-131) + TRA breakend clustering (filter_tra.py:
70-116) + INV merge & read-orientation support filter (filter_inv.py:57-190).

TPU-first notes: candidate typing is a host pass over the aligner's segment
table (tiny); the compute-dense parts — the INS-seq→ref realignment used for
DUP recovery and the read-orientation scan for INV support — ride the
batched banded-DP aligner and vectorized interval ops.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import ComplexSVConfig, PipelineConfig
from ..io.bam import BamRecord
from ..io.vcf import VcfRecord
from ..utils.logging import get_logger

log = get_logger("complex_sv")

_M, _I, _D, _S, _H, _EQ, _X = 0, 1, 2, 4, 5, 7, 8


@dataclass
class Candidate:
    svtype: str            # INV | DUP | BND
    chrom: str
    pos: int               # 0-based
    end: int               # 0-based end (INV/DUP); for BND: mate pos
    svlen: int
    hap: int               # 1 | 2
    qname: str
    chrom2: str = ""       # BND mate chrom
    orient: str = ""       # BND bracket orientation: 'N[', 'N]', '[N', ']N'


@dataclass
class _Segment:
    """One alignment segment in original-query orientation.

    ref: svim-asm reconstructs the same table from SA tags
    (SVIM_COLLECT.py:9-54)."""
    ref_name: str
    pos: int
    ref_end: int
    strand: int            # +1 / -1
    qo_start: int          # original query orientation coords
    qo_end: int
    mapq: int


def _segments_of(recs: list[BamRecord]) -> list[_Segment]:
    segs = []
    for r in recs:
        if r.is_unmapped or r.is_secondary or len(r.cigar) == 0:
            continue
        left, right = r.query_clips()
        alen_q = r.query_length() - sum(
            int(l) for op, l in r.cigar if op == _S)
        qlen = left + right + alen_q
        if r.is_reverse:
            qo_start, qo_end = right, right + alen_q
        else:
            qo_start, qo_end = left, left + alen_q
        _ = qlen
        segs.append(_Segment(
            ref_name="", pos=r.pos, ref_end=r.reference_end,
            strand=-1 if r.is_reverse else 1,
            qo_start=qo_start, qo_end=qo_end, mapq=r.mapq))
    return segs


def segment_candidates(records_by_chrom: dict[str, list[BamRecord]],
                       hap: int, cfg: ComplexSVConfig,
                       min_mapq: int = 20) -> list[Candidate]:
    """svim-asm segment-pair typing for one haplotype.

    Groups all segments of each contig across chromosomes, orders them along
    the original query, and classifies adjacent pairs
    (SVIM_inter.py:62-340): strand flip → INV (the minority-strand segment
    span), ref back-jump → tandem DUP, chrom change → BND."""
    by_name: dict[str, list[_Segment]] = {}
    for chrom, recs in records_by_chrom.items():
        for r in recs:
            if (r.is_unmapped or r.is_secondary or r.mapq < min_mapq
                    or f"hp{hap}" not in r.name):
                continue
            seg = _segments_of([r])
            if seg:
                seg[0].ref_name = chrom
                by_name.setdefault(r.name, []).append(seg[0])
    out: list[Candidate] = []
    for qname, segs in by_name.items():
        if len(segs) < 2:
            continue
        segs.sort(key=lambda s: s.qo_start)
        # INV: minority-strand segments (fwd-REV-fwd contig path)
        span = {1: 0, -1: 0}
        for s in segs:
            span[s.strand] += s.qo_end - s.qo_start
        dominant = 1 if span[1] >= span[-1] else -1
        for s in segs:
            if s.strand != dominant:
                ln = s.ref_end - s.pos
                if cfg.min_sv_size <= ln <= cfg.max_sv_size:
                    out.append(Candidate("INV", s.ref_name, s.pos, s.ref_end,
                                         ln, hap, qname))
        # junction list for interspersed-DUP pairing, svim "translocations":
        # (dir1, dir2, chr1, pos1, chr2, pos2)  (SVIM_inter.py:293-321)
        juncs: list[tuple[str, str, str, int, str, int]] = []
        for a, b in zip(segs, segs[1:]):
            q_gap = b.qo_start - a.qo_end
            if a.ref_name != b.ref_name:
                # breakend pair at the junction (filter_tra.py bracket types)
                pos1 = a.ref_end if a.strand == 1 else a.pos
                pos2 = b.pos if b.strand == 1 else b.ref_end
                orient = ("N[" if b.strand == 1 else "N]") if a.strand == 1 \
                    else ("]N" if b.strand == 1 else "[N")
                out.append(Candidate("BND", a.ref_name, pos1, pos2, 0, hap,
                                     qname, chrom2=b.ref_name, orient=orient))
                if a.strand == b.strand:
                    d = "fwd" if a.strand == 1 else "rev"
                    juncs.append((d, d, a.ref_name, pos1, b.ref_name, pos2))
                continue
            if a.strand != b.strand:
                continue                       # INV handled above
            if a.strand == 1:
                ref_gap = b.pos - a.ref_end
                dup_len = a.ref_end - b.pos
                dup_pos = b.pos
            else:
                ref_gap = a.pos - b.ref_end
                dup_len = b.ref_end - a.pos
                dup_pos = a.pos
            if ref_gap < -cfg.segment_overlap_tol:
                # back-jump on the reference → tandem duplication; a real
                # junction is contiguous on the query (SVIM_inter DUP_TAN
                # distance tolerance) — large |q_gap| means a chimeric contig
                if (cfg.min_sv_size <= dup_len <= cfg.max_sv_size
                        and abs(q_gap) <= 2 * cfg.segment_overlap_tol):
                    out.append(Candidate("DUP", a.ref_name, dup_pos,
                                         dup_pos + dup_len, dup_len, hap,
                                         qname))
                elif (dup_len > cfg.max_sv_size
                        and abs(q_gap) <= 2 * cfg.segment_overlap_tol):
                    # very large tandem or translocation
                    _emit_same_chrom_bnd(out, juncs, a, b, hap, qname)
            elif (ref_gap > cfg.max_sv_size
                    and abs(q_gap) <= 2 * cfg.segment_overlap_tol):
                # very large DEL or intra-chromosomal translocation
                # (SVIM_inter.py:131-140)
                _emit_same_chrom_bnd(out, juncs, a, b, hap, qname)
        out.extend(_interspersed_dups(juncs, hap, qname, cfg))
    return out


def _emit_same_chrom_bnd(out: list[Candidate], juncs: list, a: _Segment,
                         b: _Segment, hap: int, qname: str) -> None:
    """Same-chromosome breakend from a > max_sv_size jump
    (SVIM_inter.py:131-140, 155-160, 166-171)."""
    if a.strand == 1:
        pos1, pos2, d = a.ref_end - 1, b.pos, "fwd"
        orient = "N["
    else:
        pos1, pos2, d = a.pos, b.ref_end - 1, "rev"
        orient = "]N"
    out.append(Candidate("BND", a.ref_name, pos1, pos2, 0, hap, qname,
                         chrom2=b.ref_name, orient=orient))
    juncs.append((d, d, a.ref_name, pos1, b.ref_name, pos2))


def _interspersed_dups(juncs: list, hap: int, qname: str,
                       cfg: ComplexSVConfig) -> list[Candidate]:
    """Interspersed duplication (DUP:INT) from an out-and-back junction
    pair: the contig leaves the destination locus to a distant origin and
    returns to (within 20bp of) the same destination breakpoint, so the
    origin span is a copy spliced in at the destination
    (SVIM_inter.py:293-321).  POS/END give the genomic *source* span, as in
    svim-asm's DUP:INT records that volcanosv-vc-complex-sv.py greps into
    DUP_final.vcf (:135-138)."""
    out = []
    for j in range(len(juncs)):
        t_dir1, t_dir2, t_chr1, t_pos1, t_chr2, t_pos2 = juncs[j]
        for b_dir1, b_dir2, b_chr1, b_pos1, b_chr2, b_pos2 in juncs[:j]:
            if not (b_dir1 == t_dir2 and b_dir2 == t_dir1
                    and b_dir1 == b_dir2):
                continue
            # destination breakpoints coincide, origin on one chromosome
            if (b_chr1 != t_chr2
                    or abs(b_pos1 - t_pos2) >= cfg.dup_int_dest_tol
                    or b_chr2 != t_chr1):
                continue
            if b_dir1 == "fwd":
                length = t_pos1 + 1 - b_pos2
                src = b_pos2
            else:
                length = b_pos2 + 1 - t_pos1
                src = t_pos1
            if cfg.min_sv_size <= length <= cfg.max_sv_size:
                out.append(Candidate("DUP", b_chr2, src, src + length,
                                     length, hap, qname))
    return out


# ---------------------------------------------------------------------------
# DUP recovery from INS calls (align_ins2ref.py)
# ---------------------------------------------------------------------------

def recover_dups_from_ins(ins_records: list[VcfRecord], ref_seqs: dict,
                          cfg: ComplexSVConfig, dtype: str = "Hifi"
                          ) -> tuple[list[VcfRecord], set[str]]:
    """An INS whose ALT sequence re-aligns next to its own breakpoint is a
    duplication (is_dup, align_ins2ref.py:82-97): size_sim ≥ 0.7, shift ≤
    300, shift/svlen ≤ 0.3.  Returns (DUP records, consumed INS ids)."""
    from ..aligner import Aligner
    from ..config import AlignConfig
    queries = []
    for r in ins_records:
        if r.svtype == "INS" and len(r.alt) > len(r.ref):
            queries.append((r.id, r.alt[1:]))
    if not queries:
        return [], set()
    preset = {"Hifi": "map-hifi", "CLR": "map-pb", "ONT": "map-ont"}.get(
        dtype, "map-hifi")
    aligner = Aligner(ref_seqs, AlignConfig.preset(preset))
    alns = aligner.align(queries)
    by_id: dict[str, list] = {}
    for a in alns:
        by_id.setdefault(a.qname, []).append(a)
    rec_by_id = {r.id: r for r in ins_records}
    dups, consumed = [], set()
    n = 0
    for rid, hits in by_id.items():
        r = rec_by_id[rid]
        svlen = len(r.alt) - len(r.ref)
        best = None
        for a in hits:
            if a.ref_name != r.chrom:
                continue
            hit_len = a.t_end() - a.pos
            size_sim = min(hit_len, svlen) / max(hit_len, svlen)
            shift = abs(a.pos - (r.pos - 1))
            if (size_sim >= cfg.dup_min_size_sim
                    and shift <= cfg.dup_max_shift
                    and shift / max(svlen, 1) <= cfg.dup_max_shift_ratio):
                score = size_sim - shift / (cfg.dup_max_shift + 1)
                if best is None or score > best[0]:
                    best = (score, a)
        if best is not None:
            n += 1
            consumed.add(rid)
            dups.append(VcfRecord(
                chrom=r.chrom, pos=r.pos, id=f"{r.chrom}-DUP-{n}",
                ref=r.ref[0], alt="<DUP>", qual=r.qual, gt=r.gt,
                info={"SVTYPE": "DUP", "SVLEN": svlen,
                      "END": r.pos + svlen,
                      "TIG_REGION": r.info.get("TIG_REGION", ""),
                      "PS": r.info.get("PS", "")},
            ))
    log.info("DUP recovery: %d/%d INS reclassified", n, len(queries))
    return dups, consumed


# ---------------------------------------------------------------------------
# INV merge + read-orientation support (filter_inv.py)
# ---------------------------------------------------------------------------

def _merge_candidates_by_span(cands: list[Candidate], dist: int
                              ) -> list[list[Candidate]]:
    """Single-linkage grouping by both endpoints within `dist`."""
    cands = sorted(cands, key=lambda c: (c.chrom, c.pos))
    groups: list[list[Candidate]] = []
    for c in cands:
        placed = False
        for g in groups:
            ref = g[0]
            if (ref.chrom == c.chrom and abs(ref.pos - c.pos) <= dist
                    and abs(ref.end - c.end) <= dist):
                g.append(c)
                placed = True
                break
        if not placed:
            groups.append([c])
    return groups


def inv_read_support(chrom_reads: list[BamRecord], pos: int, end: int,
                     flank: int) -> int:
    """Reads aligned in BOTH orientations near each breakend
    (extract_reads_support_one_region, filter_inv.py:123-157).  Returns
    min(support_left, support_right)."""
    sup = []
    for bk in (pos, end):
        fwd, rev = set(), set()
        for r in chrom_reads:
            if r.is_unmapped or r.reference_end < bk - flank \
                    or r.pos > bk + flank:
                continue
            (rev if r.is_reverse else fwd).add(r.name)
        sup.append(len(fwd & rev))
    return min(sup)


def call_inversions(cands: list[Candidate], cfg: ComplexSVConfig,
                    reads_by_chrom: dict[str, list[BamRecord]] | None,
                    ref_seqs: dict[str, str]) -> list[VcfRecord]:
    groups = _merge_candidates_by_span(
        [c for c in cands if c.svtype == "INV"], cfg.inv_merge_dist)
    out = []
    n = 0
    for g in groups:
        haps = {c.hap for c in g}
        best = max(g, key=lambda c: c.svlen)
        if reads_by_chrom is not None:
            support = inv_read_support(
                reads_by_chrom.get(best.chrom, []), best.pos, best.end,
                cfg.inv_support_flank)
            if support < cfg.inv_min_support:
                continue
        n += 1
        gt = "1|1" if haps == {1, 2} else ("1|0" if haps == {1} else "0|1")
        ref_base = ref_seqs.get(best.chrom, "N")[best.pos] \
            if best.pos < len(ref_seqs.get(best.chrom, "")) else "N"
        out.append(VcfRecord(
            chrom=best.chrom, pos=best.pos + 1,
            id=f"{best.chrom}-INV-{n}", ref=ref_base, alt="<INV>",
            qual="30", gt=gt,
            info={"SVTYPE": "INV", "SVLEN": best.svlen,
                  "END": best.end, "READS": best.qname}))
    return out


# ---------------------------------------------------------------------------
# TRA/BND clustering (filter_tra.py)
# ---------------------------------------------------------------------------

def call_translocations(cands: list[Candidate], cfg: ComplexSVConfig
                        ) -> list[VcfRecord]:
    """Single-linkage clustering of breakend pairs within tra_cluster_dist
    (cluster_bnd, filter_tra.py:70-88); duplicates collapse with GT from
    contributing haps (merge_bnd :95-116)."""
    bnds = [c for c in cands if c.svtype == "BND"]
    groups: list[list[Candidate]] = []
    for c in sorted(bnds, key=lambda c: (c.chrom, c.chrom2, c.pos)):
        placed = False
        for g in groups:
            ref = g[0]
            if (ref.chrom == c.chrom and ref.chrom2 == c.chrom2
                    and ref.orient == c.orient
                    and abs(ref.pos - c.pos) <= cfg.tra_cluster_dist
                    and abs(ref.end - c.end) <= cfg.tra_cluster_dist):
                g.append(c)
                placed = True
                break
        if not placed:
            groups.append([c])
    out = []
    for n, g in enumerate(groups, 1):
        best = g[0]
        haps = {c.hap for c in g}
        gt = "1|1" if haps == {1, 2} else ("1|0" if haps == {1} else "0|1")
        mate = f"{best.chrom2}:{best.end + 1}"
        alt = {"N[": f"N[{mate}[", "N]": f"N]{mate}]",
               "]N": f"]{mate}]N", "[N": f"[{mate}[N"}[best.orient]
        out.append(VcfRecord(
            chrom=best.chrom, pos=best.pos + 1,
            id=f"{best.chrom}-TRA-{n}", ref="N", alt=alt, qual="30", gt=gt,
            info={"SVTYPE": "BND", "CHR2": best.chrom2,
                  "END": best.end + 1, "READS": best.qname}))
    return out


def call_complex_svs(
    contig_records_by_chrom: dict[str, list[BamRecord]],
    ref_seqs: dict[str, str],
    cfg: PipelineConfig,
    ins_records: list[VcfRecord] | None = None,
    reads_by_chrom: dict[str, list[BamRecord]] | None = None,
) -> list[VcfRecord]:
    """Full complex-SV calling (driver parity: volcanosv-vc-complex-sv.py).

    ins_records: large-indel INS calls for DUP recovery (:131-138)."""
    csv = cfg.complex_sv
    cands = (segment_candidates(contig_records_by_chrom, 1, csv)
             + segment_candidates(contig_records_by_chrom, 2, csv))
    log.info("complex-SV candidates: %d (%s)", len(cands),
             {t: sum(1 for c in cands if c.svtype == t)
              for t in ("INV", "DUP", "BND")})
    out: list[VcfRecord] = []
    out += call_inversions(cands, csv, reads_by_chrom, ref_seqs)
    out += call_translocations(cands, csv)
    # direct tandem-DUP candidates from segment back-jumps
    n = 0
    for g in _merge_candidates_by_span(
            [c for c in cands if c.svtype == "DUP"], csv.inv_merge_dist):
        haps = {c.hap for c in g}
        best = max(g, key=lambda c: c.svlen)
        n += 1
        gt = "1|1" if haps == {1, 2} else ("1|0" if haps == {1} else "0|1")
        out.append(VcfRecord(
            chrom=best.chrom, pos=best.pos + 1, id=f"{best.chrom}-DUPSEG-{n}",
            ref="N", alt="<DUP>", qual="30", gt=gt,
            info={"SVTYPE": "DUP", "SVLEN": best.svlen, "END": best.end,
                  "READS": best.qname}))
    if ins_records:
        dups, _ = recover_dups_from_ins(ins_records, ref_seqs, csv,
                                        cfg.dtype.value)
        out += dups
    out.sort(key=lambda r: (r.chrom, r.pos))
    return out
