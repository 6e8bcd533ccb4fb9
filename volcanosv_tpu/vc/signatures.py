"""SV signature extraction from contig/read alignments.

Reimplements the semantics of the reference's per-dtype extractors
(`extract_contig_signature_{Hifi,CLR,ONT}.py`, see SURVEY.md §2.1):

* CIGAR walk collecting DEL/INS ops ≥ min_svlen with contig offsets
  (ref: extract_contig_signature_Hifi.py:53-166) — here a vectorized numpy
  pass over the packed (op, len) cigar array instead of a per-op loop.
* per-read merging of nearby INS/DEL runs (ref :108-161)
* split-alignment signatures from coordinate-adjacent supplementary pairs
  (ref extract_sig_from_split :307-371)
* windowed clustering keeping the longest signature per cluster
  (ref cluster_del/cluster_ins :196-288) — the reference's O(n²) greedy
  seed scan becomes a pos-sorted linear sweep with identical semantics
  (a match requires shift ≤ max_shift, so all candidates are contiguous
  in the sort).

Signatures carry the same fields as the reference's 10-column rows so the
downstream VCF is emit-compatible (TIG_REGION/QUERY_STRAND/SIG_SOURCE/
TIG_MAPQ).
"""
from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

from ..config import SignatureConfig
from ..io.bam import BamRecord

# BAM cigar op codes
_M, _I, _D, _S, _H, _EQ, _X = 0, 1, 2, 4, 5, 7, 8


@dataclass(slots=True)
class Signature:
    chrom: str
    svtype: str           # 'DEL' | 'INS'
    pos: int              # 0-based ref coordinate of the event start
    svlen: int
    qname: str
    q_start: int          # contig offsets incl. clips, aligned orientation
    q_end: int
    strand: str           # '+' | '-'
    source: str           # 'cigar' | 'split-alignment'
    mapq: str             # str: single mapq or 'm1-m2' for split pairs

    @property
    def end(self) -> int:
        return self.pos + self.svlen


def _cigar_positions(cigar: np.ndarray, pos: int):
    """Vectorized ref/query start offsets per cigar op.

    Returns (ref_start, q_start) int64 arrays, where q offsets include
    soft AND hard clips (the reference adds hard_clip_head to contig
    offsets, extract_contig_signature_Hifi.py:62-64)."""
    ops = cigar[:, 0]
    lens = cigar[:, 1].astype(np.int64)
    cr = np.isin(ops, (_M, _D, _EQ, _X)) * lens
    cq = np.isin(ops, (_M, _I, _S, _H, _EQ, _X)) * lens
    ref_start = pos + np.concatenate([[0], np.cumsum(cr)[:-1]])
    q_start = np.concatenate([[0], np.cumsum(cq)[:-1]])
    return ref_start, q_start


def cigar_sigs(rec: BamRecord, chrom: str, cfg: SignatureConfig,
               merge: bool = True):
    """CIGAR DEL/INS signatures of one alignment (+ per-read merge).

    ref: extract_sig_from_cigar (extract_contig_signature_Hifi.py:53-166).
    merge=False returns the raw per-op signatures (the cuteSV-style stream
    of sig_extract.py parse_read, which applies its own distance-based
    merge downstream — see reads_sig.extract_gt_read_sigs)."""
    cigar = np.asarray(rec.cigar)
    if len(cigar) == 0:
        return [], []
    ref_start, q_start = _cigar_positions(cigar, rec.pos)
    ops, lens = cigar[:, 0], cigar[:, 1].astype(np.int64)
    strand = "-" if rec.is_reverse else "+"
    mq = str(rec.mapq)

    dels, inss = [], []
    for sel, svtype, out in ((ops == _D, "DEL", dels), (ops == _I, "INS", inss)):
        idx = np.nonzero(sel & (lens >= cfg.min_sv_size))[0]
        for i in idx:
            L = int(lens[i])
            q0 = int(q_start[i])
            q1 = q0 + 1 if svtype == "DEL" else q0 + L
            out.append(Signature(chrom, svtype, int(ref_start[i]), L,
                                 rec.name, q0, q1, strand, "cigar", mq))
    if not merge:
        return dels, inss
    return _merge_dels_one_read(dels), _merge_inss_one_read(inss)


def _merge_inss_one_read(sigs: list[Signature]) -> list[Signature]:
    """Merge nearby INS runs within one alignment.

    ref thresholds (cluster_ins_one_read :108-138): merge when both >250bp
    & <250bp apart, OR both >320 & <380 apart, OR both >100 & <250 apart.
    Merged svlen spans the contig range (read_end - read_start)."""
    if len(sigs) < 2:
        return sigs
    out = [sigs[0]]
    for s2 in sigs[1:]:
        s1 = out[-1]
        d = abs(s2.pos - s1.pos)
        if ((s1.svlen > 250 and s2.svlen > 250 and d < 250)
                or (s1.svlen > 320 and s2.svlen > 320 and d < 380)
                or (s1.svlen > 100 and s2.svlen > 100 and d < 250)):
            out[-1] = replace(s1, svlen=s2.q_end - s1.q_start, q_end=s2.q_end)
        else:
            out.append(s2)
    return out


def _merge_dels_one_read(sigs: list[Signature]) -> list[Signature]:
    """ref cluster_del_one_read (:140-161): merge when both >150bp & <150bp
    apart; merged svlen = end2 - pos1."""
    if len(sigs) < 2:
        return sigs
    out = [sigs[0]]
    for s2 in sigs[1:]:
        s1 = out[-1]
        if s1.svlen > 150 and s2.svlen > 150 and abs(s2.pos - s1.pos) < 150:
            out[-1] = replace(s1, svlen=s2.pos + s2.svlen - s1.pos,
                              q_end=s1.q_start + 1)
        else:
            out.append(s2)
    return out


def _read_span(cigar: np.ndarray) -> tuple[int, int, int]:
    """(aligned_start, aligned_end, full_len) in read coords incl. clips."""
    ops, lens = cigar[:, 0], cigar[:, 1].astype(np.int64)
    rl = int(lens[np.isin(ops, (_M, _I, _S, _H, _EQ, _X))].sum())
    start = int(lens[0]) if ops[0] in (_S, _H) else 0
    end = rl - int(lens[-1]) if ops[-1] in (_S, _H) else rl
    return start, end, rl


def split_sigs(rec1: BamRecord, rec2: BamRecord, chrom: str,
               cfg: SignatureConfig, min_mapq: int,
               split_overlap_tol: int | None = None,
               rel_overlap: float = 0.0):
    """Split-alignment DEL/INS from a coordinate-adjacent pair of segments
    of the same query (ref extract_sig_from_split :307-371).

      Diffdis = (Ref2s - Ref1e) - (Read2s - Read1e)
      DEL if Diffdis >= 30 (Diffolp = Read1e - Read2s, |Diffolp| <= 3000)
      INS if Diffdis <= -30 (Diffolp = Ref1e - Ref2s, Diffolp < 3000)

    rel_overlap > 0 switches to the CLR/ONT relative-overlap criterion
    (extract_contig_signature_CLR.py:368-399: require |Diffolp| <=
    r*|Diffdis| instead of the absolute tolerance)."""
    if rec1.pos > rec2.pos:
        rec1, rec2 = rec2, rec1
    if rec1.is_reverse != rec2.is_reverse:
        return [], []
    if rec1.mapq < min_mapq or rec2.mapq < min_mapq:
        return [], []
    c1, c2 = np.asarray(rec1.cigar), np.asarray(rec2.cigar)
    if len(c1) == 0 or len(c2) == 0:
        return [], []
    # segment 1 must end with a clip, segment 2 begin with one
    if c1[-1, 0] not in (_S, _H) or c2[0, 0] not in (_S, _H):
        return [], []
    _, read1e, rl1 = _read_span(c1)
    read2s, _, rl2 = _read_span(c2)
    if rl1 != rl2:
        return [], []
    ref1e = rec1.reference_end
    ref2s = rec2.pos
    diffdis = (ref2s - ref1e) - (read2s - read1e)
    strand = "-" if rec1.is_reverse else "+"
    mq = f"{rec1.mapq}-{rec2.mapq}"
    tol = cfg.split_overlap_tol if split_overlap_tol is None else split_overlap_tol
    if abs(diffdis) > cfg.max_sv_size:
        return [], []
    if diffdis >= cfg.min_sv_size:
        diffolp = read1e - read2s
        ok = (abs(diffolp) <= rel_overlap * abs(diffdis)) if rel_overlap > 0 \
            else (abs(diffolp) <= tol)
        if ok:
            pos = ref1e - diffolp // 2
            q0 = read1e - diffolp // 2
            return [Signature(chrom, "DEL", int(pos), int(diffdis), rec1.name,
                              int(q0), int(q0) + 1, strand,
                              "split-alignment", mq)], []
    elif diffdis <= -cfg.min_sv_size:
        diffolp = ref1e - ref2s
        if cfg.split_ins_ont:
            # ONT branch: Diffdis*0.8 ≤ Diffolp ≤ |Diffdis|*r
            # (extract_contig_signature_ONT.py:373-380)
            ok = diffdis * 0.8 <= diffolp <= rel_overlap * abs(diffdis)
        elif rel_overlap > 0:
            ok = abs(diffolp) <= rel_overlap * abs(diffdis)
        else:
            ok = diffolp < tol
        if ok:
            svlen = abs(read2s - read1e + diffolp)
            pos = (ref1e + ref2s) // 2 if abs(diffolp) > 400 else ref2s
            return [], [Signature(chrom, "INS", int(pos), int(svlen),
                                  rec1.name, int(read1e - diffolp),
                                  int(read2s), strand, "split-alignment", mq)]
    return [], []


def _sig_match(s1: Signature, s2: Signature, max_shift: int,
               min_size_sim: float, min_overlap: float) -> bool:
    if abs(s1.pos - s2.pos) > max_shift:
        return False
    if min(s1.svlen, s2.svlen) / max(s1.svlen, s2.svlen) < min_size_sim:
        return False
    if s1.svtype == "DEL":
        ov = (min(s1.end, s2.end) - max(s1.pos, s2.pos)) / min(s1.svlen, s2.svlen)
        if ov < min_overlap:
            return False
    return True


def cluster_sigs(sigs: list[Signature], cfg: SignatureConfig) -> list[Signature]:
    """Greedy seed clustering, keep longest per cluster.

    ref cluster_del/cluster_ins (:196-288): iterate pos-sorted seeds; each
    unclustered signature within shift ≤ max_shift matching the seed joins
    its cluster.  Linear sweep over the pos sort (matches are contiguous)."""
    if not sigs:
        return []
    sigs = sorted(sigs, key=lambda s: s.pos)
    pos = np.array([s.pos for s in sigs])
    cluster = np.full(len(sigs), -1, np.int64)
    for i in range(len(sigs)):
        if cluster[i] != -1:
            continue
        cluster[i] = i
        hi = int(np.searchsorted(pos, pos[i] + cfg.max_shift, "right"))
        for j in range(i + 1, hi):
            if cluster[j] == -1 and _sig_match(
                    sigs[i], sigs[j], cfg.max_shift, cfg.min_size_sim,
                    cfg.min_overlap):
                cluster[j] = i
    out = []
    for cid in np.unique(cluster):
        members = [sigs[j] for j in np.nonzero(cluster == cid)[0]]
        out.append(max(members, key=lambda s: s.svlen))
    out.sort(key=lambda s: s.pos)
    return out


def _is_noisy_contig(cigar: np.ndarray, cfg: SignatureConfig) -> bool:
    """CLR gate: a contig alignment is noise unless its inserted fraction
    is small OR its mean match-run length is large (ins_pct/var_dist,
    extract_contig_signature_CLR.py:53-71; keep when ip ≤ 0.13 or
    avg ≥ 200, applied :425-427)."""
    ops, lens = cigar[:, 0], cigar[:, 1].astype(np.int64)
    m_lens = lens[np.isin(ops, (_M, _EQ, _X))]
    ins = int(lens[ops == _I].sum())
    m_tot = int(m_lens.sum())
    if m_tot + ins == 0:
        return True
    ins_pct = ins / (m_tot + ins)
    avg_var_dist = m_tot / max(len(m_lens), 1)
    return ins_pct > cfg.noisy_max_ins_pct \
        and avg_var_dist < cfg.noisy_min_var_dist


def extract_contig_signatures(
    records: list[BamRecord], chrom: str, hp: str, cfg: SignatureConfig,
) -> list[Signature]:
    """Full per-haplotype signature extraction: cigar + split, each
    clustered, then merged and re-clustered (ref extract_signature_one_hap
    + merge_all, extract_contig_signature_Hifi.py:492-513).

    records: alignments on `chrom`, coordinate-sorted; hp filter matches
    the reference's `hp in read.qname` substring test."""
    recs = [r for r in records if hp in r.name and not r.is_unmapped]
    # per-contig inverted spans (minority-strand segments): the majority-
    # strand alignment crosses an inversion as soup whose indel fragments
    # are coordinate garbage — its cigar signatures inside the span are
    # dropped; the inverted segment's own cigar (correct coordinates,
    # e.g. a nested interior DEL) is kept
    strand_len: dict[str, dict[int, int]] = {}
    for r in recs:
        d = strand_len.setdefault(r.name, {1: 0, -1: 0})
        d[-1 if r.is_reverse else 1] += max(r.reference_length(), 0)
    inv_spans: dict[str, list[tuple[int, int]]] = {}
    for r in recs:
        d = strand_len[r.name]
        dom = 1 if d[1] >= d[-1] else -1
        if (-1 if r.is_reverse else 1) != dom:
            inv_spans.setdefault(r.name, []).append(
                (r.pos - 10, r.reference_end + 10))

    def _in_inv(name: str, pos: int) -> bool:
        return any(a <= pos <= b for a, b in inv_spans.get(name, []))

    dels_c, inss_c = [], []
    for r in recs:
        if r.mapq >= cfg.min_mapq:
            if cfg.noisy_contig_filter and len(r.cigar) \
                    and _is_noisy_contig(np.asarray(r.cigar), cfg):
                continue
            d, i = cigar_sigs(r, chrom, cfg)
            dom = 1 if strand_len[r.name][1] >= strand_len[r.name][-1] else -1
            if (-1 if r.is_reverse else 1) == dom and r.name in inv_spans:
                d = [s for s in d if not _in_inv(r.name, s.pos)]
                i = [s for s in i if not _in_inv(r.name, s.pos)]
            dels_c.extend(d)
            inss_c.extend(i)

    # split pairs: adjacent segments per query in coordinate order; tiny
    # segments (dup-copy re-alignments) are excluded — pairing them
    # fabricates junctions (cfg.min_split_segment) — and so are segments
    # query-CONTAINED in a longer one (inverted supplementaries live
    # inside their parent's span; pairing two of them fabricates indels)
    from .reads_sig import _drop_contained_segments
    by_name: dict[str, list[BamRecord]] = {}
    for r in recs:
        if r.mapq >= cfg.min_mapq \
                and r.reference_length() >= cfg.min_split_segment:
            by_name.setdefault(r.name, []).append(r)
    dels_s, inss_s = [], []
    for name, group in by_name.items():
        if len(group) < 2:
            continue
        group = _drop_contained_segments(group)
        if len(group) < 2:
            continue
        group.sort(key=lambda r: r.pos)
        for a, b in zip(group, group[1:]):
            d, i = split_sigs(a, b, chrom, cfg, cfg.min_mapq,
                              rel_overlap=cfg.split_rel_overlap)
            dels_s.extend(d)
            inss_s.extend(i)

    dels = cluster_sigs(cluster_sigs(dels_c, cfg) + cluster_sigs(dels_s, cfg), cfg)
    inss = cluster_sigs(cluster_sigs(inss_c, cfg) + cluster_sigs(inss_s, cfg), cfg)
    return sorted(dels + inss, key=lambda s: s.pos)
