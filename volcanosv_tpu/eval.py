"""Truvari-equivalent SV benchmarking (in-repo judge).

The reference's accuracy protocol is truvari 4.0.0 with
`-p 0.5 -P 0.5 -r 500 -S 30 -O 0.01` against GIAB (README.md:493-498).
This module reimplements that matcher natively so accuracy regression is a
unit test instead of an external tool run:

* refdist   (-r 500):  breakpoint distance gate
* pctsize   (-P 0.5):  min(size)/max(size) similarity gate
* pctsim    (-p 0.5):  ALT-sequence similarity gate (edit-distance kernel,
                       ops/banded_align.py); skipped when either record is
                       symbolic (<DEL>, <INS>, ...)
* pctovl    (-O 0.01): reciprocal-overlap gate, span types (DEL/INV/DUP)
* minsize   (-S 30):   both sides must be ≥ minsize

Matching is one-to-one greedy by descending combined score, like truvari's
best-match resolution.  Genotype concordance compares zygosity (het vs hom)
— phase orientation within a block is arbitrary for both callers.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from .io.vcf import VcfRecord


@dataclass(frozen=True)
class EvalParams:
    refdist: int = 500
    pctsize: float = 0.5
    pctsim: float = 0.5
    pctovl: float = 0.01
    minsize: int = 30
    maxsize: int = 0            # 0 = unlimited
    typematch: bool = True      # SVTYPE must match (truvari default)
    dup_to_ins: bool = True     # DUP↔INS pairs are compatible (the GIAB
                                # convention truvari --dup-to-ins serves)


@dataclass
class EvalResult:
    tp: int
    fp: int
    fn: int
    gt_concordant: int
    matches: list = field(default_factory=list)   # (base_idx, comp_idx)

    @property
    def precision(self) -> float:
        return self.tp / max(self.tp + self.fp, 1)

    @property
    def recall(self) -> float:
        return self.tp / max(self.tp + self.fn, 1)

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / max(p + r, 1e-12)

    @property
    def gt_concordance(self) -> float:
        return self.gt_concordant / max(self.tp, 1)

    def summary(self) -> dict:
        return {"TP": self.tp, "FP": self.fp, "FN": self.fn,
                "precision": round(self.precision, 4),
                "recall": round(self.recall, 4),
                "f1": round(self.f1, 4),
                "gt_concordance": round(self.gt_concordance, 4)}


_SPAN_TYPES = ("DEL", "INV", "DUP")


def _svtype(r: VcfRecord) -> str:
    t = r.svtype
    if t:
        return "DUP" if t.startswith("DUP") else t
    return "INS" if len(r.alt) > len(r.ref) else "DEL"


def _end(r: VcfRecord, svtype: str) -> int:
    if "END" in r.info:
        return int(r.info["END"])
    return r.pos + (r.svlen if svtype in _SPAN_TYPES else 0)


def _is_symbolic(r: VcfRecord) -> bool:
    return r.alt.startswith("<") or r.alt in (".", "") or r.ref == "N"


def _zygosity(gt: str) -> str:
    alleles = gt.replace("|", "/").split("/")
    alts = sum(a == "1" for a in alleles)
    return "hom" if alts >= 2 else ("het" if alts == 1 else "ref")


def _ins_seq(r: VcfRecord) -> str:
    # ALT carries ref base + inserted sequence in our/truvari convention
    return r.alt[1:] if len(r.alt) > len(r.ref) else r.alt


def evaluate(base: list[VcfRecord], comp: list[VcfRecord],
             params: EvalParams = EvalParams()) -> EvalResult:
    """Match comp calls against base truth; returns counts + match list.

    Records below minsize (or above maxsize, if set) on either side are
    excluded entirely, mirroring truvari's size filter."""
    def keep(r: VcfRecord) -> bool:
        if _svtype(r) == "BND":
            # breakends have no length: size-exempt in the unbounded
            # (large-SV) mode, but excluded when a maxsize band is set —
            # a small-indel bench must not count junction rows in its
            # denominator (truvari size filters do the same)
            return not params.maxsize
        s = r.svlen
        if s < params.minsize:
            return False
        return not (params.maxsize and s > params.maxsize)

    bidx = [i for i, r in enumerate(base) if keep(r)]
    cidx = [j for j, r in enumerate(comp) if keep(r)]

    # candidate pairs through the distance/size/type/overlap gates
    cands: list[tuple[float, int, int]] = []
    seq_pairs: list[tuple[str, str]] = []
    seq_pos: list[int] = []
    for j in cidx:
        c = comp[j]
        ct = _svtype(c)
        for i in bidx:
            b = base[i]
            bt = _svtype(b)
            if b.chrom != c.chrom:
                continue
            if params.typematch and bt != ct:
                # truvari's dup-to-ins convention: a tandem duplication and
                # an insertion of the duplicated copy are the same event
                # (GIAB truth encodes DUPs as INS)
                if not ({bt, ct} == {"DUP", "INS"} and params.dup_to_ins):
                    continue
            if abs(b.pos - c.pos) > params.refdist:
                continue
            if bt == "BND":
                # breakend match: both ends within refdist, same mate chrom
                if str(b.info.get("CHR2", "")) != str(c.info.get("CHR2", "")):
                    continue
                if abs(int(b.info.get("END", b.pos))
                       - int(c.info.get("END", c.pos))) > params.refdist:
                    continue
                ssim = 1.0
            else:
                ssim = min(b.svlen, c.svlen) / max(b.svlen, c.svlen, 1)
                if ssim < params.pctsize:
                    continue
            ovl = 1.0
            if bt in _SPAN_TYPES and ct in _SPAN_TYPES:
                be, ce = _end(b, bt), _end(c, ct)
                inter = min(be, ce) - max(b.pos, c.pos)
                ovl = inter / max(min(be - b.pos, ce - c.pos), 1)
                if ovl < params.pctovl:
                    continue
            score = ssim + max(ovl, 0.0) \
                - abs(b.pos - c.pos) / max(params.refdist, 1) * 0.1
            k = len(cands)
            cands.append((score, i, j))
            if (bt == "INS" and params.pctsim > 0
                    and not _is_symbolic(b) and not _is_symbolic(c)):
                seq_pairs.append((_ins_seq(b), _ins_seq(c)))
                seq_pos.append(k)

    if seq_pairs:
        from .vc.redundancy import edit_sim_batch
        # edit_sim_batch returns 1 - ed/(l1+l2); truvari-style similarity
        # normalizes by mean length: 1 - 2·ed/(l1+l2)  (random DNA ≈ 0.48)
        sims = 2.0 * edit_sim_batch(seq_pairs) - 1.0
        drop = {seq_pos[n] for n in range(len(seq_pairs))
                if sims[n] < params.pctsim}
        cands = [c for k, c in enumerate(cands) if k not in drop]

    cands.sort(key=lambda t: -t[0])
    used_b: set[int] = set()
    used_c: set[int] = set()
    matches: list[tuple[int, int]] = []
    gt_ok = 0
    for _score, i, j in cands:
        if i in used_b or j in used_c:
            continue
        used_b.add(i)
        used_c.add(j)
        matches.append((i, j))
        if _zygosity(base[i].gt) == _zygosity(comp[j].gt):
            gt_ok += 1

    tp = len(matches)
    return EvalResult(tp=tp, fp=len(cidx) - tp, fn=len(bidx) - tp,
                      gt_concordant=gt_ok, matches=matches)


def evaluate_snps(truth: list[VcfRecord], calls: list[VcfRecord]) -> dict:
    """SNP accuracy + phasing switch error vs sim truth.

    Truth GT encodes the carrying haplotype (1|0 = hap1, 0|1 = hap2,
    1/1 = hom — sim.implant_snps_ref).  A call is a TP when (chrom, pos,
    alt) match and zygosity agrees.  Switch error is the standard
    block-wise metric: within each called phase block (PS), order the
    truth-matched het sites by position and count adjacent orientation
    flips between the called phase and the truth haplotype — invariant to
    the arbitrary global flip of each block (longshot/HapCUT2 convention).
    """
    t_by_key = {(r.chrom, r.pos): r for r in truth}
    tp = 0
    zyg_ok = 0
    # (chrom, ps) -> [(pos, orient)]
    blocks: dict[tuple, list[tuple[int, int]]] = {}
    n_called = 0
    for c in calls:
        if len(c.ref) != 1 or len(c.alt) != 1:
            continue
        n_called += 1
        t = t_by_key.get((c.chrom, c.pos))
        if t is None or t.alt != c.alt:
            continue
        tp += 1
        t_hom = t.gt in ("1/1", "1|1")
        c_hom = c.gt in ("1/1", "1|1")
        if t_hom == c_hom:
            zyg_ok += 1
        if not t_hom and not c_hom and "|" in c.gt and c.ps is not None:
            t_hap = 1 if t.gt == "1|0" else 2
            c_hap = 1 if c.gt == "1|0" else 2
            blocks.setdefault((c.chrom, c.ps), []).append(
                (c.pos, int(t_hap == c_hap)))
    switches = 0
    pairs = 0
    for sites in blocks.values():
        sites.sort()
        for (p0, o0), (p1, o1) in zip(sites, sites[1:]):
            pairs += 1
            switches += int(o0 != o1)
    return {
        "snp_tp": tp,
        "snp_recall": round(tp / max(len(t_by_key), 1), 4),
        "snp_precision": round(tp / max(n_called, 1), 4),
        "zygosity_concordance": round(zyg_ok / max(tp, 1), 4),
        "switch_errors": switches,
        "switch_pairs": pairs,
        "switch_error_rate": round(switches / max(pairs, 1), 4),
    }


def evaluate_snp_files(truth_vcf: str, calls_vcf: str) -> dict:
    from .io.vcf import read_vcf
    _h1, truth = read_vcf(truth_vcf)
    _h2, calls = read_vcf(calls_vcf)
    return evaluate_snps(truth, calls)


def evaluate_files(base_vcf: str, comp_vcf: str,
                   params: EvalParams = EvalParams()) -> EvalResult:
    from .io.vcf import read_vcf
    _h1, base = read_vcf(base_vcf)
    _h2, comp = read_vcf(comp_vcf)
    return evaluate(base, comp, params)


def main(argv=None) -> int:
    import argparse
    ap = argparse.ArgumentParser(
        description="truvari-equivalent SV benchmark")
    ap.add_argument("--base", required=True, help="truth VCF")
    ap.add_argument("--comp", required=True, help="call VCF")
    ap.add_argument("-r", "--refdist", type=int, default=500)
    ap.add_argument("-P", "--pctsize", type=float, default=0.5)
    ap.add_argument("-p", "--pctsim", type=float, default=0.5)
    ap.add_argument("-O", "--pctovl", type=float, default=0.01)
    ap.add_argument("-S", "--minsize", type=int, default=30)
    args = ap.parse_args(argv)
    res = evaluate_files(args.base, args.comp, EvalParams(
        refdist=args.refdist, pctsize=args.pctsize, pctsim=args.pctsim,
        pctovl=args.pctovl, minsize=args.minsize))
    print(json.dumps(res.summary()))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
