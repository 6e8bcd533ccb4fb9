"""Truvari-equivalent matcher (eval.py) — gate semantics + greedy 1-1."""
import numpy as np

from volcanosv_tpu.eval import EvalParams, EvalResult, evaluate
from volcanosv_tpu.io.vcf import VcfRecord


def _rec(chrom="chr1", pos=1000, svtype="DEL", svlen=100, gt="0/1",
         ref="N", alt=None, end=None):
    alt = alt if alt is not None else f"<{svtype}>"
    info = {"SVTYPE": svtype, "SVLEN": svlen}
    if end is not None:
        info["END"] = end
    elif svtype in ("DEL", "INV", "DUP"):
        info["END"] = pos + svlen
    return VcfRecord(chrom=chrom, pos=pos, id=".", ref=ref, alt=alt,
                     gt=gt, info=info)


def test_exact_match_tp():
    res = evaluate([_rec()], [_rec()])
    assert (res.tp, res.fp, res.fn) == (1, 0, 0)
    assert res.f1 == 1.0 and res.gt_concordance == 1.0


def test_refdist_gate():
    # INS: pure breakpoint-distance gate (no span-overlap requirement)
    assert evaluate([_rec(pos=1000, svtype="INS")],
                    [_rec(pos=1501, svtype="INS")]).tp == 0
    assert evaluate([_rec(pos=1000, svtype="INS")],
                    [_rec(pos=1499, svtype="INS")]).tp == 1


def test_pctsize_gate():
    assert evaluate([_rec(svlen=100)], [_rec(svlen=49)]).tp == 0
    assert evaluate([_rec(svlen=100)], [_rec(svlen=51)]).tp == 1


def test_type_mismatch_is_fp_and_fn():
    res = evaluate([_rec(svtype="DEL")], [_rec(svtype="INS")])
    assert (res.tp, res.fp, res.fn) == (0, 1, 1)


def test_minsize_excludes_both_sides():
    res = evaluate([_rec(svlen=20)], [_rec(svlen=20)], EvalParams(minsize=30))
    assert (res.tp, res.fp, res.fn) == (0, 0, 0)


def test_greedy_one_to_one():
    base = [_rec(pos=1000), _rec(pos=1200)]
    comp = [_rec(pos=1001)]         # closest to base[0]
    res = evaluate(base, comp)
    assert (res.tp, res.fn, res.fp) == (1, 1, 0)
    assert res.matches == [(0, 0)]


def test_ins_seq_similarity_gate():
    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    other = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    b = _rec(svtype="INS", svlen=200, ref="A", alt="A" + seq)
    good = _rec(svtype="INS", svlen=200, ref="A", alt="A" + seq)
    bad = _rec(svtype="INS", svlen=200, ref="A", alt="A" + other)
    assert evaluate([b], [good]).tp == 1
    assert evaluate([b], [bad]).tp == 0            # random ≠: sim ≈ 0.5⁻
    # symbolic comp skips the sequence gate
    sym = _rec(svtype="INS", svlen=200)
    assert evaluate([b], [sym]).tp == 1


def test_gt_concordance_zygosity():
    res = evaluate([_rec(gt="1|1")], [_rec(gt="0/1")])
    assert res.tp == 1 and res.gt_concordant == 0
    res = evaluate([_rec(gt="1|0")], [_rec(gt="0|1")])   # both het
    assert res.gt_concordant == 1


def test_del_reciprocal_overlap_gate():
    # same pos but comp span shifted so overlap < 1%
    b = _rec(pos=1000, svlen=400, end=1400)
    c = _rec(pos=1390, svlen=400, end=1790)     # 10bp overlap ≥ 1% of 400
    assert evaluate([b], [c], EvalParams(pctovl=0.01)).tp == 1
    c2 = _rec(pos=1401, svlen=400, end=1801)
    assert evaluate([b], [c2]).tp == 0


def test_dup_to_ins_convention():
    """GIAB encodes tandem DUPs as INS of the copy — truvari --dup-to-ins
    (EvalParams.dup_to_ins) must pair DUP↔INS; disabling it must not."""
    b = _rec(svtype="INS", svlen=120)
    c = _rec(svtype="DUP", svlen=120)
    assert evaluate([b], [c]).tp == 1
    assert evaluate([b], [c],
                    EvalParams(dup_to_ins=False)).tp == 0


def test_bnd_matching_gates():
    """BND pairs need chrom + CHR2 + both-end distance ≤ refdist; size
    gates don't apply (breakends are length-free)."""
    def bnd(pos, chr2, end):
        return VcfRecord(chrom="chr1", pos=pos, id=".", ref="N",
                         alt=f"N[{chr2}:{end}[", gt="1/1",
                         info={"SVTYPE": "BND", "CHR2": chr2, "END": end})
    b = bnd(5000, "chr2", 9000)
    assert evaluate([b], [bnd(5100, "chr2", 9100)]).tp == 1
    assert evaluate([b], [bnd(5100, "chr3", 9100)]).tp == 0   # mate chrom
    assert evaluate([b], [bnd(5100, "chr2", 9501)]).tp == 0   # mate end far
    assert evaluate([b], [bnd(5501, "chr2", 9000)]).tp == 0   # this end far


def test_greedy_tie_prefers_closer_breakpoint():
    """Two comp calls inside refdist of one base: the score's distance
    term must pick the closer one deterministically."""
    base = [_rec(pos=1000)]
    comp = [_rec(pos=1090), _rec(pos=1010)]
    res = evaluate(base, comp)
    assert res.matches == [(0, 1)]
    assert (res.tp, res.fp) == (1, 1)


def test_two_base_two_comp_cross_assignment():
    """Greedy 1-1 must not double-spend a comp call: each base gets its
    own nearest comp."""
    base = [_rec(pos=1000), _rec(pos=1300)]
    comp = [_rec(pos=1010), _rec(pos=1310)]
    res = evaluate(base, comp)
    assert sorted(res.matches) == [(0, 0), (1, 1)]
    assert (res.tp, res.fp, res.fn) == (2, 0, 0)


def test_maxsize_filter():
    res = evaluate([_rec(svlen=80)], [_rec(svlen=80)],
                   EvalParams(minsize=2, maxsize=49))
    assert (res.tp, res.fp, res.fn) == (0, 0, 0)


def test_pctsim_threshold_sweep():
    """~half-mutated INS sequence sits between pctsim 0.3 and 0.9."""
    rng = np.random.default_rng(3)
    seq = list("ACGT"[i] for i in rng.integers(0, 4, 300))
    mut = list(seq)
    for i in rng.integers(0, 300, 60):
        mut[i] = "ACGT"[(("ACGT".index(mut[i])) + 1) % 4]
    b = _rec(svtype="INS", svlen=300, ref="A", alt="A" + "".join(seq))
    c = _rec(svtype="INS", svlen=300, ref="A", alt="A" + "".join(mut))
    assert evaluate([b], [c], EvalParams(pctsim=0.3)).tp == 1
    assert evaluate([b], [c], EvalParams(pctsim=0.9)).tp == 0
