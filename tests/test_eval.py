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
