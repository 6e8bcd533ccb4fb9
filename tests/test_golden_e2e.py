"""Golden end-to-end accuracy gates at the BASELINE bar.

Fixed-seed 1Mb diploid sim — 4 chromosomes, ALL SV types (DEL/INS/INV/DUP)
plus clustered DEL+INS pairs (600-900bp apart), nested INV-with-interior-DEL
events, 2-29bp small indels, het+hom SNPs, and a reciprocal cross-chromosome
translocation — ~230 truth SV rows — through the full `run` pipeline
(reads → phasing → partition → assembly → all three caller paths → merged
VCF), scored with the in-repo truvari-equivalent eval (README.md:493-498
protocol).  The reference contract is the zenodo chr10 golden check
(SURVEY.md §4); BASELINE.json's north star is F1 ≥ 0.99 on real chr10 —
this gate holds the sim pipeline at ≥ 0.97 end to end, plus the paths the
reference's README never gated: small-indel F1, SNP accuracy, and phasing
switch error (volcanosv-vc-small-indel.py has no accuracy gate at all).

The truth VCF is pinned: the fixed-seed sim must regenerate
tests/data/golden_truth.vcf byte-identically, so silent simulator drift
fails loudly instead of silently re-baselining the gates.
"""
import os

import pytest

from volcanosv_tpu.cli import main
from volcanosv_tpu.eval import EvalParams, evaluate_files, evaluate_snp_files
from volcanosv_tpu.io.vcf import read_vcf

_FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                        "golden_truth.vcf")

SIM_ARGS = ["--length", "250000", "--chroms", "4",
            "--n_del", "12", "--n_ins", "12", "--n_inv", "4", "--n_dup", "4",
            "--n_clustered", "5", "--n_nested", "4", "--n_small", "10",
            "--n_tra", "1", "--coverage", "30", "--read_len", "9000",
            "--seed", "42"]


@pytest.fixture(scope="module")
def golden_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    sim_dir, out_dir = str(d / "sim"), str(d / "out")
    assert main(["sim", "-o", sim_dir] + SIM_ARGS) == 0
    assert main(["run", "--ref", f"{sim_dir}/ref.fa",
                 "--fastq", f"{sim_dir}/reads.fastq", "-o", out_dir]) == 0
    return sim_dir, out_dir


def test_truth_vcf_pinned(golden_run):
    sim_dir, _ = golden_run
    with open(os.path.join(sim_dir, "truth.vcf"), "rb") as fh:
        got = fh.read()
    with open(_FIXTURE, "rb") as fh:
        want = fh.read()
    assert got == want, "fixed-seed sim drifted from the pinned truth VCF"


def test_truth_scale(golden_run):
    """The gate must have statistical power: ≥200 SV rows ≥30bp plus the
    small/SNP truth sets (VERDICT r2: 60-SV gates are one-miss-from-green)."""
    sim_dir, _ = golden_run
    _h, truth = read_vcf(os.path.join(sim_dir, "truth.vcf"))
    large = [r for r in truth if r.svtype == "BND" or r.svlen >= 30]
    small = [r for r in truth if r.svtype != "BND" and 2 <= r.svlen < 30]
    assert len(large) >= 200, len(large)
    assert len(small) >= 30, len(small)
    _h2, snps = read_vcf(os.path.join(sim_dir, "truth_snps.vcf"))
    assert len(snps) >= 400, len(snps)


def test_golden_f1_and_gt(golden_run):
    sim_dir, out_dir = golden_run
    res = evaluate_files(os.path.join(sim_dir, "truth.vcf"),
                         os.path.join(out_dir, "volcanosv_variants.vcf"))
    # north-star bar (BASELINE.json F1 ≥ 0.99): measured 1.0/1.0/0.9951 on
    # this tree (round 5 — linkage-split phase blocks + marker-eligible
    # read assignment)
    assert res.f1 >= 0.99, res.summary()
    assert res.recall >= 0.99, res.summary()
    assert res.gt_concordance >= 0.98, res.summary()


def test_golden_small_indel(golden_run):
    """2-29bp indel accuracy of the small-indel path (htsbox pileup +
    vcfpair + kmer-support equivalent) — the half of the paper the
    reference never gates."""
    sim_dir, out_dir = golden_run
    res = evaluate_files(
        os.path.join(sim_dir, "truth.vcf"),
        os.path.join(out_dir, "volcanosv_small_indel.vcf"),
        EvalParams(minsize=2, maxsize=29, pctsim=0.0))
    assert res.recall >= 0.93, res.summary()
    assert res.precision >= 0.95, res.summary()
    assert res.gt_concordance >= 0.90, res.summary()


def test_golden_snps_and_switch_error(golden_run):
    """SNP recall/precision vs the implanted truth and block-wise phasing
    switch error — the longshot-equivalent output (README.md:237-238)."""
    sim_dir, out_dir = golden_run
    res = evaluate_snp_files(os.path.join(sim_dir, "truth_snps.vcf"),
                             os.path.join(out_dir, "phased_snps.vcf"))
    assert res["snp_recall"] >= 0.95, res
    assert res["snp_precision"] >= 0.95, res
    assert res["zygosity_concordance"] >= 0.95, res
    assert res["switch_error_rate"] <= 0.02, res


def test_golden_cross_chrom_bnd(golden_run):
    """The implanted reciprocal translocation must surface as reciprocal
    MATEID-linked BND records at both junctions, genotyped 1|1."""
    sim_dir, out_dir = golden_run
    _h, truth = read_vcf(os.path.join(sim_dir, "truth.vcf"))
    _h2, calls = read_vcf(os.path.join(out_dir, "volcanosv_variants.vcf"))
    t_bnds = [r for r in truth if r.svtype == "BND"]
    c_bnds = [r for r in calls if r.svtype == "BND"]
    assert t_bnds and c_bnds
    by_id = {r.id: r for r in c_bnds}
    matched = 0
    for t in t_bnds:
        for c in c_bnds:
            if (c.chrom == t.chrom and abs(c.pos - t.pos) <= 200
                    and str(c.info.get("CHR2")) == str(t.info.get("CHR2"))):
                assert c.gt == "1|1", c
                mate = by_id[c.info["MATEID"]]
                assert mate.info["MATEID"] == c.id
                matched += 1
                break
    assert matched >= len(t_bnds) // 2, (matched, len(t_bnds))
