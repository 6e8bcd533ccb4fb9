"""Golden end-to-end accuracy gate at the BASELINE bar.

Fixed-seed 1Mb diploid sim — 4 chromosomes, ALL SV types (DEL/INS/INV/DUP)
plus a reciprocal cross-chromosome translocation — through the full `run`
pipeline (reads → phasing → partition → assembly → all three caller paths →
merged VCF), scored with the in-repo truvari-equivalent eval
(README.md:493-498 protocol).  The reference contract is the zenodo chr10
golden check (SURVEY.md §4); BASELINE.json's north star is F1 ≥ 0.99 on
real chr10 — this gate holds the sim pipeline at ≥ 0.95 end to end.

The truth VCF is pinned: the fixed-seed sim must regenerate
tests/data/golden_truth.vcf byte-identically, so silent simulator drift
fails loudly instead of silently re-baselining the gate.
"""
import os

import pytest

from volcanosv_tpu.cli import main
from volcanosv_tpu.eval import evaluate_files
from volcanosv_tpu.io.vcf import read_vcf

_FIXTURE = os.path.join(os.path.dirname(__file__), "data",
                        "golden_truth.vcf")

SIM_ARGS = ["--length", "250000", "--chroms", "4",
            "--n_del", "5", "--n_ins", "5", "--n_inv", "2", "--n_dup", "2",
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


def test_golden_f1_and_gt(golden_run):
    sim_dir, out_dir = golden_run
    res = evaluate_files(os.path.join(sim_dir, "truth.vcf"),
                         os.path.join(out_dir, "volcanosv_variants.vcf"))
    assert res.f1 >= 0.95, res.summary()
    assert res.recall >= 0.95, res.summary()
    assert res.gt_concordance >= 0.95, res.summary()


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
