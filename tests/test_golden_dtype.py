"""Golden-scale CLR/ONT accuracy gates (round-3 verdict item 5).

The HiFi golden gate (test_golden_e2e.py) holds the pipeline at the
BASELINE bar on clean reads; the reference's CLR/ONT story is carried by
per-dtype parameter tables (para/GT_correction_para_{CLR,ONT}_*.txt,
filter_para.csv rows, extract_contig_signature_{CLR,ONT}.py thresholds)
that round 3 only exercised on a 30kb/4-SV recall-only smoke test.  This
harness clones the golden contract at realistic platform noise — CLR
13.5% / ONT 9% total error — on a 400kb chromosome with the full SV mix,
and PINS per-dtype floors for recall/precision/GT plus SNP precision.
The floors are lower than HiFi's (noise costs accuracy on every caller)
but fixed: a regression in any noisy-path component fails loudly.
"""
import os

import pytest

from volcanosv_tpu.cli import main
from volcanosv_tpu.eval import EvalParams, evaluate_files, evaluate_snp_files

SIM = ["--length", "200000", "--chroms", "1",
       "--n_del", "6", "--n_ins", "6", "--n_inv", "2", "--n_dup", "2",
       "--n_clustered", "2", "--n_nested", "1", "--n_small", "5",
       "--coverage", "25", "--read_len", "8000", "--seed", "23"]

# (dtype, --err, min_recall, min_precision, min_gt, min_snp_precision,
#  min_snp_recall)
# Floors PINNED below the measured fixed-seed state (round 5, this tree:
# CLR large recall 1.0 / precision 0.957 / GT 0.864, SNP 0.88/0.88,
# switch 0; ONT large recall 0.955 / precision 1.0 / GT 0.905, SNP
# recall 0.97 / precision 0.83, switch 0).  The round-4 "0 SNPs at CLR"
# gap is closed by the realign-everywhere pair-HMM model
# (PhasingConfig.realign_all) — these floors now hold the noisy-platform
# paths near the HiFi bar instead of codifying the old gap.
CASES = [("CLR", 0.09, 0.90, 0.90, 0.80, 0.85, 0.80),
         ("ONT", 0.06, 0.90, 0.95, 0.85, 0.80, 0.90)]


@pytest.fixture(scope="module", params=CASES, ids=lambda c: c[0])
def dtype_run(request, tmp_path_factory):
    dtype, err, *gates = request.param
    d = tmp_path_factory.mktemp(f"golden_{dtype}")
    sim_dir, out_dir = str(d / "sim"), str(d / "out")
    assert main(["sim", "-o", sim_dir, "--err", str(err)] + SIM) == 0
    assert main(["run", "--ref", f"{sim_dir}/ref.fa",
                 "--fastq", f"{sim_dir}/reads.fastq", "-o", out_dir,
                 "-d", dtype]) == 0
    return dtype, sim_dir, out_dir, gates


def test_golden_dtype_large(dtype_run):
    dtype, sim_dir, out_dir, (min_r, min_p, min_gt, _sp, _sr) = dtype_run
    res = evaluate_files(os.path.join(sim_dir, "truth.vcf"),
                         os.path.join(out_dir, "volcanosv_variants.vcf"),
                         EvalParams(pctsim=0.0))
    assert res.recall >= min_r, (dtype, res.summary())
    assert res.precision >= min_p, (dtype, res.summary())
    assert res.gt_concordance >= min_gt, (dtype, res.summary())


def test_golden_dtype_snps(dtype_run):
    dtype, sim_dir, out_dir, (_r, _p, _g, min_sp, min_sr) = dtype_run
    res = evaluate_snp_files(os.path.join(sim_dir, "truth_snps.vcf"),
                             os.path.join(out_dir, "phased_snps.vcf"))
    assert res["snp_precision"] >= min_sp, (dtype, res)
    assert res["snp_recall"] >= min_sr, (dtype, res)
    assert res["switch_error_rate"] <= 0.05, (dtype, res)
