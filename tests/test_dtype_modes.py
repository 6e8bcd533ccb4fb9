"""CLR / ONT datatype modes end-to-end on noisy simulated reads.

ref parity: the datatype switches both scripts and parameters —
extract_contig_signature_{CLR,ONT}.py (split rel-overlap r=0.3/0.5),
filter_para.csv coverage bands, GT_correction_para_{CLR,ONT}_*.txt
thresholds, and the CLR/ONT FASTQ dedup pre-pass
(General_Assembly_Workflow.py remove_duplicate:389-415)."""
import os

import pytest

from volcanosv_tpu.cli import main
from volcanosv_tpu.config import DataType, PipelineConfig
from volcanosv_tpu.eval import EvalParams, evaluate_files
from volcanosv_tpu.io.vcf import read_vcf


def test_dtype_configs_differ():
    hifi = PipelineConfig.for_dtype("Hifi")
    clr = PipelineConfig.for_dtype("CLR")
    ont = PipelineConfig.for_dtype("ONT")
    assert clr.signature.split_rel_overlap == 0.3
    assert ont.signature.split_rel_overlap == 0.5
    assert clr.assembly.dedup_reads and ont.assembly.dedup_reads
    assert not hifi.assembly.dedup_reads
    assert clr.cov_filter.del_high != hifi.cov_filter.del_high
    assert clr.gt_correction.del_thresholds != hifi.gt_correction.del_thresholds


@pytest.mark.parametrize("dtype,err", [("CLR", 0.02), ("ONT", 0.02)])
def test_noisy_dtype_pipeline(tmp_path, dtype, err):
    sim_dir, out = str(tmp_path / "sim"), str(tmp_path / "out")
    assert main(["sim", "-o", sim_dir, "--length", "30000", "--n_del", "2",
                 "--n_ins", "2", "--coverage", "30", "--read_len", "5000",
                 "--err", str(err), "--seed", "13"]) == 0
    assert main(["run", "--ref", f"{sim_dir}/ref.fa",
                 "--fastq", f"{sim_dir}/reads.fastq", "-o", out,
                 "-d", dtype]) == 0
    res = evaluate_files(os.path.join(sim_dir, "truth.vcf"),
                         os.path.join(out, "volcanosv_variants.vcf"),
                         EvalParams(pctsim=0.0))
    assert res.recall >= 0.75, (dtype, res.summary())
    _h, snps = read_vcf(os.path.join(out, "phased_snps.vcf"))
    # noisy reads must not flood the SNP caller (af/depth bands hold)
    assert len(snps) < 1500, len(snps)
