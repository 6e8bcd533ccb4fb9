"""Checkpoint/resume subsystem (utils/checkpoint.py + CLI --resume).

ref contract: General_Assembly_Workflow.py log.txt skip lists (:530-547),
-rdsig precomputed signature dirs (volcanosv-vc-large-indel.py:18-19)."""
import os

import pytest

from volcanosv_tpu.cli import main
from volcanosv_tpu.io.fasta import read_fasta, write_fasta
from volcanosv_tpu.utils.checkpoint import CheckpointDir
from volcanosv_tpu.vc.signatures import Signature


def test_sig_roundtrip(tmp_path):
    ck = CheckpointDir(str(tmp_path), resume=True)
    sigs = [
        Signature("chr1", "DEL", 100, 50, "read/1 x", 5, 60, "+", "cigar",
                  "60"),
        Signature("chr2", "INS", 7, 31, "r2", 0, 31, "-",
                  "split-alignment", "60-55"),
    ]
    ck.save_sigs("reads_sig_chr1.tsv", sigs)
    assert ck.has("reads_sig_chr1.tsv")
    assert ck.load_sigs("reads_sig_chr1.tsv") == sigs
    ck.save_sigs("empty.tsv", [])
    assert ck.load_sigs("empty.tsv") == []


def test_fasta_and_resume_gate(tmp_path):
    ck = CheckpointDir(str(tmp_path))           # resume off
    ck.save_fasta("asm_chr1.fa", {"PS1_1_100_hp1_0": "ACGT"})
    assert not ck.has("asm_chr1.fa")            # written but not reusable
    ck2 = CheckpointDir(str(tmp_path), resume=True)
    assert ck2.has("asm_chr1.fa")
    assert ck2.load_fasta("asm_chr1.fa") == {"PS1_1_100_hp1_0": "ACGT"}


@pytest.fixture(scope="module")
def sim_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ckpt") / "sim")
    assert main(["sim", "-o", d, "--length", "30000", "--n_del", "2",
                 "--n_ins", "2", "--coverage", "24", "--seed", "7"]) == 0
    return d


def test_asm_resume_skips_assembly(sim_dir, tmp_path):
    out = str(tmp_path / "out")
    argv = ["asm", "--ref", f"{sim_dir}/ref.fa",
            "--fastq", f"{sim_dir}/reads.fastq", "-o", out]
    assert main(argv) == 0
    ckpt_fa = os.path.join(out, "checkpoints", "asm_chr1.fa")
    assert os.path.exists(ckpt_fa)
    assert os.path.exists(os.path.join(out, "checkpoints", "snps_chr1.vcf"))
    # tamper the checkpoint: a resumed run must reuse it verbatim
    write_fasta(ckpt_fa, {"PS1_1_9_hp1_0": "ACGTACGTAC"})
    assert main(argv + ["--resume"]) == 0
    final = read_fasta(os.path.join(out, "final_contigs.fa"))
    assert final == {"PS1_1_9_hp1_0": "ACGTACGTAC"}
    # without --resume the checkpoint is recomputed, sentinel gone
    assert main(argv) == 0
    final = read_fasta(os.path.join(out, "final_contigs.fa"))
    assert "PS1_1_9_hp1_0" not in final and len(final) >= 1


def test_reads_sig_cache_reused(sim_dir, tmp_path):
    out = str(tmp_path / "vc")
    argv = ["vc-large-indel", "--ref", f"{sim_dir}/ref.fa",
            "--contig", f"{sim_dir}/true_contigs.fa",
            "--fastq", f"{sim_dir}/reads.fastq", "-o", out]
    assert main(argv) == 0
    cache = os.path.join(out, "checkpoints", "reads_sig_chr1.tsv")
    assert os.path.exists(cache)
    from volcanosv_tpu.io.vcf import read_vcf
    _h, first = read_vcf(os.path.join(out, "volcanosv_large_indel.vcf"))
    assert main(argv + ["--resume"]) == 0       # loads cached signatures
    _h, second = read_vcf(os.path.join(out, "volcanosv_large_indel.vcf"))
    assert [r.to_line() for r in first] == [r.to_line() for r in second]


def test_profile_report(sim_dir, tmp_path):
    out = str(tmp_path / "prof")
    assert main(["vc-large-indel", "--ref", f"{sim_dir}/ref.fa",
                 "--contig", f"{sim_dir}/true_contigs.fa", "-o", out,
                 "--profile"]) == 0
    import json
    with open(os.path.join(out, "stage_times.json")) as fh:
        times = json.load(fh)
    assert any(k.startswith("large-indel") for k in times)
    for v in times.values():
        assert v["total_s"] >= 0 and v["calls"] >= 1


def test_emit_fastqs(sim_dir, tmp_path):
    """--emit_fastqs writes per-hap FASTQs (write_fastq_asm_general parity)."""
    out = str(tmp_path / "fq")
    assert main(["asm", "--ref", f"{sim_dir}/ref.fa",
                 "--fastq", f"{sim_dir}/reads.fastq", "-o", out,
                 "--emit_fastqs"]) == 0
    import glob
    fqs = glob.glob(os.path.join(out, "fastq_by_hap", "*.fastq"))
    assert fqs, "no per-hap FASTQs written"
    from volcanosv_tpu.io.fastq import read_fastq
    names = {os.path.basename(f) for f in fqs}
    assert any("hp1" in n for n in names) and any("hp2" in n for n in names)
    total = sum(1 for f in fqs for _ in read_fastq(f))
    assert total > 0
