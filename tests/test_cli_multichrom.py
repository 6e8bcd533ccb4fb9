"""CLI surface: sim → run (multi-chromosome WGS) → merged VCF sanity."""
import os

import numpy as np
import pytest

from volcanosv_tpu.cli import main
from volcanosv_tpu.io.vcf import read_vcf


@pytest.fixture(scope="module")
def wgs_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("wgs")
    sim_dir, out_dir = str(d / "sim"), str(d / "out")
    assert main(["sim", "-o", sim_dir, "--length", "40000", "--chroms", "2",
                 "--n_del", "3", "--n_ins", "3", "--coverage", "26",
                 "--read_len", "6000", "--seed", "3"]) == 0
    assert main(["run", "--ref", f"{sim_dir}/ref.fa",
                 "--fastq", f"{sim_dir}/reads.fastq", "-o", out_dir]) == 0
    return sim_dir, out_dir


def test_wgs_outputs_exist(wgs_run):
    _sim, out = wgs_run
    for f in ("final_contigs.fa", "volcanosv_large_indel.vcf",
              "volcanosv_small_indel.vcf", "volcanosv_complex_sv.vcf",
              "volcanosv_variants.vcf"):
        assert os.path.exists(os.path.join(out, f)), f


def test_wgs_recall_both_chroms(wgs_run):
    sim, out = wgs_run
    _h, truth = read_vcf(os.path.join(sim, "truth.vcf"))
    _h2, calls = read_vcf(os.path.join(out, "volcanosv_variants.vcf"))
    assert {r.chrom for r in calls} == {"chr1", "chr2"}, \
        sorted({r.chrom for r in calls})
    tp = 0
    for t in truth:
        svlen = abs(int(t.info["SVLEN"]))
        for r in calls:
            if (r.chrom == t.chrom and r.svtype == t.info["SVTYPE"]
                    and abs(r.pos - t.pos) <= 500
                    and min(r.svlen, svlen) / max(r.svlen, svlen) >= 0.6):
                tp += 1
                break
    recall = tp / len(truth)
    assert recall >= 0.8, (recall, len(truth), len(calls))
    # merged VCF is coordinate-sorted per chrom
    pos = {}
    for r in calls:
        assert r.pos >= pos.get(r.chrom, 0), (r.chrom, r.pos)
        pos[r.chrom] = r.pos


def test_wgs_phased_snp_vcf(wgs_run):
    """asm/run emit the longshot-equivalent phased SNP VCF (README.md:237-238)."""
    _sim, out = wgs_run
    _h, snps = read_vcf(os.path.join(out, "phased_snps.vcf"))
    assert snps, "no SNP records emitted"
    het = [r for r in snps if r.gt in ("0|1", "1|0")]
    assert het, "no phased het SNPs"
    for r in het:
        assert r.ps is not None          # every phased site carries PS
        assert r.ref in "ACGT" and r.alt in "ACGT" and r.ref != r.alt
    # all phase-set members of a block share the same PS id per chrom
    assert {r.chrom for r in snps} <= {"chr1", "chr2"}


def test_wgs_truvari_equiv_eval(wgs_run):
    """In-repo truvari-equivalent benchmark on the full WGS run
    (README.md:493-498 protocol: r=500 P=0.5 p=0.5 O=0.01 S=30)."""
    sim, out = wgs_run
    from volcanosv_tpu.eval import evaluate_files
    res = evaluate_files(os.path.join(sim, "truth.vcf"),
                         os.path.join(out, "volcanosv_variants.vcf"))
    assert res.recall >= 0.8, res.summary()
    assert res.precision >= 0.7, res.summary()
    assert res.gt_concordance >= 0.7, res.summary()


def test_wgs_phased_bam(wgs_run):
    """asm writes phased.bam with HP/PS tags (longshot -O phased.bam parity,
    volcanosv-asm.py:75-80 / prepare_info_v1.py:42-63)."""
    _sim, out = wgs_run
    from volcanosv_tpu.io.bam import BamReader
    n_tagged = 0
    with BamReader(os.path.join(out, "phased.bam")) as br:
        assert set(br.references) == {"chr1", "chr2"}
        for rec in br:
            if "HP" in rec.tags:
                assert rec.tags["HP"] in (1, 2)
                assert isinstance(rec.tags["PS"], int)
                n_tagged += 1
    assert n_tagged > 0


def test_single_chrom_and_bed_modes(wgs_run, tmp_path):
    """--chrom / --bed restricted vc runs (the reference's single-chromosome
    mode, volcanosv-vc-large-indel.py:280, and sig_extract -include_bed,
    filter_GT_correction.py:67-82): restricted output == the chr2 subset of
    the unrestricted run."""
    sim, out = wgs_run
    _h, full = read_vcf(os.path.join(out, "volcanosv_large_indel.vcf"))
    want = [r for r in full if r.chrom == "chr2"]

    d1 = str(tmp_path / "one")
    assert main(["vc-large-indel", "--ref", f"{sim}/ref.fa",
                 "--contig", f"{out}/final_contigs.fa",
                 "--fastq", f"{sim}/reads.fastq",
                 "--chrom", "chr2", "-o", d1]) == 0
    _h, got = read_vcf(os.path.join(d1, "volcanosv_large_indel.vcf"))
    assert {r.chrom for r in got} <= {"chr2"}
    assert [(r.pos, r.svtype, r.svlen) for r in got] == \
        [(r.pos, r.svtype, r.svlen) for r in want]

    bed = tmp_path / "only_chr2.bed"
    bed.write_text("chr2\t0\t40000\n")
    d2 = str(tmp_path / "bed")
    assert main(["vc-large-indel", "--ref", f"{sim}/ref.fa",
                 "--contig", f"{out}/final_contigs.fa",
                 "--fastq", f"{sim}/reads.fastq",
                 "--bed", str(bed), "-o", d2]) == 0
    _h, got2 = read_vcf(os.path.join(d2, "volcanosv_large_indel.vcf"))
    assert {r.chrom for r in got2} <= {"chr2"}
    assert [(r.pos, r.svtype, r.svlen) for r in got2] == \
        [(r.pos, r.svtype, r.svlen) for r in want]
