"""End-to-end large-indel calling on simulated diploid truth.

Mirrors the reference's golden-data contract (chr10 + truvari, SURVEY.md §4)
with self-contained simulated ground truth: implant DEL/INS into two
haplotypes, cut phase-block contigs (the '-otherasm' entry), align with the
native aligner, call, and score recall/precision/GT against the truth.
"""
import numpy as np
import pytest

from volcanosv_tpu.aligner import Aligner
from volcanosv_tpu.config import AlignConfig, PipelineConfig
from volcanosv_tpu.sim import (contigs_from_haplotypes, implant_svs,
                               random_genome)
from volcanosv_tpu.vc.large_indel import call_chromosome


def truvari_score(truth, records, max_dist=500, min_size_sim=0.7):
    """(recall, precision, gt_correct_frac) with truvari-style matching."""
    used = [False] * len(records)
    tp = 0
    gt_ok = 0
    for ev in truth:
        best = None
        for i, r in enumerate(records):
            if used[i] or r.svtype != ev.svtype:
                continue
            if abs(r.pos - ev.pos) > max_dist:
                continue
            ssim = min(r.svlen, ev.svlen) / max(r.svlen, ev.svlen)
            if ssim < min_size_sim:
                continue
            if best is None or abs(r.pos - ev.pos) < abs(records[best].pos - ev.pos):
                best = i
        if best is not None:
            used[best] = True
            tp += 1
            r = records[best]
            want_hom = ev.gt == (1, 1)
            got_hom = r.gt in ("1/1", "1|1")
            if want_hom == got_hom:
                gt_ok += 1
    recall = tp / max(len(truth), 1)
    precision = tp / max(len(records), 1)
    return recall, precision, gt_ok / max(tp, 1)


@pytest.fixture(scope="module")
def sim_case():
    rng = np.random.default_rng(7)
    ref = random_genome(rng, 300_000)
    hap1, hap2, truth = implant_svs(
        rng, ref, n_del=6, n_ins=6, min_len=50, max_len=400, min_gap=4_000)
    contigs = contigs_from_haplotypes(hap1, hap2, block_size=100_000,
                                      overlap=10_000)
    return ref, contigs, truth


@pytest.fixture(scope="module")
def contig_bam(sim_case):
    ref, contigs, truth = sim_case
    aligner = Aligner(ref, AlignConfig.preset("asm5"))
    alns = aligner.align(list(contigs.items()))
    recs = aligner.to_bam_records(alns, contigs)
    return [r for r in recs if r.ref_id == 0]


def test_contig_alignment_covers_reference(sim_case, contig_bam):
    ref, contigs, _ = sim_case
    # every contig should produce at least one alignment
    aligned = {r.name for r in contig_bam}
    assert len(aligned) >= 0.9 * len(contigs)


def test_large_indel_calls_match_truth(sim_case, contig_bam):
    ref, contigs, truth = sim_case
    cfg = PipelineConfig.for_dtype("Hifi")
    records = call_chromosome("chr1", contig_bam, ref["chr1"], contigs, cfg)
    recall, precision, gt_frac = truvari_score(truth, records)
    assert recall >= 0.9, (recall, precision, len(records))
    assert precision >= 0.85, (recall, precision, len(records))
    assert gt_frac >= 0.8, gt_frac


def test_phased_output(sim_case, contig_bam):
    ref, contigs, truth = sim_case
    cfg = PipelineConfig.for_dtype("Hifi")
    records = call_chromosome("chr1", contig_bam, ref["chr1"], contigs, cfg)
    for r in records:
        assert r.gt in ("1|0", "0|1", "1|1")
        assert "PS" in r.info
        assert "TIG_REGION" in r.info
