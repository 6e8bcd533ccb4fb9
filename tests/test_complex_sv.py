"""Complex-SV path: INV / DUP / TRA detection from haplotype contigs.

Reference contract: volcanosv-vc-complex-sv.py (svim-asm diploid +
align_ins2ref DUP recovery + filter_tra + filter_inv)."""
import numpy as np
import pytest

from volcanosv_tpu.aligner import Aligner
from volcanosv_tpu.config import AlignConfig, PipelineConfig
from volcanosv_tpu.sim import (contigs_from_haplotypes, implant_snps,
                               implant_svs, random_genome, simulate_reads)
from volcanosv_tpu.vc.complex_sv import call_complex_svs, segment_candidates


@pytest.fixture(scope="module")
def inv_case():
    rng = np.random.default_rng(11)
    ref = random_genome(rng, 80_000)
    hap1, hap2, truth = implant_svs(
        rng, ref, n_del=0, n_ins=0, n_inv=4, n_dup=3,
        min_len=300, max_len=1_200, min_gap=4_000)
    contigs = contigs_from_haplotypes(hap1, hap2, block_size=40_000)
    reads = simulate_reads(
        rng, {1: hap1, 2: hap2}, coverage=16.0, read_len=9_000,
        read_len_sd=1_000, sub_rate=0.001, indel_rate=0.0003)
    return ref, truth, contigs, reads


def test_inv_dup_end_to_end(inv_case):
    ref, truth, contigs, reads = inv_case
    cfg = PipelineConfig.for_dtype("Hifi")

    aligner = Aligner(ref, AlignConfig.preset("asm10"))
    contig_recs = aligner.to_bam_records(
        aligner.align(list(contigs.items())), contigs)

    read_seqs = {n: s for n, s, *_ in reads}
    ra = Aligner(ref, AlignConfig.preset("map-hifi"))
    read_recs = ra.to_bam_records(ra.align(list(read_seqs.items())),
                                  read_seqs)

    # large-indel INS calls feed DUP recovery (driver :131-138)
    from volcanosv_tpu.vc.large_indel import call_chromosome
    ins_records = [r for r in call_chromosome(
        "chr1", contig_recs, ref["chr1"], contigs, cfg)
        if r.svtype == "INS"]

    records = call_complex_svs(
        {"chr1": contig_recs}, ref, cfg, ins_records=ins_records,
        reads_by_chrom={"chr1": read_recs})

    invs = [r for r in records if r.svtype == "INV"]
    dups = [r for r in records if r.svtype == "DUP"]
    inv_truth = [t for t in truth if t.svtype == "INV"]
    dup_truth = [t for t in truth if t.svtype == "DUP"]

    def match(calls, ev, tol=150):
        return any(abs((r.pos - 1) - ev.pos) <= tol
                   and min(r.svlen, ev.svlen) / max(r.svlen, ev.svlen) >= 0.6
                   for r in calls)

    inv_recall = sum(match(invs, t) for t in inv_truth) / len(inv_truth)
    dup_recall = sum(match(dups, t, tol=900) for t in dup_truth) / len(dup_truth)
    assert inv_recall >= 0.75, (inv_recall, [(r.pos, r.svlen) for r in invs],
                                [(t.pos, t.svlen) for t in inv_truth])
    assert dup_recall >= 0.6, (dup_recall, [(r.pos, r.svlen) for r in dups],
                               [(t.pos, t.svlen) for t in dup_truth])
    # no spurious flood
    assert len(invs) <= len(inv_truth) + 2
    # phased GTs
    for r in invs + dups:
        assert r.gt in ("1|0", "0|1", "1|1"), r


def test_bnd_from_cross_chrom_contig():
    """A contig spliced from two chromosomes must yield a clustered BND."""
    rng = np.random.default_rng(5)
    ref = random_genome(rng, 40_000, n_chroms=2)
    a, b = 20_000, 21_000
    fusion = ref["chr1"][:a] + ref["chr2"][b:]
    contigs = {"PS1_1_40000_hp1_0": fusion,
               "PS1_1_40000_hp2_0": fusion}   # hom translocation
    cfg = PipelineConfig.for_dtype("Hifi")
    aligner = Aligner(ref, AlignConfig.preset("asm10"))
    alns = aligner.align(list(contigs.items()))
    recs = aligner.to_bam_records(alns, contigs)
    by_chrom = {"chr1": [], "chr2": []}
    for r in recs:
        by_chrom[aligner.names[r.ref_id]].append(r)
    records = call_complex_svs(by_chrom, ref, cfg)
    bnds = [r for r in records if r.svtype == "BND"]
    # one breakend = TWO reciprocal records linked by MATEID (VCF BND
    # semantics / svim-asm output contract)
    assert len(bnds) == 2, [(r.chrom, r.pos, r.alt, r.gt) for r in bnds]
    by_id = {r.id: r for r in bnds}
    for r in bnds:
        assert r.gt == "1|1"
        assert "[" in r.alt or "]" in r.alt
        mate = by_id[r.info["MATEID"]]
        assert mate.info["MATEID"] == r.id          # reciprocal link
        assert mate.chrom == r.info["CHR2"]
        assert mate.pos == r.info["END"]
    primary = [r for r in bnds if r.chrom == "chr1"][0]
    assert abs(primary.pos - a) <= 100, primary.pos
    assert primary.info["CHR2"] == "chr2"


def test_inv_candidates_need_reverse_segment(inv_case):
    """The aligner must emit minority-strand supplementary segments over
    implanted inversions (regression for anchor-coverage selection)."""
    ref, truth, contigs, reads = inv_case
    cfg = PipelineConfig.for_dtype("Hifi")
    aligner = Aligner(ref, AlignConfig.preset("asm10"))
    recs = aligner.to_bam_records(aligner.align(list(contigs.items())),
                                  contigs)
    cands = (segment_candidates({"chr1": recs}, 1, cfg.complex_sv)
             + segment_candidates({"chr1": recs}, 2, cfg.complex_sv))
    assert any(c.svtype == "INV" for c in cands)


def test_interspersed_dup_from_junction_pair():
    """A distant-origin copy spliced into a contig (DUP:INT) must be called
    as a DUP whose POS/END give the genomic source span, via the
    out-and-back junction pair (SVIM_inter.py:293-321); the same-chromosome
    over-max_sv_size jumps must also emit BND candidates."""
    import dataclasses

    rng = np.random.default_rng(7)
    ref = random_genome(rng, 60_000)
    src, src_len, dest = 40_000, 3_000, 10_000
    copy = ref["chr1"][src:src + src_len]
    hap = ref["chr1"][:dest] + copy + ref["chr1"][dest:30_000]
    contigs = {"PS1_1_60000_hp1_0": hap, "PS1_1_60000_hp2_0": hap}
    cfg = PipelineConfig.for_dtype("Hifi")
    # shrink max_sv_size so the 30kb jumps classify as translocation-scale
    cfg = dataclasses.replace(
        cfg, complex_sv=dataclasses.replace(cfg.complex_sv,
                                            max_sv_size=5_000))
    aligner = Aligner(ref, AlignConfig.preset("asm10"))
    recs = aligner.to_bam_records(aligner.align(list(contigs.items())),
                                  contigs)
    cands = segment_candidates({"chr1": recs}, 1, cfg.complex_sv)
    dup_cands = [c for c in cands if c.svtype == "DUP"]
    assert any(abs(c.pos - src) <= 50
               and abs(c.svlen - src_len) <= 100 for c in dup_cands), \
        [(c.svtype, c.pos, c.end, c.svlen) for c in cands]
    # the junctions themselves surface as same-chrom breakends
    assert sum(1 for c in cands if c.svtype == "BND"
               and c.chrom2 == "chr1") >= 2
    records = call_complex_svs({"chr1": recs}, ref, cfg)
    dups = [r for r in records if r.svtype == "DUP"]
    assert any(abs((r.pos - 1) - src) <= 50 and r.gt == "1|1"
               for r in dups), [(r.pos, r.svlen, r.gt) for r in dups]


def test_pairing_different_nearby_svs_stay_het():
    """svim-asm pairing parity (SVIM_COMBINE.py:16-140): hp1 and hp2
    carrying DIFFERENT nearby INVs/DUPs must genotype as two hets, not
    merge into one 1|1; identical ones pair to 1|1."""
    from volcanosv_tpu.vc.complex_sv import (Candidate, call_inversions,
                                             pair_candidates_by_sequence)
    rng = np.random.default_rng(9)
    ref = random_genome(rng, 30_000)
    cfg = PipelineConfig.for_dtype("Hifi").complex_sv

    # identical INV on both haps → one cluster → 1|1
    same = [Candidate("INV", "chr1", 10_000, 11_000, 1_000, 1, "hp1ctg"),
            Candidate("INV", "chr1", 10_000, 11_000, 1_000, 2, "hp2ctg")]
    recs = call_inversions(same, cfg, None, ref)
    assert len(recs) == 1 and recs[0].gt == "1|1", \
        [(r.pos, r.gt) for r in recs]

    # different INVs near each other (same 1000bp partition, ends far
    # apart) → two het records
    diff = [Candidate("INV", "chr1", 10_000, 10_700, 700, 1, "hp1ctg"),
            Candidate("INV", "chr1", 10_400, 13_000, 2_600, 2, "hp2ctg")]
    recs = call_inversions(diff, cfg, None, ref)
    gts = sorted(r.gt for r in recs)
    assert gts == ["0|1", "1|0"], [(r.pos, r.gt) for r in recs]

    # DUPs: same span pairs, different extents don't
    same_d = [Candidate("DUP", "chr1", 5_000, 6_000, 1_000, 1, "a"),
              Candidate("DUP", "chr1", 5_000, 6_000, 1_000, 2, "b")]
    cl = pair_candidates_by_sequence(same_d, ref, cfg)
    assert len(cl) == 1 and {c.hap for c in cl[0]} == {1, 2}
    diff_d = [Candidate("DUP", "chr1", 5_000, 6_000, 1_000, 1, "a"),
              Candidate("DUP", "chr1", 5_100, 5_400, 300, 2, "b")]
    cl = pair_candidates_by_sequence(diff_d, ref, cfg)
    assert len(cl) == 2, [(c.pos, c.hap) for part in cl for c in part]


def test_pairing_same_hap_never_pairs():
    """Same-haplotype candidates have infinite pairing distance
    (compute_distance, SVIM_COMBINE.py:40-41)."""
    from volcanosv_tpu.vc.complex_sv import (Candidate,
                                             pair_candidates_by_sequence)
    rng = np.random.default_rng(10)
    ref = random_genome(rng, 20_000)
    cfg = PipelineConfig.for_dtype("Hifi").complex_sv
    cands = [Candidate("INV", "chr1", 8_000, 9_000, 1_000, 1, "c1"),
             Candidate("INV", "chr1", 8_500, 9_600, 1_100, 1, "c2")]
    cl = pair_candidates_by_sequence(cands, ref, cfg)
    assert len(cl) == 2


def test_pairing_threshold_is_svim_parity():
    """svim-asm cuts complete linkage at edit distance 10
    (pair_haplotypes default, SVIM_COMBINE.py:120).  Two INVs whose
    breakpoints differ by ~50bp reconstruct haplotypes ~100 edits apart —
    similar but different alleles that MUST stay two clusters (two hets) at
    the pairing stage; only near-identical pairs may merge to one 1|1
    cluster.  (The downstream filter_inv 500bp merge is a separate,
    reference-faithful step tested elsewhere.)"""
    from volcanosv_tpu.vc.complex_sv import (Candidate,
                                             pair_candidates_by_sequence)
    rng = np.random.default_rng(11)
    ref = random_genome(rng, 30_000)
    cfg = PipelineConfig.for_dtype("Hifi").complex_sv
    assert cfg.pair_max_edit_distance == 10

    slack = [Candidate("INV", "chr1", 10_000, 11_000, 1_000, 1, "hp1ctg"),
             Candidate("INV", "chr1", 10_050, 11_050, 1_000, 2, "hp2ctg")]
    cl = pair_candidates_by_sequence(slack, ref, cfg)
    assert len(cl) == 2, [(c.pos, c.hap) for part in cl for c in part]

    # tiny jitter (1bp ≈ 4 edits, within the 10-edit cut) still pairs
    jitter = [Candidate("INV", "chr1", 10_000, 11_000, 1_000, 1, "hp1ctg"),
              Candidate("INV", "chr1", 10_001, 11_001, 1_000, 2, "hp2ctg")]
    cl = pair_candidates_by_sequence(jitter, ref, cfg)
    assert len(cl) == 1 and {c.hap for c in cl[0]} == {1, 2}
