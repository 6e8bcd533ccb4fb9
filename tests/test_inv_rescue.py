"""Inversion rescue (AlignConfig.inv_rescue) + SV-aware phasing markers.

The minimap2-class blindspot: a ≲600bp inversion is chained straight
through as a dense mismatch/indel soup window, so svim-asm-style segment
typing (which only sees INVs as opposite-strand segments,
SVIM_inter.py:62-340) never gets a candidate.  The rescue re-aligns soup
windows reverse-complemented and emits winners as inverted supplementary
alignments; the phasing markers turn the same soup (and ≥30bp CIGAR
indels) into extra MEC columns so carrier reads phase correctly through
het-SNP deserts (longshot models SNVs only).
"""
import numpy as np
import pytest

from volcanosv_tpu.aligner import Aligner
from volcanosv_tpu.config import AlignConfig, PhasingConfig
from volcanosv_tpu.sim import _revcomp


def _rand(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


@pytest.fixture(scope="module")
def inv_setup():
    rng = np.random.default_rng(7)
    ref = _rand(rng, 6000)
    p, ln = 2800, 120
    inv_hap = ref[:p] + _revcomp(ref[p:p + ln]) + ref[p + ln:]
    return ref, inv_hap, p, ln


def test_rescue_emits_inverted_supplementary(inv_setup):
    ref, inv_hap, p, ln = inv_setup
    al = Aligner({"c": ref}, AlignConfig.preset("asm5"))
    alns = al.align([("q", inv_hap)])
    supp = [a for a in alns if a.is_supplementary and a.strand == -1]
    assert supp, [f"{a.pos}-{a.t_end()} s{a.strand}" for a in alns]
    s = supp[0]
    assert abs(s.pos - p) <= 30 and abs(s.t_end() - (p + ln)) <= 30
    # the rescued segment must round-trip to valid BAM (clips consistent)
    recs = al.to_bam_records(alns, {"q": inv_hap})
    for r in recs:
        qspan = sum(int(l) for op, l in r.cigar if op in (0, 1, 4))
        assert qspan == len(inv_hap)


def test_rescue_not_triggered_on_clean_alignment(inv_setup):
    ref, _hap, _p, _ln = inv_setup
    rng = np.random.default_rng(8)
    # 0.2% substitution noise — typical HiFi, far below the soup trigger
    q = list(ref)
    for i in rng.integers(0, len(q), 12):
        q[i] = "ACGT"[(("ACGT".index(q[i])) + 1) % 4]
    al = Aligner({"c": ref}, AlignConfig.preset("asm5"))
    alns = al.align([("q", "".join(q))])
    assert not any(a.strand == -1 for a in alns)


def test_rescue_reverse_parent(inv_setup):
    """A reverse-strand primary with an inversion still rescues (the new
    segment comes out forward) and coordinates stay consistent."""
    ref, inv_hap, p, ln = inv_setup
    al = Aligner({"c": ref}, AlignConfig.preset("asm5"))
    alns = al.align([("q", _revcomp(inv_hap))])
    prim = [a for a in alns if not a.is_supplementary][0]
    assert prim.strand == -1
    supp = [a for a in alns if a.is_supplementary and a.strand == 1]
    assert supp and abs(supp[0].pos - p) <= 30


def test_markers_phase_snp_desert():
    """A het 60bp DEL in a 6kb het-SNP desert: reads covering only the
    desert cannot phase by SNPs.  The DEL marker column phases the
    BRIDGING reads (marker + SNP obs) and keeps the region linked into
    the SNP's block; marker-only reads stay MEC-unassigned (longshot
    phases nothing without an SNV — single marker columns are too noisy
    to claim reads, measured on the HiFi golden) and fall through to the
    k-mer partition vote, which must separate carriers from
    non-carriers."""
    from volcanosv_tpu.io.bam import BamRecord
    from volcanosv_tpu.ops.pack import encode_seq
    from volcanosv_tpu.phasing import phase_chromosome, pileup_chromosome
    rng = np.random.default_rng(9)
    ref = _rand(rng, 9000)
    snp = 300                       # single het SNP far left
    alt = "T" if ref[snp] != "T" else "A"
    p, dl = 5000, 60
    recs = []
    M, D = 0, 2
    # hap1 = SNP + DEL; hap2 = ref.  Reads: left group covers the SNP,
    # right group covers only the DEL region.
    for i in range(8):
        seq = ref[:snp] + alt + ref[snp + 1:3000]
        recs.append(BamRecord(name=f"h1L_{i}", pos=0, mapq=60, seq=seq,
                              cigar=np.array([[M, 3000]], np.int64)))
        recs.append(BamRecord(name=f"h2L_{i}", pos=0, mapq=60,
                              seq=ref[:3000],
                              cigar=np.array([[M, 3000]], np.int64)))
        seq1 = ref[2500:p] + ref[p + dl:8500]
        recs.append(BamRecord(
            name=f"h1R_{i}", pos=2500, mapq=60, seq=seq1,
            cigar=np.array([[M, p - 2500], [D, dl],
                            [M, 8500 - p - dl]], np.int64)))
        recs.append(BamRecord(name=f"h2R_{i}", pos=2500, mapq=60,
                              seq=ref[2500:8500],
                              cigar=np.array([[M, 6000]], np.int64)))
    # one bridging read per hap so the SNP block and the marker connect
    for i in range(3):
        seq1 = ref[:snp] + alt + ref[snp + 1:p] + ref[p + dl:8500]
        recs.append(BamRecord(
            name=f"h1B_{i}", pos=0, mapq=60, seq=seq1,
            cigar=np.array([[M, p], [D, dl], [M, 8500 - p - dl]], np.int64)))
        recs.append(BamRecord(name=f"h2B_{i}", pos=0, mapq=60,
                              seq=ref[:8500],
                              cigar=np.array([[M, 8500]], np.int64)))
    cfg = PhasingConfig.for_dtype("Hifi")
    pile = pileup_chromosome(recs, encode_seq(ref), cfg)
    assert pile.marker.any(), "DEL marker column missing"
    ph = phase_chromosome(pile, cfg)
    hap_of = {n: int(ph.read_hap[i]) for i, n in enumerate(ph.read_names)}
    # bridging reads (SNP + marker obs) phase, opposite haps
    h1b = {hap_of[f"h1B_{i}"] for i in range(3)}
    h2b = {hap_of[f"h2B_{i}"] for i in range(3)}
    assert len(h1b) == 1 and len(h2b) == 1 and h1b != h2b and 0 not in h1b | h2b
    # the marker keeps the DEL region inside the SNP's block (no split)
    assert len({int(b) for b in ph.block_id}) == 1
    # marker-only reads are never WRONGLY phased: each R group is either
    # unassigned or consistently opposite the other
    h1r = {hap_of[f"h1R_{i}"] for i in range(8)}
    h2r = {hap_of[f"h2R_{i}"] for i in range(8)}
    assert h1r <= {0} | h1b and h2r <= {0} | h2b
    # and the k-mer partition vote separates the desert reads by haplotype
    from volcanosv_tpu.config import PartitionConfig
    from volcanosv_tpu.partition.partition import partition_reads
    seqs = {r.name: r.seq for r in recs}
    phased = {n: (hap_of[n], int(ph.read_block[i]))
              for i, n in enumerate(ph.read_names) if hap_of[n]}
    spans = {r.name: (r.pos, r.reference_end) for r in recs}
    unphased = {n: (seqs[n], spans[n]) for n in seqs if n not in phased}
    res = partition_reads(phased, unphased, seqs, ph.blocks(),
                          PartitionConfig())
    def groups_of(prefix, n):
        return {tuple(sorted(res.assignment.get(f"{prefix}_{i}", [])))
                for i in range(n)}
    g1 = groups_of("h1R", 8)
    g2 = groups_of("h2R", 8)
    # every desert read lands in exactly one hap group, consistently per
    # true haplotype, and the two haplotypes' groups differ
    assert len(g1) == 1 and len(g2) == 1 and g1 != g2, (g1, g2)
    (a1,), (a2,) = g1, g2
    assert len(a1) == 1 and len(a2) == 1, (a1, a2)
    # and the marker never reaches the SNP VCF
    from volcanosv_tpu.phasing.snp_vcf import snp_vcf_records
    out = snp_vcf_records("c", ph)
    assert all(r.pos - 1 != p - 1 or len(r.ref) == 1 for r in out)
    assert sum(1 for r in out if r.pos == snp + 1) == 1
