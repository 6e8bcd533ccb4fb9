"""Phasing: pileup SNP discovery + MEC phaser vs simulated diploid truth."""
import numpy as np
import pytest

from volcanosv_tpu.aligner import Aligner
from volcanosv_tpu.config import AlignConfig, PhasingConfig
from volcanosv_tpu.ops.pack import encode_seq
from volcanosv_tpu.phasing import phase_chromosome, pileup_chromosome
from volcanosv_tpu.sim import random_genome, simulate_reads


@pytest.fixture(scope="module")
def snp_case():
    """Diploid genome differing only by het SNPs at known positions."""
    rng = np.random.default_rng(3)
    ref = random_genome(rng, 60_000)
    seq = ref["chr1"]
    n_snp = 60
    pos = np.sort(rng.choice(np.arange(500, len(seq) - 500), n_snp,
                             replace=False))
    bases = "ACGT"
    hap1 = list(seq)
    hap2 = list(seq)
    true_hap2_alt = []
    for p in pos:
        alt = bases[(bases.index(seq[p]) + 1 + int(rng.integers(3))) % 4]
        if alt == seq[p]:
            alt = bases[(bases.index(seq[p]) + 1) % 4]
        hap2[p] = alt          # all SNPs on hap2 → single phase config
        true_hap2_alt.append(alt)
    haps = {1: {"chr1": "".join(hap1)}, 2: {"chr1": "".join(hap2)}}
    reads = simulate_reads(rng, haps, coverage=24.0, read_len=6_000,
                           read_len_sd=800, sub_rate=0.002,
                           indel_rate=0.0005)
    return ref, pos, reads


@pytest.fixture(scope="module")
def phased(snp_case):
    ref, pos, reads = snp_case
    aligner = Aligner(ref, AlignConfig.preset("map-hifi"))
    seqs = {n: s for n, s, *_ in reads}
    recs = aligner.to_bam_records(
        aligner.align(list(seqs.items())), seqs)
    cfg = PhasingConfig()
    pile = pileup_chromosome(recs, encode_seq(ref["chr1"]), cfg)
    res = phase_chromosome(pile, cfg)
    return pile, res, reads


def test_snp_discovery(snp_case, phased):
    ref, pos, reads = snp_case
    pile, res, _ = phased
    found = set(res.snp_pos.tolist())
    hit = sum(1 for p in pos if int(p) in found)
    assert hit >= 0.9 * len(pos), (hit, len(pos), len(found))
    # few spurious het calls
    spurious = len(found - set(int(p) for p in pos))
    assert spurious <= 0.2 * len(pos), spurious


def test_phase_consistency(phased):
    """All true SNPs are on hap2 → within each block every phased SNP must
    get the same sign, and read assignments must match read truth labels."""
    pile, res, reads = phased
    assert len(res.snp_pos) > 0
    for b in np.unique(res.block_id):
        sel = res.block_id == b
        signs = res.phase[sel]
        # allow at most one inconsistent SNP per block
        assert min((signs == 1).sum(), (signs == -1).sum()) <= 1

    # read haplotype assignment agrees with simulated origin within a block
    truth = {name: hap for name, _, hap, _, _ in reads}
    agree = disagree = 0
    for b in np.unique(res.read_block):
        if b < 0:
            continue
        sel = np.nonzero(res.read_block == b)[0]
        votes = {}
        for i in sel:
            if res.read_hap[i] == 0:
                continue
            t = truth[res.read_names[i]]
            votes.setdefault((res.read_hap[i], t), 0)
            votes[(res.read_hap[i], t)] = votes[(res.read_hap[i], t)] + 1
        # per block, the mapping assigned-hap → true-hap must be consistent
        m11 = votes.get((1, 1), 0) + votes.get((2, 2), 0)
        m12 = votes.get((1, 2), 0) + votes.get((2, 1), 0)
        agree += max(m11, m12)
        disagree += min(m11, m12)
    assert agree >= 10
    assert disagree <= 0.1 * (agree + disagree), (agree, disagree)


def test_mec_low(phased):
    pile, res, _ = phased
    n_obs = int((pile.obs_allele != 0).sum())
    assert res.mec <= 0.1 * max(n_obs, 1), (res.mec, n_obs)
