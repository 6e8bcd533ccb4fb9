"""Pair-HMM realignment of SNP observations near indels (longshot's core
trick, volcanosv-asm.py:75-80).

The failure mode the realigner exists for: a het SNP sits a few bases after
a homopolymer that carries a het 1bp deletion.  Some reads' alignments
place the deletion late (absorbed as shifted mismatch columns), so the raw
CIGAR read-off at the SNP column sees the WRONG base and spurious
mismatch columns appear at the shifted positions.  The pair-HMM re-scores
each covering read against the REF/ALT local haplotype windows with gaps
allowed, recovering the true allele and killing the shadow candidates.
"""
import dataclasses

import numpy as np
import pytest

from volcanosv_tpu.config import PhasingConfig
from volcanosv_tpu.io.bam import BamRecord
from volcanosv_tpu.ops.pack import encode_seq
from volcanosv_tpu.phasing.pileup import pileup_chromosome

_M, _I, _D = 0, 1, 2


def _mk_ref(rng):
    left = "".join(rng.choice(list("ACGT"), 60))
    # first base after the SNP pinned to C so the shifted read-off at the
    # SNP column is deterministically NOT the true alt T
    right = "C" + "".join(rng.choice(list("ACGT"), 59))
    # 7-A homopolymer, then 4 spacer bases, then the SNP base G
    return left + "AAAAAAA" + "CTGC" + "G" + right


def _reads(ref, rng, n_per_hap=20):
    """hap1: deletion of one homopolymer A + SNP G→T.  hap2: reference.
    Half of hap1's reads get a 'late deletion' alignment: M through the
    SNP with the D placed 6bp downstream — the columns in between
    (including the SNP) read off shifted bases."""
    L = len(ref)
    hp_start = 60
    snp = 60 + 7 + 4                       # 0-based SNP position
    hap1 = ref[:hp_start] + "AAAAAA" + "CTGC" + "T" + ref[snp + 1:]
    recs = []
    for i in range(n_per_hap):            # hap2 = ref reads, pure M
        recs.append(BamRecord(name=f"h2_{i}", pos=0, mapq=60, seq=ref,
                              cigar=np.array([[_M, L]], np.int64)))
    for i in range(n_per_hap):
        seq = hap1                         # one base shorter than ref
        if i % 2 == 0:                    # correct placement: D in the run
            cig = [[_M, hp_start + 3], [_D, 1], [_M, len(seq) - hp_start - 3]]
        else:                             # late placement: D after the SNP
            late = snp + 6
            cig = [[_M, late], [_D, 1], [_M, len(seq) - late]]
        recs.append(BamRecord(name=f"h1_{i}", pos=0, mapq=60, seq=seq,
                              cigar=np.array(cig, np.int64)))
    return recs, snp


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    ref = _mk_ref(rng)
    recs, snp = _reads(ref, rng)
    return ref, recs, snp


def _call(ref, recs, realign):
    cfg = dataclasses.replace(PhasingConfig.for_dtype("CLR"),
                              realign=realign, min_depth=5)
    return pileup_chromosome(recs, encode_seq(ref), cfg)


def test_raw_pileup_miscalls_near_indel(setup):
    """Without realignment the late-deletion alignments corrupt the SNP
    column: the alt count at the true site is halved and shifted shadow
    mismatch columns appear — the documented longshot failure mode."""
    ref, recs, snp = setup
    pile = _call(ref, recs, realign=False)
    at_snp = pile.alt_count[pile.snp_pos == snp]
    # the shifted read-offs spawn a dense shadow cluster around the run;
    # the dense-cluster filter (longshot -D role) then wipes the whole
    # cluster INCLUDING the true SNP — or, if anything survives, the alt
    # count at the true site is halved.  Either way the raw pileup loses
    # the SNP; only the pair-HMM pass can recover it.
    assert len(at_snp) == 0 or at_snp[0] <= 12, (pile.snp_pos, at_snp)


def test_realigned_pileup_recovers_snp(setup):
    ref, recs, snp = setup
    pile = _call(ref, recs, realign=True)
    sel = pile.snp_pos == snp
    assert sel.any(), f"true SNP missing: {pile.snp_pos}"
    # all 20 hap1 reads vote alt after realignment (het at depth 40)
    assert pile.alt_count[sel][0] >= 16, pile.alt_count[sel]
    assert pile.is_het[sel][0]
    # and the SNP is the ONLY candidate — shadow columns are killed
    assert list(pile.snp_pos) == [snp], pile.snp_pos


def test_realign_preserves_clean_sites(setup):
    """A SNP with no indel anywhere nearby must be untouched by the
    realignment path (bit-identical candidate set with realign on/off)."""
    rng = np.random.default_rng(9)
    ref = "".join(rng.choice(list("ACGT"), 160))
    snp = 80
    alt = "T" if ref[snp] != "T" else "A"
    hap1 = ref[:snp] + alt + ref[snp + 1:]
    recs = []
    for i in range(16):
        recs.append(BamRecord(name=f"a{i}", pos=0, mapq=60, seq=ref,
                              cigar=np.array([[_M, len(ref)]], np.int64)))
        recs.append(BamRecord(name=f"b{i}", pos=0, mapq=60, seq=hap1,
                              cigar=np.array([[_M, len(hap1)]], np.int64)))
    p0 = _call(ref, recs, realign=False)
    p1 = _call(ref, recs, realign=True)
    np.testing.assert_array_equal(p0.snp_pos, p1.snp_pos)
    np.testing.assert_array_equal(p0.alt_count, p1.alt_count)
    assert list(p1.snp_pos) == [snp]
