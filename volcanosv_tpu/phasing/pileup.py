"""SNP-candidate pileup over read alignments.

Replaces the variant-calling half of longshot (volcanosv-asm.py:75-80): a
vectorized mismatch pileup instead of pair-HMM realignment — mismatch
observations are collected per alignment in O(aligned bases) numpy, then
candidates are selected by a per-dtype genotype-likelihood model
(PhasingConfig.error_rate: binomial hom-ref / het / hom-alt likelihoods,
SNP qual = -10·log10 P(hom-ref | data) gated at min_snp_qual — longshot's
role at CLR/ONT error rates, where a plain allele-fraction band would
drown in noise).  Bases below min_base_qual are excluded when base
qualities are present.  With error_rate=None the legacy allele-fraction
band applies (the assembler's consensus pileup uses that mode).  The
per-read allele observations feed the MEC phaser (phase.py) whose
iterations run on device.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import PhasingConfig
from ..io.bam import BamRecord
from ..ops.pack import encode_seq

_M, _I, _D, _S, _H, _EQ, _X = 0, 1, 2, 4, 5, 7, 8


def _aligned_pairs(rec: BamRecord):
    """(ref_idx, read_idx) int64 arrays for all M/=/X columns (vectorized)."""
    cigar = np.asarray(rec.cigar)
    ops = cigar[:, 0]
    lens = cigar[:, 1].astype(np.int64)
    cr = np.isin(ops, (_M, _D, _EQ, _X)) * lens
    cq = np.isin(ops, (_M, _I, _S, _EQ, _X)) * lens
    ref0 = rec.pos + np.concatenate([[0], np.cumsum(cr)[:-1]])
    q0 = np.concatenate([[0], np.cumsum(cq)[:-1]])
    m = np.isin(ops, (_M, _EQ, _X)) & (lens > 0)
    if not m.any():
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ls = lens[m]
    total = int(ls.sum())
    base = np.repeat(np.cumsum(ls) - ls, ls)
    offs = np.arange(total) - base
    ref_idx = np.repeat(ref0[m], ls) + offs
    read_idx = np.repeat(q0[m], ls) + offs
    return ref_idx, read_idx


@dataclass
class PileupResult:
    snp_pos: np.ndarray        # (S,) 0-based candidate positions, sorted
    ref_base: np.ndarray       # (S,) int8 codes
    alt_base: np.ndarray       # (S,) int8 codes
    ref_count: np.ndarray      # (S,) int32
    alt_count: np.ndarray      # (S,) int32
    depth: np.ndarray          # (S,) int32 coverage
    is_het: np.ndarray         # (S,) bool (af band) — only het sites phase
    # sparse read × SNP observations
    obs_read: np.ndarray       # (O,) int32 read index
    obs_snp: np.ndarray        # (O,) int32 snp index
    obs_allele: np.ndarray     # (O,) int8 +1=ref, -1=alt, 0=other
    read_names: list[str]


def pileup_chromosome(records: list[BamRecord], ref_codes: np.ndarray,
                      cfg: PhasingConfig) -> PileupResult:
    """Candidate SNPs + read observation lists for one chromosome."""
    L = len(ref_codes)
    cov = np.zeros(L + 1, np.int32)
    mm_pos: list[np.ndarray] = []
    mm_base: list[np.ndarray] = []
    pairs = []            # cached (ref_idx, read_idx, codes) per usable read
    names: list[str] = []
    for rec in records:
        if rec.is_unmapped or rec.is_secondary or rec.mapq < cfg.min_mapq \
                or not rec.seq:
            continue
        ref_idx, read_idx = _aligned_pairs(rec)
        if len(ref_idx) == 0:
            continue
        ok = (ref_idx >= 0) & (ref_idx < L)
        ref_idx, read_idx = ref_idx[ok], read_idx[ok]
        codes = encode_seq(rec.seq)
        rb = codes[read_idx]
        if rec.qual is not None and len(rec.qual) == len(rec.seq):
            # mask low-quality bases (longshot --min_base_qual role)
            q = np.asarray(rec.qual)[read_idx]
            rb = np.where(q >= cfg.min_base_qual, rb, np.int8(5))
        pairs.append((ref_idx, rb, len(names)))
        names.append(rec.name)
        cov[rec.pos] += 1
        cov[min(rec.reference_end, L)] -= 1
        mism = (rb != ref_codes[ref_idx]) & (rb < 4) & (ref_codes[ref_idx] < 4)
        mm_pos.append(ref_idx[mism])
        mm_base.append(rb[mism])
    coverage = np.cumsum(cov[:-1])
    if not mm_pos or not sum(len(m) for m in mm_pos):
        # no mismatch observations at all (e.g. reads matching a polished
        # draft exactly) — empty candidate set
        z8, z32, z64 = np.zeros(0, np.int8), np.zeros(0, np.int32), np.zeros(0, np.int64)
        return PileupResult(z64, z8, z8, z32, z32, z32,
                            np.zeros(0, bool), z32, z32, z8, names)

    ap = np.concatenate(mm_pos)
    ab = np.concatenate(mm_base).astype(np.int64)
    key = ap * 4 + ab
    uk, counts = np.unique(key, return_counts=True)
    upos, ubase = uk // 4, (uk % 4).astype(np.int8)
    # best alt per position
    order = np.lexsort((-counts, upos))
    upos_o, ubase_o, cnt_o = upos[order], ubase[order], counts[order]
    first = np.concatenate([[True], upos_o[1:] != upos_o[:-1]])
    cand_pos = upos_o[first]
    cand_alt = ubase_o[first]
    cand_cnt = cnt_o[first].astype(np.int32)

    depth = coverage[cand_pos]
    af = cand_cnt / np.maximum(depth, 1)
    keep = (depth >= cfg.min_depth) & (depth <= cfg.max_depth) & \
           (af >= cfg.min_allele_frac)
    cand_pos, cand_alt, cand_cnt = cand_pos[keep], cand_alt[keep], cand_cnt[keep]
    depth, af = depth[keep], af[keep]
    if cfg.error_rate is not None and len(cand_pos):
        # genotype likelihoods (binomial, flat prior): hom-ref sees the alt
        # only via error (e/3 to a specific base), het at ~0.5, hom-alt
        # symmetric; qual = -10·log10 P(hom-ref | data) ≥ min_snp_qual
        e3 = max(cfg.error_rate / 3, 1e-6)
        n = depth.astype(np.float64)
        k = cand_cnt.astype(np.float64)
        ll_rr = k * np.log(e3) + (n - k) * np.log1p(-e3)
        ll_aa = (n - k) * np.log(e3) + k * np.log1p(-e3)
        ll_ra = n * np.log(0.5)
        mx = np.maximum(np.maximum(ll_rr, ll_aa), ll_ra)
        p_rr = np.exp(ll_rr - mx)
        tot = p_rr + np.exp(ll_aa - mx) + np.exp(ll_ra - mx)
        qual = -10.0 * np.log10(np.maximum(p_rr / tot, 1e-300))
        keep2 = qual >= cfg.min_snp_qual
        is_het = (ll_ra >= ll_aa)[keep2]
        cand_pos, cand_alt = cand_pos[keep2], cand_alt[keep2]
        cand_cnt, depth = cand_cnt[keep2], depth[keep2]
    else:
        is_het = af <= cfg.max_allele_frac
    if len(cand_pos) == 0:
        z8, z32 = np.zeros(0, np.int8), np.zeros(0, np.int32)
        return PileupResult(cand_pos.astype(np.int64), z8, z8, z32, z32,
                            z32, np.zeros(0, bool), z32, z32, z8, names)

    # observations at candidate sites
    obs_read, obs_snp, obs_allele = [], [], []
    rbase = ref_codes[cand_pos]
    for ref_idx, rb, ridx in pairs:
        j = np.searchsorted(cand_pos, ref_idx)
        j = np.clip(j, 0, len(cand_pos) - 1)
        hit = cand_pos[j] == ref_idx
        if not hit.any():
            continue
        js = j[hit]
        bases = rb[hit]
        allele = np.where(bases == rbase[js], np.int8(1),
                          np.where(bases == cand_alt[js], np.int8(-1),
                                   np.int8(0)))
        obs_read.append(np.full(len(js), ridx, np.int32))
        obs_snp.append(js.astype(np.int32))
        obs_allele.append(allele)

    ref_cnt = (depth - cand_cnt).astype(np.int32)
    cat = (lambda xs, d: np.concatenate(xs) if xs else np.zeros(0, d))
    return PileupResult(
        snp_pos=cand_pos.astype(np.int64), ref_base=rbase.astype(np.int8),
        alt_base=cand_alt, ref_count=ref_cnt, alt_count=cand_cnt,
        depth=depth.astype(np.int32), is_het=is_het,
        obs_read=cat(obs_read, np.int32), obs_snp=cat(obs_snp, np.int32),
        obs_allele=cat(obs_allele, np.int8), read_names=names)
