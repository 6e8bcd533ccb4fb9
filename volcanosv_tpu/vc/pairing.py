"""hp1 × hp2 signature pairing → genotyped calls.

ref: pair_sig (extract_contig_signature_Hifi.py:548-603): for each hp1
signature scan hp2 in position order (window bounded by max_compare_dist);
first unpaired hp2 signature of the same type matching within shift ≤ 200 &
size-sim ≥ 0.5 (+ reciprocal overlap ≥ 0.5 for DEL) pairs → GT 1/1 keeping
the longer signature; unpaired signatures → GT 0/1.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import SignatureConfig
from .signatures import Signature, _sig_match


@dataclass(slots=True)
class PairedCall:
    sig: Signature            # representative (longer of the pair)
    gt: str                   # '1/1' | '0/1'
    tig_region: str           # 'name:start-end[,name2:start-end]'
    strand: str               # joined QUERY_STRAND
    source: str               # joined SIG_SOURCE
    mapq: str                 # joined TIG_MAPQ
    hp: int = 0               # 1/2 for het calls: which haplotype carries it

    @property
    def pos(self) -> int:
        return self.sig.pos

    @property
    def svlen(self) -> int:
        return self.sig.svlen

    @property
    def svtype(self) -> str:
        return self.sig.svtype


def _tig_region(s: Signature) -> str:
    return f"{s.qname}:{s.q_start}-{s.q_end}"


def pair_haplotype_sigs(
    sig_hp1: list[Signature], sig_hp2: list[Signature],
    cfg: SignatureConfig, max_compare_dist: int = 1000,
) -> list[PairedCall]:
    sig_hp1 = sorted(sig_hp1, key=lambda s: s.pos)
    sig_hp2 = sorted(sig_hp2, key=lambda s: s.pos)
    pos2 = np.array([s.pos for s in sig_hp2], dtype=np.int64)
    paired2 = np.zeros(len(sig_hp2), bool)
    match2 = np.full(len(sig_hp1), -1, np.int64)
    for i, s1 in enumerate(sig_hp1):
        lo = int(np.searchsorted(pos2, s1.pos - cfg.pair_max_shift, "left"))
        hi = int(np.searchsorted(pos2, s1.pos + max_compare_dist, "right"))
        for j in range(lo, hi):
            if paired2[j]:
                continue
            s2 = sig_hp2[j]
            if s2.svtype != s1.svtype:
                continue
            if _sig_match(s1, s2, cfg.pair_max_shift, cfg.pair_min_size_sim,
                          cfg.min_overlap):
                match2[i] = j
                paired2[j] = True
                break

    out: list[PairedCall] = []
    for i, s1 in enumerate(sig_hp1):
        if match2[i] == -1:
            out.append(PairedCall(s1, "0/1", _tig_region(s1), s1.strand,
                                  s1.source, s1.mapq, hp=1))
        else:
            s2 = sig_hp2[int(match2[i])]
            region = f"{_tig_region(s1)},{_tig_region(s2)}"
            rep = s1 if s1.svlen > s2.svlen else s2
            out.append(PairedCall(
                rep, "1/1", region, f"{s1.strand},{s2.strand}",
                f"{s1.source},{s2.source}", f"{s1.mapq},{s2.mapq}"))
    for j, s2 in enumerate(sig_hp2):
        if not paired2[j]:
            out.append(PairedCall(s2, "0/1", _tig_region(s2), s2.strand,
                                  s2.source, s2.mapq, hp=2))
    out.sort(key=lambda c: c.sig.pos)
    return out
