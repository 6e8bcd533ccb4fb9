"""Diploid genome / SV / read simulator — the golden-test harness.

The reference validates against zenodo chr10 BAMs + GIAB truth via truvari
(README.md:493-498); with no external data available, we synthesize ground
truth: a random reference, two haplotypes with implanted SVs (genotyped),
error-bearing long reads per haplotype, and phase-block-style contigs.
Integration tests assert recall/precision of the pipeline against the
implanted truth — the same contract, self-contained.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BASES = np.array(list("ACGT"))


@dataclass
class TrueSV:
    chrom: str
    pos: int          # 0-based ref position (breakpoint, base before event)
    svtype: str       # DEL / INS / INV / DUP / BND
    svlen: int
    gt: tuple[int, int]   # (hap1, hap2) presence
    seq: str = ""     # inserted sequence for INS
    chrom2: str = ""  # BND mate chromosome
    pos2: int = 0     # BND mate position (0-based)


def random_genome(rng: np.random.Generator, length: int,
                  n_chroms: int = 1) -> dict[str, str]:
    out = {}
    for i in range(n_chroms):
        out[f"chr{i + 1}"] = "".join(rng.choice(BASES, length))
    return out


def implant_svs(
    rng: np.random.Generator,
    ref: dict[str, str],
    n_del: int = 5,
    n_ins: int = 5,
    n_inv: int = 0,
    n_dup: int = 0,
    min_len: int = 50,
    max_len: int = 500,
    min_gap: int = 2_000,
    hom_frac: float = 0.4,
) -> tuple[dict[str, str], dict[str, str], list[TrueSV]]:
    """Returns (hap1_seqs, hap2_seqs, truth). SVs are placed non-overlapping
    with >= min_gap spacing; het SVs are assigned to a random haplotype."""
    hap1, hap2, truth = {}, {}, []
    for chrom, seq in ref.items():
        L = len(seq)
        n_sv = n_del + n_ins + n_inv + n_dup
        # choose positions with spacing
        positions = []
        tries = 0
        while len(positions) < n_sv and tries < 10_000:
            tries += 1
            p = int(rng.integers(min_gap, L - min_gap - max_len))
            if all(abs(p - q) >= min_gap + max_len for q in positions):
                positions.append(p)
        positions.sort()
        types = (["DEL"] * n_del + ["INS"] * n_ins + ["INV"] * n_inv
                 + ["DUP"] * n_dup)
        rng.shuffle(types)
        events = []
        for p, ty in zip(positions, types):
            ln = int(rng.integers(min_len, max_len + 1))
            if rng.random() < hom_frac:
                gt = (1, 1)
            else:
                gt = (1, 0) if rng.random() < 0.5 else (0, 1)
            ins_seq = "".join(rng.choice(BASES, ln)) if ty == "INS" else ""
            events.append(TrueSV(chrom, p, ty, ln, gt, ins_seq))
        truth.extend(events)

        for hap_idx, store in ((0, hap1), (1, hap2)):
            parts = []
            cur = 0
            for ev in events:
                if not ev.gt[hap_idx]:
                    continue
                parts.append(seq[cur : ev.pos + 1])
                if ev.svtype == "DEL":
                    cur = ev.pos + 1 + ev.svlen
                elif ev.svtype == "INS":
                    parts.append(ev.seq)
                    cur = ev.pos + 1
                elif ev.svtype == "INV":
                    seg = seq[ev.pos + 1 : ev.pos + 1 + ev.svlen]
                    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
                    parts.append("".join(comp[c] for c in reversed(seg)))
                    cur = ev.pos + 1 + ev.svlen
                elif ev.svtype == "DUP":
                    seg = seq[ev.pos + 1 : ev.pos + 1 + ev.svlen]
                    parts.append(seg + seg)
                    cur = ev.pos + 1 + ev.svlen
            parts.append(seq[cur:])
            store[chrom] = "".join(parts)
    return hap1, hap2, truth


def _hap_offset(truth: list[TrueSV], chrom: str, pos: int, hap: int) -> int:
    """Length delta of haplotype `hap` vs the reference left of `pos`."""
    off = 0
    for e in truth:
        if e.chrom != chrom or e.pos >= pos or not e.gt[hap]:
            continue
        if e.svtype == "DEL":
            off -= e.svlen
        elif e.svtype in ("INS", "DUP"):
            off += e.svlen
    return off


def _sv_free_pos(truth: list[TrueSV], chrom: str, length: int,
                 margin: int) -> int:
    """A mid-chromosome position ≥ margin away from every implanted SV."""
    events = sorted(e.pos for e in truth if e.chrom == chrom)
    for p in range(length // 2, length - margin, 997):
        if all(abs(p - q) >= margin for q in events):
            return p
    return length // 2


def implant_tra(
    rng: np.random.Generator,
    ref: dict[str, str],
    hap1: dict[str, str],
    hap2: dict[str, str],
    truth: list[TrueSV] | None = None,
    chrom_a: str = "chr1",
    chrom_b: str = "chr2",
    pos_a: int | None = None,
    pos_b: int | None = None,
) -> list[TrueSV]:
    """Implant a homozygous reciprocal cross-chromosome translocation by
    swapping the chromosome tails of both haplotypes at (pos_a, pos_b) —
    mid-chromosome by default, in an SV-free window, with the tail-swap
    coordinates shifted per haplotype by the length deltas of the SVs
    implant_svs already placed (so the junction sits at EXACTLY
    (pos_a, pos_b) in reference coordinates on both haplotypes).

    Returns the four truth breakend rows (two junctions × two mates, VCF
    BND semantics)."""
    truth = truth or []
    margin = 4_000
    pa = pos_a if pos_a is not None else _sv_free_pos(
        truth, chrom_a, len(ref[chrom_a]), margin)
    pb = pos_b if pos_b is not None else _sv_free_pos(
        truth, chrom_b, len(ref[chrom_b]), margin)
    for hap_idx, hap in ((0, hap1), (1, hap2)):
        pa_h = pa + _hap_offset(truth, chrom_a, pa, hap_idx)
        pb_h = pb + _hap_offset(truth, chrom_b, pb, hap_idx)
        a, b = hap[chrom_a], hap[chrom_b]
        hap[chrom_a] = a[:pa_h] + b[pb_h:]
        hap[chrom_b] = b[:pb_h] + a[pa_h:]
    gt = (1, 1)
    return [
        TrueSV(chrom_a, pa, "BND", 0, gt, chrom2=chrom_b, pos2=pb),
        TrueSV(chrom_b, pb, "BND", 0, gt, chrom2=chrom_a, pos2=pa),
        TrueSV(chrom_b, pb, "BND", 0, gt, chrom2=chrom_a, pos2=pa),
        TrueSV(chrom_a, pa, "BND", 0, gt, chrom2=chrom_b, pos2=pb),
    ]


def implant_snps(
    rng: np.random.Generator,
    hap1: dict[str, str], hap2: dict[str, str],
    rate: float = 1 / 1500,
) -> tuple[dict[str, str], dict[str, str], dict[str, np.ndarray]]:
    """Sprinkle het SNPs (each on one random haplotype) — the phasing
    signal.  Returns (hap1, hap2, positions per chrom in hap coords of the
    mutated haplotype)."""
    bases = "ACGT"
    out1, out2, pos_out = {}, {}, {}
    for chrom in hap1:
        h1, h2 = list(hap1[chrom]), list(hap2[chrom])
        n = int(rate * min(len(h1), len(h2)))
        pos = np.sort(rng.choice(np.arange(100, min(len(h1), len(h2)) - 100),
                                 n, replace=False))
        for p in pos:
            target = h1 if rng.random() < 0.5 else h2
            old = target[p]
            alt = bases[(bases.index(old) + 1 + int(rng.integers(3))) % 4] \
                if old in bases else "A"
            if alt == old:
                alt = bases[(bases.index(old) + 1) % 4]
            target[p] = alt
        out1[chrom] = "".join(h1)
        out2[chrom] = "".join(h2)
        pos_out[chrom] = pos
    return out1, out2, pos_out


def mutate_read(rng: np.random.Generator, seq: str, sub_rate: float,
                indel_rate: float) -> str:
    """Apply sequencing errors (substitutions + 1-3bp indels)."""
    if sub_rate <= 0 and indel_rate <= 0:
        return seq
    arr = list(seq)
    n = len(arr)
    n_sub = rng.poisson(sub_rate * n)
    for i in rng.integers(0, n, n_sub):
        arr[i] = str(rng.choice(BASES))
    n_ind = rng.poisson(indel_rate * n)
    for _ in range(n_ind):
        i = int(rng.integers(1, len(arr) - 4))
        ln = int(rng.integers(1, 4))
        if rng.random() < 0.5:
            del arr[i : i + ln]
        else:
            arr[i:i] = list(rng.choice(BASES, ln))
    return "".join(arr)


def simulate_reads(
    rng: np.random.Generator,
    haps: dict[int, dict[str, str]],
    coverage: float = 20.0,
    read_len: int = 15_000,
    read_len_sd: int = 3_000,
    sub_rate: float = 0.001,
    indel_rate: float = 0.0005,
) -> list[tuple[str, str, int, str, int]]:
    """Sample reads per haplotype.

    Returns [(name, seq, hap, chrom, true_start)] — reads are strand-flipped
    at random; hap in {1, 2}."""
    comp = str.maketrans("ACGT", "TGCA")
    reads = []
    rid = 0
    for hap, seqs in haps.items():
        for chrom, seq in seqs.items():
            L = len(seq)
            n_reads = int(coverage * L / (2 * read_len))  # per hap: cov/2
            for _ in range(max(n_reads, 1)):
                ln = int(np.clip(rng.normal(read_len, read_len_sd),
                                 read_len // 4, L))
                start = int(rng.integers(0, max(L - ln, 1)))
                s = seq[start : start + ln]
                s = mutate_read(rng, s, sub_rate, indel_rate)
                if rng.random() < 0.5:
                    s = s.translate(comp)[::-1]
                reads.append((f"read_h{hap}_{rid}", s, hap, chrom, start))
                rid += 1
    return reads


def contigs_from_haplotypes(
    hap1: dict[str, str], hap2: dict[str, str],
    block_size: int = 120_000, overlap: int = 10_000,
) -> dict[str, str]:
    """Cut haplotypes into phase-block-style contigs named like the
    reference's assembly output: PS<pb>_<start>_<end>_hp{1,2}_<n>
    (General_Assembly_Workflow.py reformat_fasta:37-45) — the '-otherasm'
    entry point of the vc pipeline."""
    contigs = {}
    for hp, haps in ((1, hap1), (2, hap2)):
        for chrom, seq in haps.items():
            L = len(seq)
            n = 0
            start = 0
            while start < L:
                end = min(L, start + block_size)
                name = f"PS{start + 1}_{start + 1}_{end}_hp{hp}_{n}"
                contigs[name] = seq[start:end]
                if end >= L:
                    break
                start = end - overlap
                n += 1
    return contigs
