"""One typed config tree for the whole engine.

The reference scatters its hyperparameters across argparse defaults, CSV/TXT
data files and hard-coded literals (SURVEY.md §5):

* large-indel signature/cluster thresholds — extract_contig_signature_Hifi.py
  (min sv 30bp, max_shift 100, size-sim 0.5, pair shift 200, split-pair
  overlap tolerance 3000, max svlen 50000)
* FP filter — FP_filter_v1.py (shift 500, size-sim 0.5, auto-pass >250bp)
* redundancy removal — remove_redundancy.py (INS dist 500/sim 0.5/edit 0.5;
  DEL dist 3000/size-sim 0.1)
* coverage band-pass bounds — Large_INDEL/filter_para.csv
* GT-correction thresholds — Large_INDEL/para/GT_correction_para_*.txt
  (max_dist_ratio 2.3, min_size_sim 0.6, flanking 100/150)
* small-indel — htsbox -w 20 context, size band 2-49bp, k=15 kmer filter
  rt=0.3 ms=5 (volcanosv-vc-small-indel.py:210-212)
* complex SV — DUP sim 0.7/shift 300/ratio 0.3 (align_ins2ref.py:82-97),
  TRA cluster 100bp (filter_tra.py), INV merge 500bp + read support
  (filter_inv.py)
* k-mer partition — k=12, sig_level 0.1
  (get_raw_kmer_overlap_count_unphased_est_pbs_v1.py)
* assembly — per-dtype assembler choice, genome-size estimate
  (General_Assembly_Workflow.py:13-18)

Everything is a frozen dataclass so configs hash & can be closed over by
jitted functions as static args.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from enum import Enum


class DataType(str, Enum):
    HIFI = "Hifi"
    CLR = "CLR"
    ONT = "ONT"


@dataclass(frozen=True)
class AlignConfig:
    """Minimizer seed + chain + banded-extend aligner (replaces minimap2).

    Presets mirror minimap2 modes used by the reference:
      asm5  (Raw_variant_call.py:49)   contig→ref, low divergence
      asm10 (volcanosv-vc-complex-sv.py:110) contig→ref
      asm20 (volcanosv-vc-small-indel.py:87) dipcall-style
      map   (align_ins2ref.py:67, reads→ref)
      ava   (General_Assembly_Workflow.py:144, read overlap)
    """
    k: int = 19                  # minimizer k-mer size
    w: int = 10                  # minimizer window
    min_chain_anchors: int = 3
    max_anchor_gap: int = 5_000      # chaining: max gap between anchors
    chain_bandwidth: int = 2_000     # chaining: max diagonal drift
    min_chain_score: int = 100       # bp of anchored sequence
    band_width: int = 256            # banded DP band (lanes)
    match: int = 2
    mismatch: int = -4
    gap_open: int = -4
    gap_extend: int = -2
    # dual-affine long-gap class (None = single affine).  The asm20/dipcall
    # preset enables it — minimap2 -O 5,56 -E 4,1
    # (volcanosv-vc-small-indel.py:85-95): long gaps switch to the cheap
    # class past the cost crossover, here k > 20bp.
    gap_open2: int | None = None
    gap_extend2: int | None = None
    # inversion rescue: a small (≲600bp) inversion is swallowed by chaining
    # as a dense mismatch/indel 'soup' window instead of splitting into an
    # opposite-strand segment (the classic minimap2 small-INV blindspot —
    # svim-asm only ever sees INVs as split segments, SVIM_inter.py:62-340).
    # When enabled, soup windows are re-aligned reverse-complemented and a
    # winning window is emitted as a proper inverted supplementary
    # alignment.  Off for ava (overlap candidates don't need it).
    inv_rescue: bool = False
    inv_rescue_density: float = 0.25  # (mismatch+indel events)/bp trigger
    #                                   — must exceed the platform noise
    # acceptance floor as a fraction of the perfect-match score: a true
    # inverted window re-aligns near-perfectly reverse-complemented, while
    # a consensus-garbled window (mixed-haplotype assembly noise) aligns
    # poorly BOTH ways — without the floor it can win the rc-vs-fwd
    # comparison and fabricate an inversion on the wrong haplotype
    inv_rescue_min_score_frac: float = 0.65

    @staticmethod
    def preset(name: str) -> "AlignConfig":
        if name == "asm5":
            return AlignConfig(k=19, w=10, inv_rescue=True)
        if name == "asm10":
            return AlignConfig(k=19, w=10, mismatch=-3, inv_rescue=True)
        if name == "asm20":
            return AlignConfig(k=19, w=10, mismatch=-2,
                               gap_open2=-24, gap_extend2=-1, inv_rescue=True)
        if name == "map-hifi":
            return AlignConfig(k=19, w=19, min_chain_score=60,
                               inv_rescue=True)
        if name in ("map-ont", "map-pb"):
            # CLR/ONT base error ≈ 0.09-0.14 events/bp — the soup trigger
            # must sit above it
            return AlignConfig(k=15, w=10, min_chain_score=60,
                               inv_rescue=True, inv_rescue_density=0.4,
                               inv_rescue_min_score_frac=0.35)
        if name == "ava":
            return AlignConfig(k=15, w=5, min_chain_score=60, min_chain_anchors=2)
        if name == "polish":
            # reads → own-group drafts for consensus: inversion rescue is
            # meaningless here (a read never spans an inversion relative
            # to a draft assembled from the same reads) and costs a full
            # re-align pass per batch
            return AlignConfig(k=19, w=19, min_chain_score=60,
                               inv_rescue=False)
        raise ValueError(f"unknown preset {name}")


@dataclass(frozen=True)
class SignatureConfig:
    """Contig CIGAR/split signature extraction.

    ref: extract_contig_signature_Hifi.py:53-166 (cigar), :307-371 (split)."""
    min_sv_size: int = 30
    max_sv_size: int = 50_000
    merge_dist_small: int = 500      # merge INS/DEL <250bp within this distance
    merge_dist_large: int = 250      # merge INS/DEL >=250bp within this distance
    merge_size_boundary: int = 250
    split_overlap_tol: int = 3_000   # split-pair read-overlap tolerance (Hifi)
    # minimum aligned span for a segment to join split-pair analysis: tiny
    # supplementary segments (e.g. a tandem-dup copy re-aligned to the
    # original locus) are alignments minimap2 -r2k absorbs into the primary
    # CIGAR — pairing them fabricates junctions
    min_split_segment: int = 500
    split_rel_overlap: float = 0.0   # CLR=0.3 / ONT=0.5 relative overlap criterion
    # ONT-only split-INS branch: Diffdis*0.8 ≤ Diffolp ≤ |Diffdis|*r
    # (extract_contig_signature_ONT.py:373-380)
    split_ins_ont: bool = False
    # CLR noisy-contig gate for the cigar path: keep a contig only when
    # ins_pct ≤ 0.13 OR mean match-run length ≥ 200
    # (extract_contig_signature_CLR.py:53-71, applied :425-427)
    noisy_contig_filter: bool = False
    noisy_max_ins_pct: float = 0.13
    noisy_min_var_dist: float = 200.0
    min_mapq: int = 20
    # clustering (cluster_del/cluster_ins :196-288)
    max_shift: int = 100
    min_size_sim: float = 0.5
    min_overlap: float = 0.5
    # hp1 x hp2 pairing → genotype (pair_sig :548-603)
    pair_max_shift: int = 200
    pair_min_size_sim: float = 0.5


@dataclass(frozen=True)
class FPFilterConfig:
    """Read-signature support filter. ref: FP_filter_v1.py:87-123."""
    max_shift: int = 500
    min_size_sim: float = 0.5
    auto_pass_svlen: int = 250
    min_support: int = 1
    reads_min_mapq: int = 50         # extract_reads_signature.py:120
    reads_min_sv_size: int = 30


@dataclass(frozen=True)
class RedundancyConfig:
    """Cross-contig call dedup. ref: remove_redundancy.py:92-125."""
    ins_max_dist: int = 500
    ins_min_size_sim: float = 0.5
    ins_min_edit_sim: float = 0.5
    del_max_dist: int = 3_000
    del_min_size_sim: float = 0.1


# filter_para.csv verbatim: (asm, dtype) → (lb_ins, rb_ins, lb_del, rb_del)
FILTER_PARA: dict[tuple[str, str], tuple[float, float, float, float]] = {
    ("other", "hifi"): (0.048, 2.61, 0.097, 2.59),
    ("other", "clr"): (0.0327, 2.476, 0.102, 2.638),
    ("other", "ont"): (0.191, 2.44, 0.123, 2.67),
    ("volcano", "hifi"): (0.097, 2.754, 0.2, 2.605),
    ("volcano", "clr"): (0.075, 2.383, 0.186, 3.018),
    ("volcano", "ont"): (0.206, 2.79, 0.242, 2.77),
}


@dataclass(frozen=True)
class CovFilterConfig:
    """Relative-coverage band-pass, per (asm,dtype). ref: filter_para.csv +
    filter_vcf_by_sig_cov_insdel.py:20-27.  Bounds are multiples of the
    per-run (WGS-global) median rel_cov.  `for_mode` selects the
    filter_para.csv row; the reference driver hard-codes asm='volcano'
    (filter_GT_correction.py:144) and filters DEL only (ft_vtype='DEL',
    :27) — the 'other' rows back the --contig/otherasm entry."""
    flank: int = 1_000
    del_low: float = 0.2             # volcano/hifi DEL band (filter_para.csv:5)
    del_high: float = 2.605
    ins_low: float = 0.097           # volcano/hifi INS band (used when
    ins_high: float = 2.754          # apply_ins is enabled, vtype='INSDEL')
    apply_del: bool = True
    apply_ins: bool = False          # reference filters DEL only (ft_vtype='DEL')
    min_calls: int = 20              # median of fewer calls is meaningless;
                                     # the reference only runs this on WGS sets

    @staticmethod
    def for_mode(dtype: "DataType | str", asm: str = "volcano",
                 ) -> "CovFilterConfig":
        lb_i, rb_i, lb_d, rb_d = FILTER_PARA[
            (asm, DataType(dtype).value.lower())]
        return CovFilterConfig(del_low=lb_d, del_high=rb_d,
                               ins_low=lb_i, ins_high=rb_i)


@dataclass(frozen=True)
class GTCorrectionConfig:
    """Genotype re-estimation from read-signature support/depth ratio.

    ref: correct_gt_del_real_data.py (max_dist_ratio 2.3, min_size_sim 0.6,
    min shift floor 500, flank 150 DEL / 100 INS) + learned cutoffs in
    para/GT_correction_para_{dtype}_{INS,DEL}.txt."""
    max_dist_ratio: float = 2.3
    min_shift_floor: int = 500
    min_size_sim: float = 0.6
    del_flank: int = 150
    ins_flank: int = 100
    size_boundary: int = 1_000       # 'large' vs 'small' (correct_gt_eval)
    # per-read signature merging before support counting
    # (sig_extract.py generate_combine_sigs:373-435; defaults '-mi 100 -md 0'
    # sig_extract.py:710-717) — fragmented sigs of a noisy read merge when
    # the gap to the previous signature is ≤ merge_dis
    merge_ins_dis: int = 100
    merge_del_dis: int = 0
    merge_min_siglength: int = 10    # sig_extract '-sl' min_siglength floor
    task_window: int = 10_000_000    # genome task grid (sig_extract.py '-b'
                                     # batches, :603-644 — 10Mb default)
    # n_ratio thresholds (t_large_11, t_small_11, t_large_01, t_small_01);
    # None disables (== 'nan' in para/GT_correction_para_{dtype}_{TYPE}.txt)
    del_thresholds: tuple = (0.6, 0.69, 0.71, 0.91)       # Hifi DEL
    ins_thresholds: tuple = (None, 0.59, 0.63, 0.79)      # Hifi INS

    @staticmethod
    def for_dtype(dtype: "DataType") -> "GTCorrectionConfig":
        """Learned per-dtype cutoffs (para/GT_correction_para_*.txt)."""
        if dtype == DataType.HIFI:
            return GTCorrectionConfig()
        if dtype == DataType.CLR:
            return GTCorrectionConfig(
                del_thresholds=(0.55, 0.59, 0.65, 0.75),
                ins_thresholds=(None, None, 0.64, 0.75))
        return GTCorrectionConfig(
            del_thresholds=(0.61, 0.61, 0.68, 0.79),
            ins_thresholds=(None, None, 0.67, 0.72))


@dataclass(frozen=True)
class SmallIndelConfig:
    """Diploid pileup caller + k-mer read-support filter.

    ref: volcanosv-vc-small-indel.py (htsbox -q5 -w20; 2–49bp; k=15 rt=0.3 ms=5)."""
    min_mapq: int = 5
    context: int = 20
    min_size: int = 2
    max_size: int = 49
    kmer_k: int = 15
    max_bad_kmer_ratio: float = 0.3
    min_kmer_support: int = 5
    region_left: int = 20            # check_reads_kmer_support.py get_seq:75-99
    region_right: int = 70


@dataclass(frozen=True)
class ComplexSVConfig:
    """svim-asm-equivalent + DUP/INV/TRA post filters.

    ref: SVIM_input_parsing.py:48-97 (min 40, max 100000, tol 50),
    align_ins2ref.py:82-97, filter_tra.py:70-88, filter_inv.py:57-190."""
    min_sv_size: int = 40
    max_sv_size: int = 100_000
    segment_gap_tol: int = 10_000
    segment_overlap_tol: int = 50
    dup_min_size_sim: float = 0.7
    dup_max_shift: int = 300
    dup_max_shift_ratio: float = 0.3
    dup_int_dest_tol: int = 20       # is_similar(), SVIM_inter.py:12-16
    min_segment_len: int = 500       # junction analysis ignores smaller
                                     # segments (dup-copy re-alignments);
                                     # the INV minority-strand scan keeps
                                     # them (small inversions are real)
    # hap pairing by reconstructed-haplotype edit distance
    # (SVIM_COMBINE.py:15-140 + SVIM_input_parsing.py:219-230)
    partition_max_distance: int = 1_000
    # svim-asm's edit_distance_threshold=10 (SVIM_COMBINE.py:120
    # pair_haplotypes default): two similar-but-different alleles (e.g.
    # INVs with 50bp breakpoint slack) must stay two hets, not merge to 1|1
    pair_max_edit_distance: int = 10
    pair_max_partition: int = 10     # larger partitions dropped (:128-130)
    bnd_pair_threshold: float = 0.3  # span-position distance cut (:142-160)
    bnd_pair_norm: int = 3_000       # (d1+d2)/norm (:108-121)
    tra_cluster_dist: int = 100
    inv_merge_dist: int = 500
    inv_support_flank: int = 1_000
    inv_min_support: int = 1


@dataclass(frozen=True)
class PhasingConfig:
    """SNP calling + read-backed phasing (replaces longshot).

    ref invocation: volcanosv-asm.py:75-80 (longshot -F).

    error_rate enables the genotype-likelihood candidate model (binomial
    hom-ref/het/hom-alt, SNP qual gated at min_snp_qual — longshot's
    likelihood role); None falls back to the plain allele-fraction band
    (used by the assembler's consensus pileup).  for_dtype selects the
    per-platform rate below."""
    min_snp_qual: float = 20.0
    min_base_qual: int = 7
    min_mapq: int = 20
    min_allele_frac: float = 0.2     # candidate SNP: alt fraction band
    max_allele_frac: float = 0.8
    min_depth: int = 6
    max_depth: int = 400
    error_rate: float | None = None  # active model; set per dtype
    error_rate_hifi: float = 0.002
    error_rate_clr: float = 0.10
    error_rate_ont: float = 0.05
    max_phase_iter: int = 30
    # pair-HMM realignment of observations near indels (longshot's core
    # trick — phasing/realign.py); active when error_rate is set
    realign: bool = True
    realign_flank: int = 20          # hap window half-width
    realign_margin: float = 1.0      # nats of LLR needed for an allele call
    realign_indel_frac: float = 0.15  # site is 'near-indel' when ≥ this
    #                                   fraction of covering reads has an
    #                                   indel within ±10bp
    realign_af_relax: float = 0.5    # af pre-gate multiplier at those sites
    # longshot's realign-EVERYWHERE model (the reason it works at CLR 89x,
    # volcanosv-asm.py:75-80): at ≥ ~5% error every site is near-indel, so
    # every candidate's k/n is re-derived by the pair-HMM before the
    # genotype-likelihood gate.  for_dtype turns this on for CLR/ONT.
    realign_all: bool = False
    # dense-cluster filter (longshot -D role): candidate SNVs packed this
    # tightly are mismapping/inversion artifacts, not real variation
    dense_count: int = 6             # ≥ this many candidates ...
    dense_window: int = 100          # ... within this window → drop all
    dense_margin: int = 30           # dense intervals grow by this margin
    dense_min_span: int = 50         # interval mask floor: separates SV
    #                                  soup (≥ SV size, 50bp+) from the
    #                                  ~15-20bp alignment-shift shadow
    #                                  clusters the pair-HMM can heal
    # SV-aware phasing markers: ≥30bp read-CIGAR indel clusters and dense-
    # mismatch (inversion-soup) intervals become extra MEC columns so reads
    # phase through het-SNP deserts — carrier/non-carrier separation is
    # exactly the haplotype signal longshot cannot see (SNVs only); the
    # markers never reach the SNP VCF
    sv_markers: bool = True
    marker_min_len: int = 30         # indel marker: event length floor
    #                                  (for_dtype lowers it to 6 on HiFi —
    #                                  error indels are 1-3bp there, so
    #                                  6bp+ events are real het signal)
    marker_max_shift: int = 100      # indel marker clustering shift
    marker_min_carriers: int = 3     # het gate: ≥ carriers and
    marker_min_refs: int = 3         #          ≥ clean spanning reads
    # carrier-fraction band (het evidence): a real het SV among clean
    # spanning reads sits near 0.5; representation-lottery artifacts (an
    # event visible in only a few alignments) hug the edges
    marker_min_frac: float = 0.25
    marker_max_frac: float = 0.80
    marker_soup_events: int = 4      # soup marker: ≥ events inside the
    #                                  dense interval → carrier; ≤1 → clean

    @staticmethod
    def for_dtype(dtype: "DataType | str") -> "PhasingConfig":
        base = PhasingConfig()
        rate = {DataType.HIFI: base.error_rate_hifi,
                DataType.CLR: base.error_rate_clr,
                DataType.ONT: base.error_rate_ont}[DataType(dtype)]
        # CLR/ONT: the enumeration floor must sit ABOVE the platform's
        # per-column mismatch noise (measured noise af p99.9 ≈ 0.32 at CLR
        # 13.5% total error; true-het exact columns sit at 0.28-0.8) — a
        # low floor floods the candidate set and the dense filter then
        # masks whole chromosomes (the round-4 "0 SNPs at CLR" failure).
        # The near-indel af relax is disabled there (every site is
        # near-indel at that error rate; the pair-HMM re-derives counts
        # anyway via realign_all).
        hifi = DataType(dtype) == DataType.HIFI
        af = base.min_allele_frac if hifi else 0.22
        relax = base.realign_af_relax if hifi else 1.0
        mml = 6 if hifi else base.marker_min_len
        # higher qual bar at high error: realigned noise columns at
        # af 0.2-0.4 clear qual 20 but not 40; true hets clear both
        # (measured CLR 100kb: prec 0.87→0.98 at unchanged recall 0.91)
        qual = base.min_snp_qual if hifi else 40.0
        return dataclasses.replace(base, error_rate=rate,
                                   min_allele_frac=af, marker_min_len=mml,
                                   realign_af_relax=relax,
                                   realign_all=not hifi,
                                   min_snp_qual=qual)


@dataclass(frozen=True)
class PartitionConfig:
    """k-mer haplotype partitioning of unphased reads.

    ref: HashSeq.py (k=12 one-hot hash), get_raw_kmer_overlap_count_… (
    sig_level 0.1 quantile, L2 normalize, 2 nearest phase blocks)."""
    k: int = 12
    sig_level: float = 0.1
    n_nearest_blocks: int = 2
    min_read_len: int = 500          # bamtoseq filter: reads shorter than k dropped


@dataclass(frozen=True)
class AssemblyConfig:
    """Local OLC assembler for phase-block haplotypes (replaces 8 assemblers).

    genome size estimate = phase-block span (General_Assembly_Workflow.py:13-18)."""
    assembler: str = "volcano-olc"   # single native assembler; enum kept for parity
    min_overlap_len: int = 500
    max_overhang: int = 1_000
    min_reads: int = 1
    min_draft_reads: int = 3         # polished fragment drafts winning fewer
                                     # primary reads are dropped (leaked
                                     # double-assigned reads of the other hap)
    consensus_rounds: int = 1
    dedup_reads: bool = False        # CLR/ONT duplicate pre-pass (remove_duplicate:389-415)


@dataclass(frozen=True)
class QCConfig:
    """Flagger-equivalent coverage-HMM assembly QC (hmm_flagger.c)."""
    n_states: int = 4                # err / dup(collapsed-half) / hap / collapsed
    window: int = 1_000
    max_iter: int = 20


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes: data-parallel over read/contig batches ('data'),
    genome-shard axis over chromosomes/windows ('genome')."""
    data_axis: str = "data"
    genome_axis: str = "genome"
    genome_shards: int = 1


@dataclass(frozen=True)
class PipelineConfig:
    dtype: DataType = DataType.HIFI
    align: AlignConfig = field(default_factory=lambda: AlignConfig.preset("asm5"))
    signature: SignatureConfig = field(default_factory=SignatureConfig)
    fp_filter: FPFilterConfig = field(default_factory=FPFilterConfig)
    redundancy: RedundancyConfig = field(default_factory=RedundancyConfig)
    cov_filter: CovFilterConfig = field(default_factory=CovFilterConfig)
    gt_correction: GTCorrectionConfig = field(default_factory=GTCorrectionConfig)
    small_indel: SmallIndelConfig = field(default_factory=SmallIndelConfig)
    complex_sv: ComplexSVConfig = field(default_factory=ComplexSVConfig)
    phasing: PhasingConfig = field(default_factory=PhasingConfig)
    partition: PartitionConfig = field(default_factory=PartitionConfig)
    assembly: AssemblyConfig = field(default_factory=AssemblyConfig)
    qc: QCConfig = field(default_factory=QCConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    @staticmethod
    def for_dtype(dtype: DataType | str, asm: str = "volcano",
                  ) -> "PipelineConfig":
        """Per-dtype parameter profile; asm ∈ {volcano, other} selects the
        filter_para.csv coverage-band row (the 'other' rows back the
        --contig/otherasm entry, README.md:397-410)."""
        dtype = DataType(dtype)
        base = PipelineConfig(
            dtype=dtype, gt_correction=GTCorrectionConfig.for_dtype(dtype),
            cov_filter=CovFilterConfig.for_mode(dtype, asm),
            phasing=PhasingConfig.for_dtype(dtype))
        if dtype == DataType.HIFI:
            return base
        if dtype == DataType.CLR:
            # CLR: rel-overlap split criterion r=0.3 + noisy-contig gate
            # (extract_contig_signature_CLR.py:368-399, :53-71)
            return dataclasses.replace(
                base,
                signature=dataclasses.replace(
                    base.signature, split_rel_overlap=0.3,
                    noisy_contig_filter=True),
                assembly=dataclasses.replace(base.assembly, dedup_reads=True),
            )
        # ONT: r=0.5, INS-from-split restricted to the Diffdis*0.8 branch
        # (extract_contig_signature_ONT.py:348-380)
        return dataclasses.replace(
            base,
            signature=dataclasses.replace(
                base.signature, split_rel_overlap=0.5, split_ins_ont=True),
            assembly=dataclasses.replace(base.assembly, dedup_reads=True),
        )
