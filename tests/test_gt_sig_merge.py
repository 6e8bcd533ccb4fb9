"""cuteSV-parity per-read signature merging for GT correction.

ref: sig_extract.py generate_combine_sigs (:373-435) with the driver
defaults merge_ins_threshold=100 / merge_del_threshold=0 (:710-717) and
min_siglength=10 (:739-742).  A noisy read's fragmented signatures must
merge so support counting reaches the call (VERDICT round-1 item 6)."""
import numpy as np

from volcanosv_tpu.config import GTCorrectionConfig
from volcanosv_tpu.io.bam import BamRecord
from volcanosv_tpu.vc.gt_correction import aggregate_read_sigs, sig_support
from volcanosv_tpu.vc.reads_sig import extract_gt_read_sigs, merge_read_sigs
from volcanosv_tpu.vc.signatures import Signature


def _sig(svtype, pos, svlen, qname="r1"):
    return Signature("chr1", svtype, pos, svlen, qname, 0, svlen, "+",
                     "cigar", "60")


def test_merge_ins_within_threshold():
    # two INS fragments 80bp apart (≤100) merge; svlen sums
    sigs = [_sig("INS", 100, 40), _sig("INS", 180, 35)]
    out = merge_read_sigs(sigs, "INS", 100)
    assert len(out) == 1
    assert out[0].pos == 100 and out[0].svlen == 75


def test_merge_ins_beyond_threshold_kept_separate():
    sigs = [_sig("INS", 100, 40), _sig("INS", 300, 35)]
    out = merge_read_sigs(sigs, "INS", 100)
    assert [(s.pos, s.svlen) for s in out] == [(100, 40), (300, 35)]


def test_merge_del_adjacent_only():
    # DEL merge_dis=0: gap from prev end (pos+len).  40@100 ends at 140;
    # next at 140 (adjacent) merges, next at 150 (gap 10) does not.
    adjacent = [_sig("DEL", 100, 40), _sig("DEL", 140, 25)]
    out = merge_read_sigs(adjacent, "DEL", 0)
    assert len(out) == 1 and out[0].svlen == 65
    gapped = [_sig("DEL", 100, 40), _sig("DEL", 150, 25)]
    assert len(merge_read_sigs(gapped, "DEL", 0)) == 2


def test_merge_is_per_read_chain():
    # chain: 100 →(+80) 180 →(+90) 270 all merge (each gap ≤ 100)
    sigs = [_sig("INS", 100, 20), _sig("INS", 180, 20), _sig("INS", 270, 20)]
    out = merge_read_sigs(sigs, "INS", 100)
    assert len(out) == 1 and out[0].svlen == 60


def _read_with_fragmented_ins(name: str, ref_pos: int):
    """60bp of inserted sequence split as 3×20bp INS ops 50bp apart —
    below any 30bp caller threshold individually, 60bp merged."""
    M, I = 0, 1
    cigar = np.array([
        [M, 600], [I, 20], [M, 50], [I, 20], [M, 50], [I, 20], [M, 600],
    ], np.int64)
    seq_len = 600 + 20 + 50 + 20 + 50 + 20 + 600
    return BamRecord(name=name, flag=0, ref_id=0, pos=ref_pos, mapq=60,
                     cigar=cigar, seq="A" * seq_len)


def test_fragmented_noisy_read_sigs_merge_to_support_call():
    cfg = GTCorrectionConfig()
    reads = [_read_with_fragmented_ins(f"r{i}", 1000) for i in range(5)]
    sigs = extract_gt_read_sigs(reads, "chr1", cfg)
    ins = [s for s in sigs if s.svtype == "INS"]
    # each read contributes ONE merged 60bp INS, not three 20bp fragments
    assert len(ins) == 5
    assert all(s.svlen == 60 for s in ins)

    # support counting: a 60bp INS call at the locus is supported by all 5
    sp, sl, sc = aggregate_read_sigs(ins, "INS")
    sup = sig_support(np.array([1600]), np.array([60]), sp, sl, sc, cfg)
    assert sup[0] == 5

    # without merging, the 20bp fragments fail size-sim 0.6 vs svlen 60
    frag_len = np.full(3, 20, np.int64)
    frag_pos = np.array([1600, 1650, 1700], np.int64)
    sup0 = sig_support(np.array([1600]), np.array([60]), frag_pos, frag_len,
                       np.full(3, 5, np.int64), cfg)
    assert sup0[0] == 0


def test_aggregate_min_size_floor():
    sigs = [_sig("DEL", 100, 12), _sig("DEL", 500, 45)]
    sp, sl, _ = aggregate_read_sigs(sigs, "DEL", min_size=30)
    assert sp.tolist() == [500] and sl.tolist() == [45]


def test_task_window_grid_matches_unwindowed():
    """The 10Mb task-grid decomposition (sig_extract.py:603-644) must be
    output-invariant: tiny windows give the same sorted signature stream."""
    import dataclasses

    rng = np.random.default_rng(6)
    M, I, D, S = 0, 1, 2, 4
    reads = []
    for i in range(40):
        pos = int(rng.integers(0, 50_000))
        cigar = np.array([[M, 700], [I, 45], [M, 600], [D, 60], [M, 700]],
                         np.int64)
        reads.append(BamRecord(name=f"r{i}", pos=pos, mapq=60, cigar=cigar,
                               seq="A" * 2045))
    # a split pair whose segments straddle a tiny window boundary
    reads.append(BamRecord(name="sp", pos=900, mapq=60,
                           cigar=np.array([[M, 1000], [S, 1000]], np.int64),
                           seq="A" * 2000))
    reads.append(BamRecord(name="sp", pos=2500, mapq=60,
                           cigar=np.array([[S, 1000], [M, 1000]], np.int64),
                           seq="A" * 2000))
    cfg = GTCorrectionConfig()
    small = dataclasses.replace(cfg, task_window=1_000)
    a = extract_gt_read_sigs(reads, "chr1", cfg)
    b = extract_gt_read_sigs(reads, "chr1", small)
    key = lambda s: (s.pos, s.svtype, s.svlen, s.qname)
    assert sorted(map(key, a)) == sorted(map(key, b))
    assert any(s.source == "split-alignment" for s in b)
