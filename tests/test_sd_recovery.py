"""SD-recovery loop: QC flags a collapsed hap, its contigs get re-assembled
and swapped (Evaluate_Assembly + General_Assembly_Workflow_SD +
Replace_Collapsed_Contigs parity)."""
import numpy as np

from volcanosv_tpu.config import PipelineConfig
from volcanosv_tpu.io.bam import BamRecord
from volcanosv_tpu.pipeline.sd import hap_of_contig, sd_recover
from volcanosv_tpu.sim import random_genome, simulate_reads


def _fake_read(name, ref_id, pos, length):
    return BamRecord(name=name, flag=0, ref_id=ref_id, pos=pos, mapq=60,
                     cigar=np.array([[0, length]], np.int64), seq="A" * 4)


def test_hap_of_contig():
    assert hap_of_contig("PS17_17_5000_hp2_3") == "PS17_17_5000_hp2"


def test_sd_recover_swaps_collapsed_hap():
    rng = np.random.default_rng(5)
    ref = random_genome(rng, 20_000)
    seq = ref["chr1"]
    reads = simulate_reads(rng, {1: ref}, coverage=14.0, read_len=4_000,
                           read_len_sd=300, sub_rate=0.001, indel_rate=0.0)
    read_groups = {
        "PS1_1_20000_hp1": [s for _n, s, *_ in reads],
        "PS1_1_20000_hp2": [s for _n, s, *_ in reads],
    }
    contigs = {"PS1_1_20000_hp1_0": seq, "PS1_1_20000_hp2_0": seq}
    names = list(contigs)

    # hap1's contig gets uniform coverage, hap2's a doubled mid-block
    roc = []
    rid = 0
    for start in range(0, 18_000, 400):
        roc.append(_fake_read(f"a{rid}", 0, start, 3_000)); rid += 1
        roc.append(_fake_read(f"b{rid}", 1, start, 3_000)); rid += 1
    for start in range(6_000, 12_000, 200):
        roc.append(_fake_read(f"c{rid}", 1, start, 3_000)); rid += 1

    cfg = PipelineConfig.for_dtype("Hifi")
    new_contigs, qc = sd_recover(contigs, read_groups, roc, cfg)
    assert any("hp2" in c for c in qc.collapsed), qc.collapsed
    # hp2 contigs replaced by re-assembly output; hp1 untouched
    assert new_contigs.get("PS1_1_20000_hp1_0") == seq
    hp2 = {c: s for c, s in new_contigs.items() if "hp2" in c}
    assert hp2, "hp2 hap lost its contigs"
    total = sum(len(s) for s in hp2.values())
    assert total >= 0.8 * len(seq), total
