"""Assembler contiguity regression: a clean phase-block read set must
assemble into few contigs with the longest covering most of the haplotype
and little redundancy — the analogue of the reference's golden check that
output contigs match the zenodo contig FASTA size (README.md:131-132)."""
import numpy as np

from volcanosv_tpu import sim
from volcanosv_tpu.assembly.olc import assemble_block
from volcanosv_tpu.config import AssemblyConfig


def test_block_assembly_contiguity():
    rng = np.random.default_rng(101)
    ref = sim.random_genome(rng, 120_000, n_chroms=1)
    hap1, hap2, _t = sim.implant_svs(rng, ref, n_del=2, n_ins=2,
                                     min_len=80, max_len=500)
    for hap in (hap1, hap2):
        reads = sim.simulate_reads(rng, {1: hap}, coverage=12.0,
                                   read_len=7000, sub_rate=0.002,
                                   indel_rate=0.001)
        seqs = [s for _n, s, *_ in reads]
        res = assemble_block(seqs, AssemblyConfig())
        lens = sorted(map(len, res.contigs), reverse=True)
        L = len(hap["chr1"])
        assert lens, "no contigs"
        assert len(lens) <= 6, f"fragmented: {len(lens)} contigs"
        assert lens[0] >= 0.8 * L, f"longest covers {lens[0]/L:.0%}"
        assert sum(lens) <= 1.5 * L, f"redundancy {sum(lens)/L:.2f}"
