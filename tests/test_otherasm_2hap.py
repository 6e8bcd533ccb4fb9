"""'-otherasm-2hap' contract: user-supplied whole-haplotype FASTAs whose
contig names carry only hp1/hp2 (no PS<pb>_ phase-block prefix).

ref: volcanosv-vc-large-indel-otherasm-2hap.py + Complex_SV/split_hap.py —
haplotype membership is a substring test on the contig name, and phasing
falls back gracefully when no PS prefix exists."""
import os

import numpy as np
import pytest

from volcanosv_tpu import sim
from volcanosv_tpu.cli import main
from volcanosv_tpu.io.fasta import write_fasta
from volcanosv_tpu.io.vcf import read_vcf


@pytest.fixture(scope="module")
def twohap_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("twohap")
    rng = np.random.default_rng(11)
    ref = sim.random_genome(rng, 60_000, n_chroms=1)
    hap1, hap2, truth = sim.implant_svs(rng, ref, n_del=3, n_ins=3,
                                        min_len=60, max_len=400)
    write_fasta(str(d / "ref.fa"), ref)
    # whole-hap contigs, plain hp1/hp2 names — the 2hap contract
    write_fasta(str(d / "contigs.fa"),
                {f"hp1_{c}": s for c, s in hap1.items()}
                | {f"hp2_{c}": s for c, s in hap2.items()})
    out = str(d / "out")
    assert main(["vc-large-indel", "--ref", str(d / "ref.fa"),
                 "--contig", str(d / "contigs.fa"), "-o", out]) == 0
    return truth, out


def test_2hap_calls_recall(twohap_run):
    truth, out = twohap_run
    _h, calls = read_vcf(os.path.join(out, "volcanosv_large_indel.vcf"))
    assert calls
    tp = 0
    for t in truth:
        if t.svtype not in ("DEL", "INS"):
            continue
        for r in calls:
            if (r.svtype == t.svtype and abs(r.pos - 1 - t.pos) <= 500
                    and min(r.svlen, t.svlen) / max(r.svlen, t.svlen) >= 0.6):
                tp += 1
                break
    assert tp >= 5, (tp, len(calls))


def test_2hap_phased_gt_without_ps(twohap_run):
    _truth, out = twohap_run
    _h, calls = read_vcf(os.path.join(out, "volcanosv_large_indel.vcf"))
    for r in calls:
        assert r.gt in ("1|0", "0|1", "1|1"), r.gt
        # no PS<pb>_ prefix on 2hap contigs → no PS field injected
        assert "PS" not in r.info
        assert "TIG_REGION" in r.info
