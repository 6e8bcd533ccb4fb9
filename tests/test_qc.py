"""Coverage-HMM assembly QC (Flagger equivalent)."""
import numpy as np

from volcanosv_tpu.config import QCConfig
from volcanosv_tpu.io.bam import BamRecord
from volcanosv_tpu.qc import CoverageHMM, evaluate_assembly
from volcanosv_tpu.qc.flagger import contig_coverage_windows


def test_viterbi_recovers_collapsed_block():
    rng = np.random.default_rng(0)
    lam = 20.0
    # contig: hap(40 windows) | collapsed(20) | hap(40)
    truth = np.array([2] * 40 + [3] * 20 + [2] * 40)
    mult = np.array([0.05, 0.5, 1.0, 2.0])[truth]
    cov = rng.poisson(lam * mult).astype(float)[None, :]
    valid = np.ones_like(cov, bool)
    hmm = CoverageHMM.from_lambda(lam)
    states = hmm.viterbi(cov, valid)[0]
    assert (states == truth).mean() > 0.9, (states.tolist())


def test_posteriors_sum_to_one():
    rng = np.random.default_rng(1)
    cov = rng.poisson(15.0, (2, 30)).astype(float)
    valid = np.ones_like(cov, bool)
    post = CoverageHMM.from_lambda(15.0).posteriors(cov, valid)
    np.testing.assert_allclose(post.sum(-1), 1.0, atol=1e-4)


def _fake_read(name, ref_id, pos, length):
    return BamRecord(name=name, flag=0, ref_id=ref_id, pos=pos, mapq=60,
                     cigar=np.array([[0, length]], np.int64), seq="A" * 4)


def test_evaluate_assembly_flags_collapsed_contig():
    rng = np.random.default_rng(2)
    contigs = {"PS1_1_30000_hp1_0": "A" * 30_000,
               "PS2_1_30000_hp2_0": "A" * 30_000}
    names = list(contigs)
    reads = []
    rid = 0
    # contig 0: uniform 1x-ish coverage (10 overlapping reads per 5kb)
    for start in range(0, 28_000, 500):
        reads.append(_fake_read(f"r{rid}", 0, start, 5_000)); rid += 1
    # contig 1: same base coverage but doubled over the middle 10kb
    for start in range(0, 28_000, 500):
        reads.append(_fake_read(f"r{rid}", 1, start, 5_000)); rid += 1
    for start in range(10_000, 18_000, 250):
        reads.append(_fake_read(f"r{rid}", 1, start, 5_000)); rid += 1
    res = evaluate_assembly(contigs, reads, names, QCConfig())
    assert "PS2_1_30000_hp2_0" in res.collapsed
    assert "PS1_1_30000_hp1_0" not in res.collapsed
    blocks = res.blocks("PS2_1_30000_hp2_0", 3)
    assert blocks and blocks[0][0] >= 8_000 and blocks[0][1] <= 26_000, blocks


def test_coverage_windows_partial_tail():
    lens = {"c": 2_500}
    reads = [_fake_read("r", 0, 0, 2_500)]
    cov = contig_coverage_windows(reads, lens, ["c"], window=1_000)["c"]
    assert len(cov) == 3
    np.testing.assert_allclose(cov, [1, 1, 1])


def test_em_fit_recovers_skewed_state_means():
    """EM fit (hmm_flagger.c role): real collapsed regions sit below 2×λ
    (mapping bias siphons reads away), so fixed multipliers put them on the
    hap side of the decision boundary and the block is missed; the fitted
    per-state means recover it."""
    from volcanosv_tpu.qc.flagger import fit_coverage_hmm

    rng = np.random.default_rng(3)
    lam = 24.0
    # hap 100 windows at λ | collapsed 60 at 1.4λ (skewed!) | err 20
    truth = np.array([2] * 100 + [3] * 60 + [0] * 20)
    mult = np.array([0.05, 0.5, 1.0, 1.4])[truth]
    cov = rng.poisson(lam * mult).astype(float)[None, :]
    valid = np.ones_like(cov, bool)

    fixed = CoverageHMM.from_lambda(float(np.median(cov[cov > 0.5])))
    fixed_col = (fixed.viterbi(cov, valid)[0][100:160] == 3).mean()

    hmm = fit_coverage_hmm(cov, valid, QCConfig())
    assert abs(hmm.lam - lam) / lam < 0.10, hmm.lam
    em_col = (hmm.viterbi(cov, valid)[0][100:160] == 3).mean()
    assert em_col >= 0.8, (em_col, fixed_col)
    assert em_col > fixed_col          # the fit is what recovers the block


def test_em_overdispersion_stops_false_collapsed_flags():
    """Real coverage is overdispersed (var >> mean: GC/mapping bias).  The
    fixed Poisson model flags noise excursions in haploid regions as
    collapsed; the fitted dispersion index (τ) widens the states and
    removes the false flags while the true 2× block still classifies."""
    rng = np.random.default_rng(4)
    lam, T = 30.0, 300
    truth = np.array([2] * 200 + [3] * 60 + [2] * 40)
    mult = np.array([0.05, 0.5, 1.0, 2.0])[truth]
    # gamma-mixed Poisson: var = μ + μ²/6 (≈6 × Poisson at this depth)
    g = rng.gamma(6.0, 1 / 6.0, T)
    cov = rng.poisson(lam * mult * g).astype(float)[None, :]
    valid = np.ones_like(cov, bool)

    fixed = CoverageHMM.from_lambda(float(np.median(cov[cov > 0.5])))
    fs = fixed.viterbi(cov, valid)[0]
    assert (fs[:200] == 3).sum() >= 5          # fixed model false-flags

    from volcanosv_tpu.qc.flagger import fit_coverage_hmm
    hmm = fit_coverage_hmm(cov, valid, QCConfig())
    assert hmm.tau > 2.0, hmm.tau
    es = hmm.viterbi(cov, valid)[0]
    assert (es[:200] == 3).sum() == 0, (es[:200] == 3).sum()
    assert (es[200:260] == 3).mean() > 0.9     # true block still found
    assert (es == truth).mean() > (fs == truth).mean()


def test_n_states_ladder():
    from volcanosv_tpu.qc.flagger import state_mults, state_names
    assert len(state_mults(3)) == 3 and len(state_names(5)) == 5
    import dataclasses
    cfg = dataclasses.replace(QCConfig(), n_states=5)
    rng = np.random.default_rng(5)
    cov = rng.poisson(20.0, (1, 60)).astype(float)
    from volcanosv_tpu.qc.flagger import fit_coverage_hmm
    hmm = fit_coverage_hmm(cov, np.ones_like(cov, bool), cfg)
    assert len(hmm.means) == 5
