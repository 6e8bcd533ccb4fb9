"""Chaining: exact substring, indel-split, revcomp, native-vs-numpy parity."""
import numpy as np

from volcanosv_tpu.config import AlignConfig
from volcanosv_tpu.ops import MinimizerIndex, sketch_np, encode_seq, revcomp_codes
from volcanosv_tpu.ops.chain import chain_anchors, _chain_dp_np, _backtrack_np
from volcanosv_tpu.native import get_lib


def _anchors_for(idx, q, cfg):
    qp, qh, qs = sketch_np(encode_seq(q), cfg.k, cfg.w)
    return idx.anchors(qp, qh, qs)


def test_single_chain_exact(rng):
    ref = "".join(rng.choice(list("ACGT"), 30000))
    cfg = AlignConfig.preset("asm5")
    idx = MinimizerIndex.build({"chr1": ref}, cfg.k, cfg.w)
    q = ref[10000:12000]
    t_pos, q_pos, strand = _anchors_for(idx, q, cfg)
    chains = chain_anchors(t_pos, q_pos, strand, len(q), cfg)
    assert len(chains) >= 1
    c = chains[0]
    assert c.strand == 1
    assert abs(c.t_start - 10000) < 50 and abs(c.t_end - 12000) < 50
    assert c.q_start < 50 and c.q_end > 1950


def test_chain_revcomp(rng):
    ref = "".join(rng.choice(list("ACGT"), 30000))
    cfg = AlignConfig.preset("asm5")
    idx = MinimizerIndex.build({"chr1": ref}, cfg.k, cfg.w)
    from volcanosv_tpu.ops.pack import decode_codes
    q = decode_codes(revcomp_codes(encode_seq(ref[5000:7000])))
    t_pos, q_pos, strand = _anchors_for(idx, q, cfg)
    chains = chain_anchors(t_pos, q_pos, strand, len(q), cfg)
    assert chains and chains[0].strand == -1
    assert abs(chains[0].t_start - 5000) < 50


def test_chain_spans_deletion(rng):
    """A 500bp deletion within chaining bandwidth stays one chain."""
    ref = "".join(rng.choice(list("ACGT"), 30000))
    cfg = AlignConfig.preset("asm5")
    idx = MinimizerIndex.build({"chr1": ref}, cfg.k, cfg.w)
    q = ref[8000:10000] + ref[10500:12500]  # 500bp deletion
    t_pos, q_pos, strand = _anchors_for(idx, q, cfg)
    chains = chain_anchors(t_pos, q_pos, strand, len(q), cfg)
    c = chains[0]
    assert c.n_anchors > 50
    assert c.t_end - c.t_start > 4300  # spans the deletion
    assert c.q_end - c.q_start > 3800


def test_split_chains_for_translocation(rng):
    """Query made of two distant ref pieces → two chains (split-read signal)."""
    ref = "".join(rng.choice(list("ACGT"), 50000))
    cfg = AlignConfig.preset("asm5")
    idx = MinimizerIndex.build({"chr1": ref}, cfg.k, cfg.w)
    q = ref[5000:7000] + ref[30000:32000]
    t_pos, q_pos, strand = _anchors_for(idx, q, cfg)
    chains = chain_anchors(t_pos, q_pos, strand, len(q), cfg)
    assert len(chains) >= 2
    starts = sorted(c.t_start for c in chains[:2])
    assert abs(starts[0] - 5000) < 100 and abs(starts[1] - 30000) < 100


def test_native_matches_numpy(rng):
    lib = get_lib()
    assert lib is not None, "native chain lib must build"
    n = 500
    t = np.sort(rng.integers(0, 100000, n)).astype(np.int64)
    q = (t + rng.integers(-50, 50, n)).astype(np.int64)
    order = np.lexsort((q, t))
    t, q = t[order], q[order]
    f_np, pre_np = _chain_dp_np(q, t, 19, 48, 5000, 2000, 0.05)
    f_c = np.zeros(n, np.float32)
    pre_c = np.zeros(n, np.int32)
    lib.chain_dp(q, t, n, 19, 48, 5000, 2000, 0.05, f_c, pre_c)
    np.testing.assert_allclose(f_np, f_c, rtol=1e-5)
    assert (pre_np == pre_c).mean() > 0.99  # ties may break differently
