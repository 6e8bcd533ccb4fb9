"""Windowed-POA consensus (assembly/olc._consensus_poa) vs the plain
per-column draft vote at CLR/ONT-class noise.

The reference polishes every assembly with partial-order alignment
(hifiasm POA.cpp, wtpoa-cns invoked at General_Assembly_Workflow.py:69-73):
correlated indel errors in homopolymers make independent per-column draft
votes diverge, while aligning all window substrings to ONE backbone
(the POA property) lines the errors up so majority vote resolves them."""
import numpy as np
import pytest

from volcanosv_tpu.aligner import Aligner
from volcanosv_tpu.config import AlignConfig
from volcanosv_tpu.sim import random_genome, simulate_reads


def _identity(cons: str, truth: str) -> float:
    """Infix consensus identity: errors per consensus base against the
    best-matching region of the truth (free truth ends — the polisher
    legitimately trims unpolishable contig tips), best of both strands."""
    import jax.numpy as jnp
    from volcanosv_tpu.ops.banded_align import Scores, banded_align_scan
    from volcanosv_tpu.ops.pack import encode_seq, revcomp_seq

    def infix_dist(a: str, b: str) -> int:
        q = encode_seq(a)
        t = encode_seq(b)
        M = -(-len(q) // 8) * 8
        W = 1024
        qp = np.full((1, M), 4, np.int8)
        qp[0, :len(q)] = q
        tp = np.full((1, max(len(t), M + W // 2)), 4, np.int8)
        tp[0, :len(t)] = t
        s, _tb, _ej = banded_align_scan(
            qp, tp, np.array([len(q)], np.int32),
            np.array([len(t)], np.int32), W=W, d_lo=-(W // 2),
            scores=Scores.edit(), with_traceback=False,
            free_t_start=True, free_t_end=True)
        return -int(np.asarray(s)[0])

    d = min(infix_dist(cons, truth), infix_dist(cons, revcomp_seq(truth)))
    return 1.0 - d / max(len(cons), 1)


def _make_case(err: float, seed: int = 3, L: int = 5000, cov: float = 40.0):
    rng = np.random.default_rng(seed)
    ref = random_genome(rng, L)
    truth = ref["chr1"]
    # full-length reads (read_len_sd=0) so every consensus window has the
    # full depth; strand is still random
    reads = simulate_reads(rng, {1: ref}, coverage=cov, read_len=L,
                           read_len_sd=0, sub_rate=err / 2,
                           indel_rate=err / 2)
    read_seqs = [s for _n, s, *_ in reads]
    # draft = one noisy read (what a layout seed gives before polish)
    draft = read_seqs[0]
    return truth, draft, read_seqs


def _align_reads(draft: str, read_seqs: list[str]):
    al = Aligner({"d": draft}, AlignConfig.preset("map-pb"))
    queries = [(f"r{i}", s) for i, s in enumerate(read_seqs)]
    return al.to_bam_records(al.align(queries), dict(queries))


def test_poa_beats_column_vote_at_noise():
    """≥5%-error case where the old per-column draft vote stays below
    99.9% identity and the windowed POA reaches it (VERDICT round-2 #8)."""
    from volcanosv_tpu.assembly.olc import _consensus_edit, _consensus_poa
    truth, draft, read_seqs = _make_case(err=0.06)
    recs = _align_reads(draft, read_seqs)
    assert recs

    poa = _consensus_poa(draft, recs)
    # second round: realign to the improved backbone
    poa = _consensus_poa(poa, _align_reads(poa, read_seqs))
    id_poa = _identity(poa, truth)

    vote = _consensus_edit(draft, recs)
    vote = _consensus_edit(vote, _align_reads(vote, read_seqs))
    id_vote = _identity(vote, truth)

    assert id_poa >= 0.999, (id_poa, id_vote)
    assert id_poa > id_vote, (id_poa, id_vote)
    assert id_vote < 0.999, f"column vote unexpectedly strong: {id_vote}"


def test_poa_clean_reads_majority_fast_path():
    """HiFi-class reads: exact-majority windows dominate (fast path) and
    the consensus is near-perfect."""
    from volcanosv_tpu.assembly.olc import _consensus_poa
    truth, draft, read_seqs = _make_case(err=0.004, seed=5)
    recs = _align_reads(draft, read_seqs)
    poa = _consensus_poa(draft, recs)
    assert _identity(poa, truth) >= 0.9995
