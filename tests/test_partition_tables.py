"""Flat-stream k-mer table building (partition.build_hap_tables rewrite):
exact counts vs the numpy oracle, incl. chunk-boundary and separator
semantics — no chimeric k-mers across read joints, each window counted
exactly once across the fixed-size chunk seam."""
import numpy as np

import volcanosv_tpu.partition.partition as pp
from volcanosv_tpu.ops.kmer import count_kmers_dense_np
from volcanosv_tpu.ops.pack import encode_seq


def _oracle(seqs, k):
    return count_kmers_dense_np([encode_seq(s) for s in seqs], k)


def _mk(rng, L):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, L))


def test_flat_tables_match_oracle(rng):
    k = 8
    seqs = [_mk(rng, L) for L in (500, 301, 50, 7, 8, 1203)]
    tabs = pp.build_hap_tables({"h": seqs}, k)
    got = np.asarray(tabs["h"])
    want = _oracle(seqs, k)
    assert np.array_equal(got, want)


def test_flat_tables_chunk_seam(rng, monkeypatch):
    """Force a tiny _FLAT so reads straddle many chunk seams."""
    monkeypatch.setattr(pp, "_FLAT", 256)
    k = 6
    seqs = [_mk(rng, L) for L in (100, 700, 255, 256, 257, 31)]
    tabs = pp.build_hap_tables({"h": seqs}, k)
    assert np.array_equal(np.asarray(tabs["h"]), _oracle(seqs, k))


def test_no_chimeric_kmers(rng):
    k = 10
    a, b = _mk(rng, 40), _mk(rng, 40)
    tabs = pp.build_hap_tables({"h": [a, b]}, k)
    got = np.asarray(tabs["h"])
    want = _oracle([a, b], k)
    assert np.array_equal(got, want)
    # the concatenated junction k-mers must NOT be counted
    chim = _oracle([a + b], k) - want
    overlap_positions = chim > 0
    assert not (got[overlap_positions] - want[overlap_positions]).any()


def test_empty_and_n_reads(rng):
    k = 8
    tabs = pp.build_hap_tables({"h": [], "g": ["ACGNNNNNNNNNNGT"]}, k)
    assert int(np.asarray(tabs["h"]).sum()) == 0
    # all windows contain an N → zero counts
    assert int(np.asarray(tabs["g"]).sum()) == 0


def test_read_hashes_batch_padding(rng):
    seqs = [_mk(rng, 100), _mk(rng, 50)]
    h, v, n_real = pp._read_hashes(seqs, 8)
    assert n_real == 2
    assert h.shape[0] == pp._CHUNK            # padded batch dim
    v = np.asarray(v)
    assert v[0].sum() == 100 - 8 + 1
    assert v[1].sum() == 50 - 8 + 1
    assert not v[2:].any()                    # padding rows all invalid
