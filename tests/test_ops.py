"""Unit tests for pack/kmer/minimizer ops against naive oracles."""
import numpy as np
import pytest

from volcanosv_tpu.ops import (
    encode_seq, decode_codes, revcomp_codes, pad_codes,
    kmer_hashes_np, kmer_hashes, count_kmers_dense, canonical_hashes,
    MinimizerIndex, sketch_np,
)


def test_encode_decode():
    s = "ACGTNacgtX"
    codes = encode_seq(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert decode_codes(codes) == "ACGTNACGTN"


def test_revcomp():
    assert decode_codes(revcomp_codes(encode_seq("AACGT"))) == "ACGTT"


def test_kmer_hash_matches_naive(rng):
    seq = "".join(rng.choice(list("ACGT"), 100))
    codes = encode_seq(seq)
    k = 5
    h, valid = kmer_hashes_np(codes, k)
    assert valid.all()
    # naive
    for i in range(0, 96, 17):
        val = 0
        for c in codes[i : i + k]:
            val = val * 4 + int(c)
        assert h[i] == val


def test_kmer_hash_device_matches_host(rng):
    seqs = ["".join(rng.choice(list("ACGT"), 60)) for _ in range(4)]
    seqs[2] = seqs[2][:20] + "N" + seqs[2][21:]
    codes, lens = pad_codes([encode_seq(s) for s in seqs], pad_to=64)
    k = 7
    hd, vd = kmer_hashes(codes, k)
    hd, vd = np.asarray(hd), np.asarray(vd)
    for b, s in enumerate(seqs):
        hh, vv = kmer_hashes_np(encode_seq(s), k)
        n = len(hh)
        assert (hd[b, :n][vv] == hh[vv]).all()
        assert (vd[b, :n] == vv).all()
        # padded tail windows include CODE_N → invalid
        assert not vd[b, n:].any()


def test_count_kmers_dense(rng):
    k = 4
    seqs = ["".join(rng.choice(list("ACGT"), 50)) for _ in range(8)]
    codes, lens = pad_codes([encode_seq(s) for s in seqs], pad_to=64)
    h, v = kmer_hashes(codes, k)
    table = np.asarray(count_kmers_dense(h, v, k))
    # naive
    naive = np.zeros(4**k, np.int64)
    for s in seqs:
        hh, vv = kmer_hashes_np(encode_seq(s), k)
        np.add.at(naive, hh[vv], 1)
    assert (table == naive).all()


def test_canonical_hashes():
    k = 5
    fwd = encode_seq("ACGTT")
    rc = encode_seq("AACGT")
    hf, _ = kmer_hashes_np(fwd, k)
    hr, _ = kmer_hashes_np(rc, k)
    cf = np.asarray(canonical_hashes(np.array([[hf[0]]], np.int32), k))
    cr = np.asarray(canonical_hashes(np.array([[hr[0]]], np.int32), k))
    assert cf[0, 0] == cr[0, 0]


def test_sketch_density(rng):
    seq = "".join(rng.choice(list("ACGT"), 5000))
    pos, h, strand = sketch_np(encode_seq(seq), k=15, w=10)
    # expected density ~ 2/(w+1)
    assert 2 * 5000 / 11 * 0.5 < len(pos) < 2 * 5000 / 11 * 1.8
    assert (np.diff(pos) > 0).all()


def test_sketch_strand_symmetry(rng):
    """Minimizers of revcomp land at mirrored positions with same hashes."""
    seq = "".join(rng.choice(list("ACGT"), 2000))
    codes = encode_seq(seq)
    k, w = 15, 10
    p1, h1, s1 = sketch_np(codes, k, w)
    p2, h2, s2 = sketch_np(revcomp_codes(codes), k, w)
    assert sorted(h1) == sorted(h2)


def test_minimizer_index_anchor_lookup(rng):
    ref = "".join(rng.choice(list("ACGT"), 20000))
    idx = MinimizerIndex.build({"chr1": ref}, k=15, w=10)
    # exact substring query → anchors on the right diagonal
    q = ref[5000:6000]
    qp, qh, qs = sketch_np(encode_seq(q), 15, 10)
    t_pos, q_pos, strand = idx.anchors(qp, qh, qs)
    diag = t_pos - q_pos
    # dominant diagonal = 5000, forward strand
    vals, counts = np.unique(diag[strand == 1], return_counts=True)
    assert vals[np.argmax(counts)] == 5000
    assert counts.max() >= 0.8 * len(qp)


def test_minimizer_index_revcomp_query(rng):
    ref = "".join(rng.choice(list("ACGT"), 20000))
    idx = MinimizerIndex.build({"chr1": ref}, k=15, w=10)
    q = decode_codes(revcomp_codes(encode_seq(ref[5000:6000])))
    qp, qh, qs = sketch_np(encode_seq(q), 15, 10)
    t_pos, q_pos, strand = idx.anchors(qp, qh, qs)
    assert (strand == -1).sum() >= 0.8 * len(qp)
