"""Native columnar BAM scanner (bamscan.cpp) vs the Python reader."""
import numpy as np
import pytest

from volcanosv_tpu.io.bam import (BamReader, BamRecord, BamWriter,
                                  cigar_from_string, scan_bam)


@pytest.fixture(scope="module")
def bam_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bam") / "t.bam")
    rng = np.random.default_rng(0)
    refs, lens = ["chr1", "chr2"], [10_000, 5_000]
    recs = []
    for i in range(500):
        L = int(rng.integers(50, 400))
        seq = "".join("ACGTN"[j] for j in rng.integers(0, 5, L))
        flag = 0 if i % 7 else 0x100                 # some secondary
        if i % 11 == 0:
            flag |= 0x800
        recs.append(BamRecord(
            name=f"read{i}", flag=flag, ref_id=i % 2,
            pos=int(rng.integers(0, 4000)), mapq=int(rng.integers(0, 61)),
            cigar=cigar_from_string(f"5S{L - 10}M5S"),
            seq=seq, tags={"HP": 1 + i % 2, "PS": 77}))
    with BamWriter(path, refs, lens) as w:
        for r in recs:
            w.write(r)
    return path, recs


def test_scan_matches_python_reader(bam_path):
    path, _ = bam_path
    sc = scan_bam(path)
    assert sc is not None, "native lib unavailable"
    with BamReader(path) as br:
        py = list(br)
        assert sc.references == br.references
        assert sc.lengths == br.lengths
    assert len(sc) == len(py)
    for i in (0, 1, 7, 123, len(py) - 1):
        r = py[i]
        assert sc.name(i) == r.name
        assert int(sc.flag[i]) == r.flag
        assert int(sc.ref_id[i]) == r.ref_id
        assert int(sc.pos[i]) == r.pos
        assert int(sc.mapq[i]) == r.mapq
        assert sc.seq(i) == r.seq
        assert np.array_equal(sc.cigar(i), r.cigar)


def test_scan_records_generator(bam_path):
    path, _ = bam_path
    sc = scan_bam(path)
    with BamReader(path) as br:
        for nat, py in zip(sc.records(), br):
            assert nat.name == py.name and nat.seq == py.seq
            assert nat.flag == py.flag and nat.pos == py.pos


def test_read_seqs_skips_secondary(bam_path):
    path, recs = bam_path
    sc = scan_bam(path)
    seqs = sc.read_seqs()
    expect = {r.name: r.seq for r in recs
              if not (r.flag & 0x900) and r.seq}
    assert seqs == expect


def test_scan_missing_file():
    with pytest.raises(ValueError):
        scan_bam("/nonexistent/x.bam")
