"""I/O round-trip tests: FASTA/FASTQ/BGZF/BAM/VCF written and read back."""
import numpy as np

from volcanosv_tpu.io import (
    BamReader, BamWriter, BamRecord, BgzfReader, BgzfWriter,
    read_fasta, write_fasta, read_fastq, write_fastq,
    read_vcf, write_vcf,
)
from volcanosv_tpu.io.bam import cigar_from_string
from volcanosv_tpu.io.fasta import FastaIndex
from volcanosv_tpu.io.vcf import VcfRecord, make_header


def test_fasta_roundtrip(tmp_path):
    seqs = {"chr1": "ACGT" * 50, "chr2": "GGCCTTAA" * 13}
    p = str(tmp_path / "x.fa")
    write_fasta(p, seqs, width=23)
    assert read_fasta(p) == seqs


def test_fasta_index_fetch(tmp_path):
    seqs = {"chr1": "ACGTACGTTT" * 37, "chr2": "TTGGCCAA" * 11}
    p = str(tmp_path / "x.fa")
    write_fasta(p, seqs, width=60)
    idx = FastaIndex(p)
    assert idx.length("chr1") == 370
    assert idx.fetch("chr1", 55, 133) == seqs["chr1"][55:133]
    assert idx.fetch("chr2", 0, 8) == "TTGGCCAA"
    assert idx.fetch("chr2", 80) == seqs["chr2"][80:]


def test_fastq_roundtrip(tmp_path):
    recs = [("r1", "ACGT", "IIII"), ("r2", "GGAA", None)]
    p = str(tmp_path / "x.fastq")
    write_fastq(p, recs)
    out = list(read_fastq(p))
    assert out[0] == ("r1", "ACGT", "IIII")
    assert out[1] == ("r2", "GGAA", "!!!!")


def test_bgzf_roundtrip(tmp_path):
    data = bytes(np.random.default_rng(1).integers(0, 256, 300_000, dtype=np.uint8))
    p = str(tmp_path / "x.bgzf")
    with BgzfWriter(p) as w:
        for i in range(0, len(data), 7777):
            w.write(data[i : i + 7777])
    with BgzfReader(p) as r:
        assert r.read_all() == data


def test_bam_roundtrip(tmp_path):
    p = str(tmp_path / "x.bam")
    rec = BamRecord(
        name="read1", flag=16, ref_id=0, pos=99, mapq=60,
        cigar=cigar_from_string("5S10M2I3D20M1H"),
        seq="ACGTACGTACGTACGTACGTACGTACGTACGTACGTA",
        qual=np.full(37, 30, np.uint8),
        tags={"HP": 1, "PS": 1234, "SA": "chr1,5,+,10M,60,2;"},
    )
    with BamWriter(p, ["chr1", "chr2"], [1000, 2000]) as w:
        w.write(rec)
        w.write(BamRecord(name="read2", flag=4, seq="ACGT"))
    with BamReader(p) as r:
        assert r.references == ["chr1", "chr2"]
        got = list(r)
    g = got[0]
    assert g.name == "read1" and g.pos == 99 and g.mapq == 60
    assert g.cigar_string() == "5S10M2I3D20M1H"
    assert g.seq == rec.seq
    assert g.tags["HP"] == 1 and g.tags["PS"] == 1234
    assert g.tags["SA"].startswith("chr1,5,+")
    assert g.is_reverse and g.is_primary
    assert g.reference_length() == 33
    assert g.query_clips() == (5, 1)
    assert got[1].is_unmapped


def test_vcf_roundtrip(tmp_path):
    p = str(tmp_path / "x.vcf")
    hdr = make_header({"chr1": 1000})
    recs = [
        VcfRecord("chr1", 100, "DEL1", "A" * 50, "A",
                  info={"SVTYPE": "DEL", "SVLEN": -49, "END": 149},
                  gt="0/1", ps=7),
        VcfRecord("chr1", 50, "INS1", "T", "T" + "G" * 40,
                  info={"SVTYPE": "INS", "SVLEN": 40}, gt="1/1"),
    ]
    write_vcf(p, hdr, recs)
    header, got = read_vcf(p)
    assert got[0].pos == 50  # sorted
    assert got[1].info["SVTYPE"] == "DEL"
    assert got[1].gt == "0/1" and got[1].ps == 7
    assert got[0].svlen == 40
