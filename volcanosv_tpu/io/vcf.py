"""VCF read/write with the INFO fields the pipeline emits.

Replaces the reference's string-bashing VCF code (write_vcf at
extract_contig_signature_Hifi.py:678-714, header generation at
volcanosv-vc-large-indel.py:104-131, Merge_VCF.py header merging).
"""
from __future__ import annotations

import gzip
from dataclasses import dataclass, field
from typing import Iterable, Iterator

HEADER_ORDER = ["fileformat", "source", "FILTER", "INFO", "FORMAT", "contig"]

STANDARD_INFO = [
    '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type of structural variant">',
    '##INFO=<ID=SVLEN,Number=1,Type=Integer,Description="Length of structural variant">',
    '##INFO=<ID=END,Number=1,Type=Integer,Description="End position of structural variant">',
    '##INFO=<ID=TIG_REGION,Number=1,Type=String,Description="Contig region of variant">',
    '##INFO=<ID=QUERY_STRAND,Number=1,Type=String,Description="Contig strand">',
    '##INFO=<ID=SIG_SOURCE,Number=1,Type=String,Description="Signature source: CIGAR/SPLIT">',
    '##INFO=<ID=TIG_MAPQ,Number=1,Type=Integer,Description="Contig alignment MAPQ">',
    '##INFO=<ID=CollapseId,Number=1,Type=String,Description="Redundancy component id">',
    '##INFO=<ID=CONTEXT,Number=1,Type=String,Description="Context sequence window">',
    '##INFO=<ID=READS,Number=.,Type=String,Description="Supporting contig names">',
    '##INFO=<ID=SUPPORT,Number=1,Type=Integer,Description="Read signature support">',
    '##INFO=<ID=CHR2,Number=1,Type=String,Description="Mate chromosome for BND">',
]
STANDARD_FORMAT = [
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
    '##FORMAT=<ID=PS,Number=1,Type=Integer,Description="Phase set">',
]


@dataclass
class VcfRecord:
    chrom: str
    pos: int                      # 1-based, VCF convention
    id: str
    ref: str
    alt: str
    qual: str = "."
    filter: str = "PASS"
    info: dict = field(default_factory=dict)
    gt: str = "./."
    ps: int | None = None

    @property
    def svtype(self) -> str:
        return self.info.get("SVTYPE", "")

    @property
    def svlen(self) -> int:
        if "SVLEN" in self.info:
            return abs(int(self.info["SVLEN"]))
        return abs(len(self.alt) - len(self.ref))

    def format_info(self) -> str:
        if not self.info:
            return "."
        parts = []
        for k, v in self.info.items():
            if v is True:
                parts.append(k)
            else:
                parts.append(f"{k}={v}")
        return ";".join(parts)

    def to_line(self) -> str:
        fmt = "GT"
        sample = self.gt
        if self.ps is not None:
            fmt += ":PS"
            sample += f":{self.ps}"
        return "\t".join(
            [self.chrom, str(self.pos), self.id, self.ref, self.alt,
             str(self.qual), self.filter, self.format_info(), fmt, sample]
        )


def _parse_info(s: str) -> dict:
    info: dict = {}
    if s == ".":
        return info
    for kv in s.split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            info[k] = v
        elif kv:
            info[kv] = True
    return info


def parse_vcf_line(line: str) -> VcfRecord:
    f = line.rstrip("\n").split("\t")
    rec = VcfRecord(f[0], int(f[1]), f[2], f[3], f[4],
                    f[5] if len(f) > 5 else ".",
                    f[6] if len(f) > 6 else "PASS",
                    _parse_info(f[7]) if len(f) > 7 else {})
    if len(f) > 9:
        fmt = f[8].split(":")
        sample = f[9].split(":")
        d = dict(zip(fmt, sample))
        rec.gt = d.get("GT", "./.")
        if "PS" in d and d["PS"] not in (".", ""):
            try:
                rec.ps = int(d["PS"])
            except ValueError:
                rec.ps = None
    return rec


def read_vcf(path: str) -> tuple[list[str], list[VcfRecord]]:
    """Returns (header_lines, records)."""
    op = gzip.open if str(path).endswith(".gz") else open
    header: list[str] = []
    records: list[VcfRecord] = []
    with op(path, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                header.append(line.rstrip("\n"))
            elif line.strip():
                records.append(parse_vcf_line(line))
    return header, records


def make_header(contigs: dict[str, int], sample: str = "Sample",
                source: str = "volcanosv_tpu") -> list[str]:
    lines = ["##fileformat=VCFv4.2", f"##source={source}"]
    lines += STANDARD_INFO + STANDARD_FORMAT
    for name, length in contigs.items():
        lines.append(f"##contig=<ID={name},length={length}>")
    lines.append(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + sample
    )
    return lines


def write_vcf(path: str, header: list[str], records: Iterable[VcfRecord],
              sort: bool = True) -> int:
    records = list(records)
    if sort:
        records.sort(key=lambda r: (r.chrom, r.pos))
    op = gzip.open if str(path).endswith(".gz") else open
    with op(path, "wt") as fh:
        for h in header:
            fh.write(h + "\n")
        for rec in records:
            fh.write(rec.to_line() + "\n")
    return len(records)


class VcfWriter:
    def __init__(self, path: str, contigs: dict[str, int], sample: str = "Sample"):
        self.path = path
        self.header = make_header(contigs, sample)
        self.records: list[VcfRecord] = []

    def add(self, rec: VcfRecord) -> None:
        self.records.append(rec)

    def close(self) -> int:
        return write_vcf(self.path, self.header, self.records)


def merge_vcfs(paths: list[str], out_path: str) -> int:
    """Merge per-type VCFs: union headers (contig de-dup, key order as
    Merge_VCF.py HEADER_ORDER:6-13), concat+sort records."""
    seen: set[str] = set()
    buckets: dict[str, list[str]] = {k: [] for k in HEADER_ORDER}
    chrom_line = None
    all_records: list[VcfRecord] = []
    for p in paths:
        header, recs = read_vcf(p)
        all_records.extend(recs)
        for h in header:
            if h.startswith("#CHROM"):
                chrom_line = h
                continue
            key = h[2:].split("=", 1)[0] if h.startswith("##") else h
            if h in seen:
                continue
            seen.add(h)
            buckets.setdefault(key, []).append(h)
    merged: list[str] = []
    for k in HEADER_ORDER:
        merged += buckets.pop(k, [])
    for k in sorted(buckets):
        merged += buckets[k]
    if chrom_line:
        merged.append(chrom_line)
    return write_vcf(out_path, merged, all_records)
