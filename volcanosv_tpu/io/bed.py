"""BED I/O (replaces the bedtools dependency of hybrid mode;
ref: write_fastq_asm_general.py:8-39, volcanosv-asm_hybrid.py:118-124)."""
from __future__ import annotations

import gzip


def read_bed(path: str) -> dict[str, list[tuple[int, int]]]:
    op = gzip.open if str(path).endswith(".gz") else open
    out: dict[str, list[tuple[int, int]]] = {}
    with op(path, "rt") as fh:
        for line in fh:
            if line.startswith(("#", "track", "browser")) or not line.strip():
                continue
            f = line.split("\t")
            out.setdefault(f[0], []).append((int(f[1]), int(f[2])))
    for v in out.values():
        v.sort()
    return out


def write_bed(path: str, rows) -> None:
    """rows: iterable of (chrom, start, end[, name...])."""
    with open(path, "w") as fh:
        for row in rows:
            fh.write("\t".join(str(x) for x in row) + "\n")
