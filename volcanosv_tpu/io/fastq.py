"""FASTQ I/O.

The reference writes per-haplotype FASTQs with fake '!' quals
(write_fastq_asm_general.py:116); we keep quals optional everywhere.
"""
from __future__ import annotations

import gzip
from typing import Iterable, Iterator


def _open(path: str, mode: str = "rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fastq(path: str) -> Iterator[tuple[str, str, str]]:
    """Yield (name, seq, qual)."""
    with _open(path) as fh:
        while True:
            h = fh.readline()
            if not h:
                return
            seq = fh.readline().rstrip()
            fh.readline()  # '+'
            qual = fh.readline().rstrip()
            yield h.rstrip()[1:].split()[0], seq, qual


def write_fastq(path: str, records: Iterable[tuple[str, str, str | None]]) -> int:
    n = 0
    with _open(path, "wt") as fh:
        for name, seq, qual in records:
            if qual is None:
                qual = "!" * len(seq)
            fh.write(f"@{name}\n{seq}\n+\n{qual}\n")
            n += 1
    return n
