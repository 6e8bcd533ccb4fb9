"""FASTA read/write + .fai-style index (replaces samtools faidx usage).

ref: split_reference at volcanosv-vc-large-indel.py:137-151 splits the genome
per chromosome with `samtools faidx`; we keep the genome as a dict and slice.
"""
from __future__ import annotations

import gzip
import io
import os


def _open(path: str, mode: str = "rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fasta(path: str) -> dict[str, str]:
    """Read a (optionally gzipped) FASTA into {name: seq} (uppercased)."""
    seqs: dict[str, str] = {}
    name = None
    chunks: list[str] = []
    with _open(path) as fh:
        for line in fh:
            line = line.rstrip()
            if not line:
                continue
            if line[0] == ">":
                if name is not None:
                    seqs[name] = "".join(chunks).upper()
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            seqs[name] = "".join(chunks).upper()
    return seqs


def write_fasta(path: str, seqs: dict[str, str], width: int = 80) -> None:
    with _open(path, "wt") as fh:
        for name, seq in seqs.items():
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")


class FastaIndex:
    """samtools-faidx-compatible index: random access without loading genome."""

    def __init__(self, path: str):
        self.path = path
        self.index: dict[str, tuple[int, int, int, int]] = {}
        fai = path + ".fai"
        if os.path.exists(fai):
            with open(fai) as fh:
                for line in fh:
                    name, ln, off, lb, lw = line.split("\t")[:5]
                    self.index[name] = (int(ln), int(off), int(lb), int(lw))
        else:
            self._build()

    def _build(self) -> None:
        with open(self.path, "rb") as fh:
            name = None
            length = 0
            offset = 0
            linebases = linewidth = 0
            pos = 0
            for raw in fh:
                if raw.startswith(b">"):
                    if name is not None:
                        self.index[name] = (length, offset, linebases, linewidth)
                    name = raw[1:].split()[0].decode()
                    pos += len(raw)
                    offset = pos
                    length = 0
                    linebases = linewidth = 0
                else:
                    stripped = raw.rstrip(b"\r\n")
                    if linebases == 0 and stripped:
                        linebases = len(stripped)
                        linewidth = len(raw)
                    length += len(stripped)
                    pos += len(raw)
            if name is not None:
                self.index[name] = (length, offset, linebases, linewidth)

    def save(self) -> None:
        with open(self.path + ".fai", "w") as fh:
            for name, (ln, off, lb, lw) in self.index.items():
                fh.write(f"{name}\t{ln}\t{off}\t{lb}\t{lw}\n")

    def names(self) -> list[str]:
        return list(self.index)

    def length(self, name: str) -> int:
        return self.index[name][0]

    def fetch(self, name: str, start: int = 0, end: int | None = None) -> str:
        ln, off, lb, lw = self.index[name]
        if end is None or end > ln:
            end = ln
        start = max(0, start)
        if start >= end:
            return ""
        first_line = start // lb
        byte_start = off + first_line * lw + (start % lb)
        last_line = (end - 1) // lb
        byte_end = off + last_line * lw + ((end - 1) % lb) + 1
        with open(self.path, "rb") as fh:
            fh.seek(byte_start)
            raw = fh.read(byte_end - byte_start)
        return raw.replace(b"\n", b"").replace(b"\r", b"").decode().upper()
