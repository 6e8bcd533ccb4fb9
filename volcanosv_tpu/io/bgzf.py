"""BGZF (blocked gzip) reader/writer — the container format of BAM.

Implemented from the BGZF spec (SAM spec §4.1): a series of gzip members with
a BSIZE extra field, 64KiB max uncompressed payload, and a 28-byte EOF marker.
No htslib; zlib only.  (The reference relies on samtools/pysam for all BAM
I/O — SURVEY.md §2.2 'samtools'.)
"""
from __future__ import annotations

import struct
import zlib

_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)
_HDR = struct.Struct("<4BI2BH")


class BgzfReader:
    """Stream-decompresses a BGZF file; also accepts plain gzip / raw files."""

    def __init__(self, path: str):
        self._fh = open(path, "rb")
        magic = self._fh.read(2)
        self._fh.seek(0)
        self._plain = magic != b"\x1f\x8b"
        self._buf = b""
        self._pos = 0
        self._eof = False
        if not self._plain:
            # gzip but maybe not bgzf: fall back to whole-stream gzip decode
            head = self._fh.read(18)
            self._fh.seek(0)
            self._bgzf = len(head) >= 18 and head[3] & 4 and head[12:14] == b"BC"
        else:
            self._bgzf = False
        self._gzip_obj = None
        if not self._plain and not self._bgzf:
            self._gzip_obj = zlib.decompressobj(16 + zlib.MAX_WBITS)

    def _fill(self) -> bool:
        if self._eof:
            return False
        if self._plain:
            chunk = self._fh.read(1 << 20)
            if not chunk:
                self._eof = True
                return False
            self._buf = self._buf[self._pos:] + chunk
            self._pos = 0
            return True
        if self._gzip_obj is not None:
            chunk = self._fh.read(1 << 20)
            if not chunk:
                self._eof = True
                return False
            out = self._gzip_obj.decompress(chunk)
            self._buf = self._buf[self._pos:] + out
            self._pos = 0
            return True
        # BGZF block
        hdr = self._fh.read(12)
        if len(hdr) < 12:
            self._eof = True
            return False
        xlen = struct.unpack("<H", hdr[10:12])[0]
        extra = self._fh.read(xlen)
        bsize = None
        i = 0
        while i + 4 <= len(extra):
            si1, si2, slen = extra[i], extra[i + 1], struct.unpack("<H", extra[i + 2 : i + 4])[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack("<H", extra[i + 4 : i + 6])[0]
            i += 4 + slen
        if bsize is None:
            raise ValueError("not a BGZF block (no BC extra field)")
        cdata_len = bsize - xlen - 19
        cdata = self._fh.read(cdata_len)
        self._fh.read(8)  # crc32 + isize
        out = zlib.decompress(cdata, -15)
        if not out and cdata_len == 2:  # EOF block
            self._eof = True
            return False
        self._buf = self._buf[self._pos:] + out
        self._pos = 0
        return bool(out) or not self._eof

    def read(self, n: int) -> bytes:
        while len(self._buf) - self._pos < n:
            if not self._fill():
                break
        out = self._buf[self._pos : self._pos + n]
        self._pos += len(out)
        return out

    def read_all(self) -> bytes:
        while self._fill():
            pass
        out = self._buf[self._pos:]
        self._buf = b""
        self._pos = 0
        return out

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class BgzfWriter:
    def __init__(self, path: str, level: int = 6):
        self._fh = open(path, "wb")
        self._level = level
        self._buf = bytearray()

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= 0xFF00:
            self._flush_block(self._buf[:0xFF00])
            del self._buf[:0xFF00]

    def _flush_block(self, payload: bytes) -> None:
        co = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        cdata = co.compress(bytes(payload)) + co.flush()
        bsize = len(cdata) + 25  # total = hdr(12)+extra(6)+cdata+crc(4)+isize(4) = len+26; BSIZE = total-1
        block = (
            _HDR.pack(31, 139, 8, 4, 0, 0, 255, 6)
            + b"BC"
            + struct.pack("<HH", 2, bsize)
            + cdata
            + struct.pack("<II", zlib.crc32(bytes(payload)) & 0xFFFFFFFF, len(payload))
        )
        self._fh.write(block)

    def close(self) -> None:
        if self._buf:
            self._flush_block(bytes(self._buf))
            self._buf = bytearray()
        self._fh.write(_BGZF_EOF)
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
