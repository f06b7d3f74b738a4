"""BGZF (blocked gzip) codec in pure Python (zlib-backed).

BGZF is the block-compressed gzip variant used by BAM: a series of gzip
members, each with a BC extra subfield giving the total block size, ending
with a fixed 28-byte EOF marker.  Reference analog: htslib's bgzf.c
(SURVEY.md §3.1 C7; the task requires our own codec layer — pysam/htslib
are not available in this environment, SURVEY.md H7).

A native C++ implementation (kbbq_tpu/io/native) accelerates this path;
this module is the semantic reference and fallback.
"""

from __future__ import annotations

import struct
import zlib

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")
_HDR = struct.Struct("<4BI2BH")  # magic..XLEN of a gzip member header
MAX_BLOCK = 65536


class BGZFError(ValueError):
    pass


def decompress(data: bytes) -> bytes:
    """Decompress a whole BGZF byte string (all blocks concatenated).

    Uses the multithreaded native codec (io/native) when built; falls back
    to this pure-Python implementation otherwise.
    """
    from . import native_lib
    try:
        native = native_lib.bgzf_decompress(data)
        if native is not None:
            return native
    except ValueError as e:
        raise BGZFError(str(e)) from e
    return _decompress_py(data)


def _decompress_py(data: bytes) -> bytes:
    out = []
    off = 0
    n = len(data)
    while off < n:
        if n - off >= 28 and data[off:off + 28] == BGZF_EOF:
            off += 28
            continue
        if n - off < 18:
            raise BGZFError(f"truncated BGZF block header at {off}")
        (id1, id2, cm, flg, _mtime, _xfl, _os, xlen) = _HDR.unpack_from(
            data, off)
        if (id1, id2, cm) != (31, 139, 8) or not flg & 4:
            raise BGZFError(f"not a BGZF block at offset {off}")
        # scan extra subfields for BC
        xoff = off + 12
        bsize = None
        end = xoff + xlen
        while xoff + 4 <= end:
            si1, si2, slen = data[xoff], data[xoff + 1], struct.unpack_from(
                "<H", data, xoff + 2)[0]
            if (si1, si2) == (66, 67) and slen == 2:
                bsize = struct.unpack_from("<H", data, xoff + 4)[0] + 1
            xoff += 4 + slen
        if bsize is None:
            raise BGZFError(f"missing BC subfield at offset {off}")
        cdata = data[off + 12 + xlen: off + bsize - 8]
        isize = struct.unpack_from("<I", data, off + bsize - 4)[0]
        crc = struct.unpack_from("<I", data, off + bsize - 8)[0]
        raw = zlib.decompress(cdata, wbits=-15)
        if len(raw) != isize:
            raise BGZFError(f"ISIZE mismatch in block at {off}")
        if zlib.crc32(raw) != crc:
            raise BGZFError(f"CRC mismatch in block at {off}")
        out.append(raw)
        off += bsize
    return b"".join(out)


def compress(data: bytes, level: int = 6,
             block_size: int = 0xFF00) -> bytes:
    """Compress bytes into BGZF blocks + EOF marker (native if built)."""
    from . import native_lib
    native = native_lib.bgzf_compress(data, level)
    if native is not None:
        return native
    return _compress_py(data, level, block_size)


def _compress_py(data: bytes, level: int = 6,
                 block_size: int = 0xFF00) -> bytes:
    out = []
    for s in range(0, len(data), block_size):
        chunk = data[s:s + block_size]
        out.append(_compress_block(chunk, level))
    out.append(BGZF_EOF)
    return b"".join(out)


def _compress_block(chunk: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    cdata = co.compress(chunk) + co.flush()
    bsize = len(cdata) + 12 + 6 + 8  # hdr + XLEN(6) + cdata + crc/isize
    if bsize > MAX_BLOCK:
        raise BGZFError("block too large after compression")
    hdr = struct.pack("<4BI2BH", 31, 139, 8, 4, 0, 0, 255, 6)
    extra = struct.pack("<2B2H", 66, 67, 2, bsize - 1)
    tail = struct.pack("<II", zlib.crc32(chunk), len(chunk))
    return hdr + extra + cdata + tail


def is_bgzf(head: bytes) -> bool:
    return (len(head) >= 18 and head[0] == 31 and head[1] == 139
            and head[2] == 8 and (head[3] & 4) != 0)
