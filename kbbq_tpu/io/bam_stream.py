"""Streaming BAM reader/writer (bounded memory; BASELINE configs 3-4).

htslib streams alignments record-at-a-time through bgzf_read (SURVEY.md
§3.1 C7); round 1's read_bam materialized the whole decompressed file.
This module decompresses BGZF members incrementally and yields records in
chunks, and writes recalibrated records back through an incremental BGZF
compressor — host memory is O(chunk) end to end.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

from .bam import (
    BAMError,
    BamRecord,
    parse_bam_header,
    record_from_body,
)
from .bgzf import BGZF_EOF, BGZFError, MAX_BLOCK, _compress_block, _HDR

DEFAULT_CHUNK_RECORDS = 1 << 16

# Output deflate level.  zlib level 6 (htslib's default) measured 31
# MB/s on this host vs 141 MB/s at level 2 for ~10% larger output —
# with no libdeflate, level 2 is the right speed/size default for a
# throughput-first tool; KBBQ_BAM_LEVEL overrides.
import os as _os
DEFAULT_COMPRESS_LEVEL = int(_os.environ.get("KBBQ_BAM_LEVEL", "2"))


class BGZFStreamReader:
    """Incremental BGZF decompressor over a binary file object."""

    def __init__(self, fileobj, read_bytes: int = 4 << 20):
        self.f = fileobj
        self.read_bytes = read_bytes
        self.comp = bytearray()     # undecoded compressed tail
        self.out = bytearray()      # decoded, unconsumed
        self.pos = 0                # read cursor into out (front-del
        # per small read would memmove the whole buffer — O(n^2))
        self.eof = False
        self.consumed = 0           # uncompressed bytes handed out

    def _fill_comp(self) -> bool:
        b = self.f.read(self.read_bytes)
        if not b:
            self.eof = True
            return False
        self.comp += b
        return True

    def _decode_some(self) -> bool:
        """Decode whole BGZF members from comp into out; True if any.

        Header-scans to the last COMPLETE member boundary, then inflates
        the whole span through the multithreaded native codec (htslib
        uses a BGZF thread pool the same way, SURVEY.md C7); per-member
        zlib is the fallback when the native lib isn't built."""
        data = self.comp
        off = 0
        n = len(data)
        while True:
            if n - off < 18:
                break
            if data[off:off + 28] == BGZF_EOF:
                off += 28
                continue
            (id1, id2, cm, flg, _mt, _xfl, _os, xlen) = _HDR.unpack_from(
                data, off)
            if (id1, id2, cm) != (31, 139, 8) or not flg & 4:
                raise BGZFError(f"not a BGZF block at stream offset {off}")
            xoff = off + 12
            bsize = None
            end = xoff + xlen
            while xoff + 4 <= end:
                si1, si2 = data[xoff], data[xoff + 1]
                slen = struct.unpack_from("<H", data, xoff + 2)[0]
                if (si1, si2) == (66, 67) and slen == 2:
                    bsize = struct.unpack_from("<H", data, xoff + 4)[0] + 1
                xoff += 4 + slen
            if bsize is None:
                raise BGZFError("missing BC subfield")
            if n - off < bsize:
                break  # need more compressed bytes
            off += bsize
        if off == 0:
            return False
        span = bytes(memoryview(data)[:off])
        from . import native_lib
        raw = native_lib.bgzf_decompress(span)
        if raw is None:
            from .bgzf import _decompress_py
            raw = _decompress_py(span)
        self.out += raw
        del self.comp[:off]
        return True

    def read(self, want: int) -> bytes:
        """Up to `want` decompressed bytes ('' only at EOF)."""
        while len(self.out) - self.pos < want and not self.eof:
            progressed = self._decode_some()
            if not progressed and not self._fill_comp():
                break
        take = bytes(memoryview(self.out)[self.pos:self.pos + want])
        self.pos += len(take)
        self.consumed += len(take)
        if self.pos >= (1 << 20):
            del self.out[:self.pos]
            self.pos = 0
        return take

    def read_exact(self, want: int) -> bytes:
        b = self.read(want)
        if len(b) != want:
            raise BAMError("truncated BAM stream")
        return b


class BGZFStreamWriter:
    """Incremental BGZF compressor onto a binary file object.

    Accumulates several MB, then deflates many blocks at once through the
    multithreaded native codec (block payloads stay block_size bytes, so
    the output stream is identical in structure to the per-block path).
    """

    def __init__(self, fileobj, level: int | None = None,
                 block_size: int = 0xFF00, flush_bytes: int = 8 << 20):
        if level is None:
            level = DEFAULT_COMPRESS_LEVEL
        self.f = fileobj
        self.level = level
        self.block_size = block_size
        self.flush_bytes = max(flush_bytes, block_size)
        self.buf = bytearray()

    def _emit(self, span: bytes) -> None:
        if self.block_size == 0xFF00:  # the native codec's fixed chunking
            from . import native_lib
            out = native_lib.bgzf_compress(span, self.level)
            if out is not None:
                # native appends an EOF marker per call; one marker
                # belongs at file end only (close() writes it)
                self.f.write(out[:-28])
                return
        for s in range(0, len(span), self.block_size):
            self.f.write(_compress_block(span[s:s + self.block_size],
                                         self.level))

    def write(self, data: bytes) -> None:
        self.buf += data
        if len(self.buf) >= self.flush_bytes:
            n = (len(self.buf) // self.block_size) * self.block_size
            span = bytes(memoryview(self.buf)[:n])
            del self.buf[:n]
            self._emit(span)

    def close(self) -> None:
        if self.buf:
            self._emit(bytes(self.buf))
            self.buf.clear()
        self.f.write(BGZF_EOF)


def open_bam_stream(path: str):
    """(header_text, refs, reader) with the reader positioned at the
    first alignment record."""
    f = open(path, "rb")
    r = BGZFStreamReader(f)
    # header: magic + l_text + text + refs; sizes are small — read field
    # by field through the decompressed stream
    magic = r.read_exact(4)
    l_text = struct.unpack("<i", r.read_exact(4))[0]
    text = r.read_exact(l_text)
    n_ref_b = r.read_exact(4)
    head = magic + struct.pack("<i", l_text) + text + n_ref_b
    n_ref = struct.unpack("<i", n_ref_b)[0]
    parts = [head]
    for _ in range(n_ref):
        lb = r.read_exact(4)
        l_name = struct.unpack("<i", lb)[0]
        parts.append(lb + r.read_exact(l_name + 4))
    header_text, refs, _ = parse_bam_header(b"".join(parts))
    return header_text, refs, r


def iter_bam_records_stream(reader: BGZFStreamReader
                            ) -> Iterator[BamRecord]:
    while True:
        szb = reader.read(4)
        if not szb:
            return
        if len(szb) < 4:
            raise BAMError("truncated BAM record size")
        block_size = struct.unpack("<i", szb)[0]
        body = bytearray(reader.read_exact(block_size))
        yield record_from_body(body)


def iter_bam_chunks(path: str,
                    chunk_records: int = DEFAULT_CHUNK_RECORDS):
    """(header_text, refs) then record-list chunks via a generator pair.

    Returns (header_text, refs, chunk_iterator).
    """
    header_text, refs, reader = open_bam_stream(path)

    def chunks():
        try:
            buf = []
            for rec in iter_bam_records_stream(reader):
                buf.append(rec)
                if len(buf) >= chunk_records:
                    yield buf
                    buf = []
            if buf:
                yield buf
        finally:
            reader.f.close()

    return header_text, refs, chunks()


def _scan_record_index(buf, start: int):
    """(offs, sizes, end) for complete records in buf[start:] — native
    bulk scan (io/native/kbbq_io.cc::kbbq_bam_offsets) with a pure-
    Python fallback.  Raises BAMError on a non-positive record size."""
    import numpy as np

    from . import native_lib
    try:
        res = native_lib.bam_offsets(buf, start)
    except ValueError as e:
        raise BAMError(str(e)) from e
    if res is not None:
        return res
    offs, sizes = [], []
    off = start
    n = len(buf)
    while off + 4 <= n:
        size = int.from_bytes(buf[off:off + 4], "little", signed=True)
        if size <= 0:
            raise BAMError("malformed BAM record size")
        if off + 4 + size > n:
            break
        offs.append(off + 4)
        sizes.append(size)
        off += 4 + size
    return (np.asarray(offs, np.int64), np.asarray(sizes, np.int64), off)


def bgzf_member_index(path: str):
    """[(comp_off, uncomp_off)] per BGZF member — a pure header walk
    over the COMPRESSED bytes (BSIZE hop + ISIZE tail read, no inflate),
    so it costs one sequential disk read.  uncomp_off is the member's
    start offset in the decompressed stream.  Multi-host BAM sharding
    maps record-boundary stream offsets to (member, delta) virtual
    offsets with this (SURVEY.md §3.3; htslib's BAI virtual offsets are
    the same idea)."""
    members = []
    uncomp = 0
    CHUNK = 8 << 20           # window size; BGZF members are <= 64 KiB
    with open(path, "rb") as f:
        f.seek(0, 2)
        n = f.tell()
        buf = b""
        buf_start = 0         # file offset of buf[0]

        def ensure(start: int, need: int) -> bool:
            """Slide the bounded window so [start, start+need) is in
            `buf` — sequential reads in practice, O(CHUNK) memory
            always (a WGS BAM is never materialized; ADVICE round 4)."""
            nonlocal buf, buf_start
            if start >= buf_start and start + need <= buf_start + len(buf):
                return True
            if start + need > n:
                return False
            f.seek(start)
            buf = f.read(max(CHUNK, need))
            buf_start = start
            return len(buf) >= need

        off = 0
        while off + 18 <= n:
            if not ensure(off, 18):
                raise BGZFError("truncated member header")
            rel = off - buf_start
            (id1, id2, cm, flg, _mt, _xfl, _os, xlen) = _HDR.unpack_from(
                buf, rel)
            if (id1, id2, cm) != (31, 139, 8) or not flg & 4:
                raise BGZFError(f"not a BGZF block at offset {off}")
            if not ensure(off, 12 + xlen):
                raise BGZFError("truncated member header")
            rel = off - buf_start
            xoff = rel + 12
            end = xoff + xlen
            bsize = None
            while xoff + 4 <= end:
                si1, si2 = buf[xoff], buf[xoff + 1]
                slen = struct.unpack_from("<H", buf, xoff + 2)[0]
                if (si1, si2) == (66, 67) and slen == 2:
                    bsize = struct.unpack_from("<H", buf, xoff + 4)[0] + 1
                xoff += 4 + slen
            if bsize is None or off + bsize > n:
                raise BGZFError("missing BC subfield / truncated member")
            if not ensure(off + bsize - 4, 4):
                raise BGZFError("truncated member")
            isize = struct.unpack_from(
                "<I", buf, off + bsize - 4 - buf_start)[0]
            members.append((off, uncomp))
            uncomp += isize
            off += bsize
    return members, uncomp


def voffset_for(members, total_uncomp: int, stream_off: int):
    """(comp_off, delta) locating decompressed offset `stream_off`."""
    import bisect
    if not (0 <= stream_off <= total_uncomp):
        raise BGZFError("stream offset out of range")
    i = bisect.bisect_right([u for _, u in members], stream_off) - 1
    comp_off, uncomp_off = members[i]
    return comp_off, stream_off - uncomp_off


def open_bam_stream_at(path: str, comp_off: int, delta: int
                       ) -> BGZFStreamReader:
    """Reader positioned at (comp_off, delta) — comp_off MUST be a BGZF
    member boundary and delta land on a record boundary."""
    f = open(path, "rb")
    f.seek(comp_off)
    r = BGZFStreamReader(f)
    while delta:
        got = r.read(min(delta, 8 << 20))
        if not got:
            raise BAMError("virtual offset past EOF")
        delta -= len(got)
    return r


def _iter_raw_chunks_from_reader(reader, chunk_records: int,
                                 max_records: int | None = None,
                                 offsets_into=None):
    """The raw-chunk cutting loop over an open reader (shared by the
    whole-file iterator and the virtual-offset range iterator).
    offsets_into: optional list; the chunk's START offset in the
    decompressed stream (reader.consumed coordinates) is appended per
    yielded chunk."""
    import numpy as np

    try:
        buf = bytearray()
        o_parts: list = []
        s_parts: list = []
        nrec = 0
        scanned = 0
        eof = False
        remaining = max_records
        base_off = reader.consumed
        while True:
            while nrec < chunk_records and not eof and \
                    (remaining is None or nrec < remaining):
                more = reader.read(8 << 20)
                if not more:
                    eof = True
                    break
                buf += more
                o, s, scanned = _scan_record_index(buf, scanned)
                if o.size:
                    o_parts.append(o)
                    s_parts.append(s)
                    nrec += o.size
            if nrec == 0:
                if len(buf) - scanned and remaining is None:
                    raise BAMError("truncated BAM record")
                return
            offs = (np.concatenate(o_parts) if len(o_parts) > 1
                    else o_parts[0])
            sizes = (np.concatenate(s_parts) if len(s_parts) > 1
                     else s_parts[0])
            take = min(nrec, chunk_records)
            if remaining is not None:
                take = min(take, remaining)
            cut = int(offs[take - 1] + sizes[take - 1])
            if offsets_into is not None:
                offsets_into.append(base_off)
            yield (np.frombuffer(bytes(memoryview(buf)[:cut]),
                                 np.uint8),
                   offs[:take].copy(), sizes[:take].copy())
            if remaining is not None:
                remaining -= take
                if remaining <= 0:
                    return
            base_off += cut
            rem_o, rem_s = offs[take:] - cut, sizes[take:]
            del buf[:cut]
            scanned -= cut
            o_parts = [rem_o] if rem_o.size else []
            s_parts = [rem_s] if rem_s.size else []
            nrec -= take
    finally:
        reader.f.close()


def iter_bam_raw_chunks_range(path: str, comp_off: int, delta: int,
                              n_records: int,
                              chunk_records: int = DEFAULT_CHUNK_RECORDS):
    """Raw chunks for exactly n_records starting at a record-boundary
    virtual offset — the per-host slice of a multi-host BAM run."""
    reader = open_bam_stream_at(path, comp_off, delta)
    return _iter_raw_chunks_from_reader(reader, chunk_records,
                                        max_records=n_records)


def iter_bam_raw_chunks(path: str,
                        chunk_records: int = DEFAULT_CHUNK_RECORDS):
    """(header_text, refs, iterator of (buf, offs, sizes)) where buf is
    a uint8 array of concatenated raw records (block_size prefixes
    included), offs[i] is the i-th record BODY offset into buf and
    sizes[i] its body size.  Lets callers vector-extract fields for a
    whole chunk without constructing per-record objects (the Python
    per-record loop was the benchmark subcommand's bottleneck); record
    boundaries are indexed in bulk by the native codec."""
    import numpy as np

    header_text, refs, reader = open_bam_stream(path)
    return header_text, refs, _iter_raw_chunks_from_reader(
        reader, chunk_records)


def iter_bam_raw_chunks_offsets(path: str,
                                chunk_records: int =
                                DEFAULT_CHUNK_RECORDS):
    """iter_bam_raw_chunks that ALSO records each chunk's start offset
    in the decompressed stream: returns (header_text, refs, chunks,
    offsets) where offsets grows one entry per yielded chunk — the
    multi-host scan uses these with bgzf_member_index to derive
    per-host virtual offsets."""
    header_text, refs, reader = open_bam_stream(path)
    offsets: list = []
    return header_text, refs, _iter_raw_chunks_from_reader(
        reader, chunk_records, offsets_into=offsets), offsets


class BamStreamWriter:
    """Write a BAM incrementally: header once, then record batches."""

    def __init__(self, sink, header_text: str, refs,
                 level: int | None = None, write_header: bool = True,
                 write_eof: bool = True):
        """write_header/write_eof=False produce a HEADERLESS /
        unterminated BGZF shard — multi-host pass 4 writes one part per
        host and `cat part-*` yields one valid BAM (host 0 carries the
        header, the last host the EOF marker)."""
        self._own = isinstance(sink, (str, bytes))
        self.f = open(sink, "wb") if self._own else sink
        self.w = BGZFStreamWriter(self.f, level)
        self._write_eof = write_eof
        if not write_header:
            return
        out = [b"BAM\x01"]
        htext = header_text.encode()
        out.append(struct.pack("<i", len(htext)))
        out.append(htext)
        out.append(struct.pack("<i", len(refs)))
        for name, l_ref in refs:
            nb = name.encode() + b"\x00"
            out.append(struct.pack("<i", len(nb)))
            out.append(nb)
            out.append(struct.pack("<i", l_ref))
        self.w.write(b"".join(out))

    def write_record(self, rec: BamRecord) -> None:
        self.w.write(struct.pack("<i", len(rec.data)))
        self.w.write(bytes(rec.data))

    def write_raw(self, data) -> None:
        """Write pre-assembled record bytes (block_size prefixes
        included) — the vectorized pass-4 path rewrites quals inside the
        raw chunk buffer and streams it out verbatim."""
        self.w.write(bytes(data))

    def close(self) -> None:
        if self._write_eof:
            self.w.close()
        else:
            # flush pending payload without the EOF marker
            if self.w.buf:
                self.w._emit(bytes(self.w.buf))
                self.w.buf.clear()
        if self._own:
            self.f.close()
