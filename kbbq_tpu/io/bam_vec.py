"""Whole-chunk vectorized BAM record decoding (recalibrate hot path).

Reference analog: htslib's `bam_read1` field access + kbbq's
`BamFile::next` / `CReadData` construction (SURVEY.md §3.1 C5/C6,
`pub:src/kbbq/htsiter.cc`, `pub:src/kbbq/readutils.cc`; mount empty,
SURVEY.md §0).  htslib hands out pointers into one decoded buffer; the
round-2 Python path instead built a BamRecord object and sliced three
numpy arrays PER RECORD per pass (x4 passes) — the decode dominated BAM
wall time (round-2 VERDICT weak-item 4).  This module decodes a whole
chunk of records with numpy field math over the raw record buffer, the
same pattern benchmark.py proved out for the benchmark subcommand:

- fixed-offset fields (flag, l_seq, ...) via little-endian byte math on
  gathered columns;
- sequences/quals per (read-length) group with one contiguous row copy
  per record (a 2-D fancy gather was measured 2x slower);
- the variable-length aux chain walked VECTORIZED across all records at
  once (one numpy step per tag position, not per record) to locate RG
  and OQ tags — a Z-value containing the bytes "RGZ" can never be
  misread as a tag because the walk respects field boundaries.

Records the walk cannot parse (unknown aux type, truncated chain) fall
back to the per-record `BamRecord` path, keeping behavior identical.
"""

from __future__ import annotations

import numpy as np

from .bam import BAMError, record_from_body


def struct_pack_i32(v: int) -> bytes:
    import struct
    return struct.pack("<i", v)

# aux value sizes for fixed-width types; 0 = not fixed-width
_AUX_FIXED = np.zeros(256, np.int64)
for _t, _s in ((b"A", 1), (b"c", 1), (b"C", 1), (b"s", 2), (b"S", 2),
               (b"i", 4), (b"I", 4), (b"f", 4)):
    _AUX_FIXED[_t[0]] = _s
_AUX_IS_FIXED = _AUX_FIXED > 0

_Z, _H, _B = ord("Z"), ord("H"), ord("B")

# 4-bit nibble -> 2-bit code LUTs for whole-byte decode (hi/lo nibble)
_NIB = np.full(16, 4, dtype=np.int8)
for _code, _v in enumerate((1, 2, 4, 8)):
    _NIB[_v] = _code
BYTE_HI = _NIB[np.arange(256) >> 4]
BYTE_LO = _NIB[np.arange(256) & 0xF]


def _u8(buf, offs):
    return buf[offs].astype(np.int64)


def _u16(buf, offs):
    return _u8(buf, offs) | (_u8(buf, offs + 1) << 8)


def _u32(buf, offs):
    return _u16(buf, offs) | (_u16(buf, offs + 2) << 16)


def _i32(buf, offs):
    return _u32(buf, offs).astype(np.uint32).astype(np.int32).astype(
        np.int64)


def bam_fields(buf: np.ndarray, offs: np.ndarray) -> dict:
    """Fixed-offset record fields + derived section offsets (all int64).

    Layout per SAM spec §4.2: refID, pos, l_read_name, mapq, bin,
    n_cigar_op, flag, l_seq, next_refID, next_pos, tlen, read_name,
    cigar, seq (4-bit packed), qual, aux.
    """
    refid = _i32(buf, offs)
    pos = _i32(buf, offs + 4)
    l_rn = _u8(buf, offs + 8)
    n_cig = _u16(buf, offs + 12)
    flag = _u16(buf, offs + 14)
    l_seq = _i32(buf, offs + 16)
    seq_off = offs + 32 + l_rn + 4 * n_cig
    qual_off = seq_off + (l_seq + 1) // 2
    aux_off = qual_off + l_seq
    return {"refid": refid, "pos": pos, "l_rn": l_rn, "n_cig": n_cig,
            "flag": flag, "l_seq": l_seq, "seq_off": seq_off,
            "qual_off": qual_off, "aux_off": aux_off}


def aux_scan(buf: np.ndarray, aux_off: np.ndarray, rec_end: np.ndarray,
             tags: tuple = ("RG", "OQ")) -> tuple[dict, np.ndarray]:
    """Walk every record's aux chain in lockstep (vectorized over records).

    Returns ({tag: (val_start, val_end) int64 arrays, -1 where absent},
    odd) where `odd[i]` marks records whose chain could not be walked
    (unknown type byte, unterminated Z/H, overrun) — those need the
    per-record fallback.  Only Z-typed values are reported for `tags`
    (RG and OQ are Z by spec).  One numpy pass per aux FIELD POSITION
    (chains are a handful of tags), not per record.
    """
    n = int(aux_off.shape[0])
    found = {t: (np.full(n, -1, np.int64), np.full(n, -1, np.int64))
             for t in tags}
    odd = np.zeros(n, bool)
    if n == 0:
        return found, odd
    zpos = np.flatnonzero(buf == 0)  # NUL positions, for Z/H termination
    cur = aux_off.astype(np.int64).copy()
    end = rec_end.astype(np.int64)
    # smallest legal tag is 4 bytes (tag2 + type1 + 1-byte value)
    active = cur + 4 <= end
    # any non-empty trailing gap < 4 bytes is malformed
    odd |= (cur != end) & ~active
    tcodes = {t: (ord(t[0]), ord(t[1])) for t in tags}
    for _ in range(4096):  # bound: aux region >= 4 bytes per tag
        idx = np.flatnonzero(active)
        if idx.size == 0:
            break
        c = cur[idx]
        t0, t1, ty = buf[c], buf[c + 1], buf[c + 2]
        v = c + 3
        adv = _AUX_FIXED[ty].copy()
        bad = np.zeros(idx.size, bool)

        isz = (ty == _Z) | (ty == _H)
        if isz.any():
            vi = v[isz]
            zi = np.searchsorted(zpos, vi)
            has = zi < zpos.size
            ze = np.where(has, zpos[np.minimum(zi, zpos.size - 1)],
                          np.int64(buf.size))
            zbad = ~has | (ze >= end[idx[isz]])  # NUL must be in-record
            adv[isz] = ze - vi + 1
            bad[isz] |= zbad
            for t, (tc0, tc1) in tcodes.items():
                m = isz.copy()
                m[isz] &= ~zbad
                m &= (t0 == tc0) & (t1 == tc1) & (ty == _Z)
                m &= found[t][0][idx] < 0  # first occurrence wins
                rows = idx[m]
                if rows.size:
                    found[t][0][rows] = v[m]
                    found[t][1][rows] = (v + (adv - 1))[m]

        isb = ty == _B
        if isb.any():
            vb = v[isb]
            ok = vb + 5 <= end[idx[isb]]
            vbs = np.minimum(vb, buf.size - 5)
            sub = buf[vbs]
            cnt = _u32(buf, vbs + 1)
            adv[isb] = 5 + _AUX_FIXED[sub] * cnt
            bad[isb] |= ~ok | ~_AUX_IS_FIXED[sub]

        unknown = ~(_AUX_IS_FIXED[ty] | isz | isb)
        bad |= unknown

        nxt = v + adv
        bad |= nxt > end[idx]
        odd[idx[bad]] = True
        cur[idx] = nxt
        nact = ~bad & (nxt + 4 <= end[idx])
        # clean termination = nxt == end; anything else short is odd
        odd[idx[~bad & ~nact & (nxt != end[idx])]] = True
        # early out: once every wanted tag is located for a record the
        # rest of its chain is irrelevant — with the common RG-first
        # layout the whole walk is ONE vectorized step
        allfound = np.ones(idx.size, bool)
        for t in tags:
            allfound &= found[t][0][idx] >= 0
        active[idx] = nact & ~allfound
    else:
        odd[active] = True
    return found, odd


def _gather_short(buf: np.ndarray, starts: np.ndarray, ends: np.ndarray
                  ) -> np.ndarray:
    """[n, max_len] zero-padded gather of short variable-length spans
    (RG names).  Missing spans (start<0) become all-zero rows."""
    n = starts.size
    ln = np.maximum(ends - starts, 0)
    ml = int(ln.max(initial=0))
    if ml == 0:
        return np.zeros((n, 1), np.uint8)
    base = np.where(starts < 0, 0, starts)
    idx = np.minimum(base[:, None] + np.arange(ml, dtype=np.int64),
                     buf.size - 1)
    out = buf[idx]
    out[np.arange(ml)[None, :] >= ln[:, None]] = 0
    return out


def _unique_rows(pad: np.ndarray):
    """(uniq_rows, first_idx, inverse) for a [n, m] uint8 array.

    np.unique(axis=0) lexsorts column-wise (1.3s at 1.5M rows); viewing
    each zero-padded row as a few uint64 words makes the sort a memcmp
    over 1-3 machine words — and the single-RG common case short-
    circuits to one vector compare."""
    n, m = pad.shape
    if n == 0:
        return pad, np.zeros(0, np.int64), np.zeros(0, np.int64)
    if (pad == pad[0]).all():
        return (pad[:1], np.zeros(1, np.int64), np.zeros(n, np.int64))
    w = -(-m // 8) * 8
    if w > m:
        pad = np.concatenate(
            [pad, np.zeros((n, w - m), np.uint8)], axis=1)
    rec = np.ascontiguousarray(pad).view(
        [(f"f{i}", "<u8") for i in range(w // 8)]).reshape(-1)
    uniq, first, inv = np.unique(rec, return_index=True,
                                 return_inverse=True)
    return (pad[first][:, :m], first.astype(np.int64),
            inv.reshape(-1).astype(np.int64))


def rg_ids(buf: np.ndarray, vs: np.ndarray, ve: np.ndarray,
           registry: dict) -> np.ndarray:
    """Dense RG index per record from aux value spans, mapped through
    the scan-built {name: id} registry (missing tag -> "")."""
    pad = _gather_short(buf, vs, ve)
    uniq, _, inv = _unique_rows(pad)
    # decode each unique row once (a handful per file)
    lut = np.asarray([registry[bytes(row[row != 0]).decode()]
                      for row in uniq], np.int32)
    return lut[inv]


def decode_machine_chunk(buf: np.ndarray, offs: np.ndarray,
                         sizes: np.ndarray, max_len: int,
                         registry: dict | None, use_oq: bool = False):
    """(codes, quals, mask, rgs, seconds, lens, prim_rows) for the chunk's
    PRIMARY records, machine order, padded to max_len.

    Matches the per-record path bit for bit: reverse-strand reads are
    reverse-complemented with reversed quals (DECISIONS.md D8), quals
    clipped to [0, 93], --use-oq takes quals from the OQ:Z: tag (error
    if absent).  registry maps RG-tag name -> dense id ("" = untagged).
    """
    f = bam_fields(buf, offs)
    flag, l_seq = f["flag"], f["l_seq"]
    prim_rows = np.flatnonzero(((flag & 0x900) == 0) & (l_seq > 0))
    n = prim_rows.size
    L = max_len
    codes = np.full((n, L), 4, np.int8)
    quals = np.zeros((n, L), np.int8)
    mask = np.zeros((n, L), bool)
    rgs = np.zeros(n, np.int32)
    seconds = np.zeros(n, bool)
    lens = np.zeros(n, np.int64)
    if n == 0:
        return codes, quals, mask, rgs, seconds, lens, prim_rows

    p_off = offs[prim_rows]
    p_end = p_off + sizes[prim_rows]
    p_seq = f["seq_off"][prim_rows]
    p_len = l_seq[prim_rows]
    p_flag = flag[prim_rows]
    lens[:] = p_len
    seconds[:] = (p_flag & 0x80) != 0
    rev = (p_flag & 0x10) != 0

    want = ("RG", "OQ") if use_oq else ("RG",)
    found, odd = aux_scan(buf, f["aux_off"][prim_rows], p_end, want)
    good = np.flatnonzero(~odd)
    if registry is not None and good.size:
        vs, ve = found["RG"]
        rgs[good] = rg_ids(buf, vs[good], ve[good], registry)

    oq_vs = oq_ve = None
    if use_oq:
        oq_vs, oq_ve = found["OQ"]
        missing = good[oq_vs[good] < 0]
        if missing.size:
            r = record_from_body(bytearray(bytes(
                buf[p_off[missing[0]]:p_end[missing[0]]])))
            raise BAMError(f"--use-oq: record {r.name} has no OQ tag")
        if (good.size and
                ((oq_ve[good] - oq_vs[good]) != p_len[good]).any()):
            raise BAMError("--use-oq: OQ length != read length")

    # per read-length group: native threaded decode (nibble LUT +
    # machine-order flip in one C pass, io/native/kbbq_io.cc), with the
    # numpy row-copy path as fallback
    from . import native_lib
    p_qual = f["qual_off"][prim_rows]
    good_mask = ~odd
    for Lg in np.unique(p_len[good_mask]):
        sel = np.flatnonzero(good_mask & (p_len == Lg))
        Lg = int(Lg)
        qsrc = oq_vs[sel] if use_oq else p_qual[sel]
        tmp_c = np.empty((sel.size, Lg), np.int8)
        tmp_q = np.empty((sel.size, Lg), np.int8)
        if native_lib.bam_decode(buf, p_seq[sel], qsrc, rev[sel], Lg,
                                 use_oq, tmp_c, tmp_q):
            codes[sel, :Lg] = tmp_c
            quals[sel, :Lg] = tmp_q
            mask[sel, :Lg] = True
            continue
        nb = (Lg + 1) // 2
        span = nb + Lg  # packed seq + qual are contiguous
        raw = np.empty((sel.size, span), np.uint8)
        so = p_seq[sel]
        for i, o in enumerate(so):
            raw[i] = buf[o:o + span]
        seq = np.empty((sel.size, 2 * nb), np.int8)
        seq[:, 0::2] = BYTE_HI[raw[:, :nb]]
        seq[:, 1::2] = BYTE_LO[raw[:, :nb]]
        seq = seq[:, :Lg]
        if use_oq:
            qrow = np.empty((sel.size, Lg), np.uint8)
            qo = oq_vs[sel]
            for i, o in enumerate(qo):
                qrow[i] = buf[o:o + Lg]
            q = qrow.astype(np.int16) - 33
        else:
            q = raw[:, nb:nb + Lg].astype(np.int16)
        r = rev[sel]
        if r.any():
            sr = seq[r]
            seq[r] = np.where(sr < 4, 3 - sr, sr)[:, ::-1]
            q[r] = q[r][:, ::-1]
        codes[sel, :Lg] = seq
        quals[sel, :Lg] = np.clip(q, 0, 93).astype(np.int8)
        mask[sel, :Lg] = True

    # fallback: records the vectorized aux walk refused
    if odd.any():
        from .bam import machine_order_read
        for i in np.flatnonzero(odd):
            rec = record_from_body(bytearray(bytes(
                buf[p_off[i]:p_end[i]])))
            c, q = machine_order_read(rec, use_oq=use_oq)
            m = len(c)
            codes[i, :m] = c
            quals[i, :m] = np.clip(q, 0, 93)
            mask[i, :m] = True
            if registry is not None:
                tag = rec.get_zstr("RG")
                rgs[i] = registry[tag.decode() if tag is not None else ""]
    return codes, quals, mask, rgs, seconds, lens, prim_rows


def rewrite_quals_chunk(buf: np.ndarray, offs: np.ndarray,
                        sizes: np.ndarray, prim_rows: np.ndarray,
                        lens: np.ndarray, new_q_machine: np.ndarray,
                        set_oq: bool = False):
    """Chunk-level pass-4 rewrite: returns output record bytes for the
    WHOLE chunk (block-size prefixes included, non-primary records
    verbatim) with primary QUAL fields replaced by `new_q_machine`
    (padded [n_prim, max_len] int8, machine order; flipped back to
    alignment order for reverse-strand records here).

    set_oq replicates the per-record semantics exactly (io/bam.py::
    rewrite_quals): any existing OQ:Z: tag is removed and a fresh one
    holding the ORIGINAL quals (+33) is appended at the end of the aux
    region, so streaming output stays byte-identical to the in-RAM path.
    """
    pf = bam_fields(buf, offs)
    qoff = pf["qual_off"][prim_rows]
    rev = (pf["flag"][prim_rows] & 0x10) != 0
    wbuf = buf.copy()
    for Lg in np.unique(lens):
        Lg = int(Lg)
        sel = np.flatnonzero(lens == Lg)
        q = np.ascontiguousarray(new_q_machine[sel, :Lg])
        r = rev[sel]
        if r.any():
            q[r] = q[r][:, ::-1]
        qo = qoff[sel]
        for i, o in enumerate(qo):
            wbuf[o:o + Lg] = q[i]
    if not set_oq or prim_rows.size == 0:
        return wbuf

    # delete-existing + append-at-end OQ
    p_end = offs[prim_rows] + sizes[prim_rows]
    found, odd = aux_scan(buf, pf["aux_off"][prim_rows], p_end, ("OQ",))
    vs, ve = found["OQ"]

    if not odd.any() and not (vs >= 0).any():
        # fast path (the common case: no pre-existing OQ anywhere):
        # one grown-record assembly, fully vectorized
        n = offs.size
        uniform = (n and prim_rows.size == n
                   and (sizes == sizes[0]).all()
                   and (lens == lens[0]).all()
                   and ((qoff - offs) == (qoff[0] - offs[0])).all()
                   # records must be packed back-to-back from offset 0:
                   # the reshape below assumes offs[i] == 4 + i*rec — an
                   # indexed buf not starting at a record boundary would
                   # otherwise corrupt every record (ADVICE round 3)
                   and (offs == 4 + np.arange(n, dtype=np.int64)
                        * (int(sizes[0]) + 4)).all())
        if uniform:
            # fixed-size records: one reshape, column-block writes
            rec = int(sizes[0]) + 4
            L = int(lens[0])
            qo_rel = int(qoff[0] - offs[0]) + 4
            out2 = np.empty((n, rec + L + 4), np.uint8)
            out2[:, :rec] = wbuf[:n * rec].reshape(n, rec)
            out2[:, :4] = np.frombuffer(
                struct_pack_i32(rec - 4 + L + 4), np.uint8)
            out2[:, rec:rec + 3] = np.frombuffer(b"OQZ", np.uint8)
            out2[:, rec + 3:rec + 3 + L] = \
                buf[:n * rec].reshape(n, rec)[:, qo_rel:qo_rel + L] \
                + np.uint8(33)
            out2[:, -1] = 0
            return out2.reshape(-1)
        grow = np.zeros(n, np.int64)
        grow[prim_rows] = lens + 4          # "OQZ" + quals + NUL
        seg_old = sizes + 4
        out_len = seg_old + grow
        dst = np.concatenate([[0], np.cumsum(out_len)[:-1]])
        out = np.empty(int(out_len.sum()), np.uint8)
        # old bytes: concatenated-segment copy via the repeat trick
        # (no per-record Python loop)
        cso = np.cumsum(seg_old)
        within = np.arange(int(cso[-1])) - np.repeat(cso - seg_old,
                                                     seg_old)
        out[np.repeat(dst, seg_old) + within] = \
            wbuf[np.repeat(offs - 4, seg_old) + within]
        pd = dst[prim_rows]
        newsz = (sizes[prim_rows] + grow[prim_rows]).astype("<i4")
        out[pd[:, None] + np.arange(4)] = newsz.view(np.uint8).reshape(
            -1, 4)
        tag0 = pd + seg_old[prim_rows]
        out[tag0], out[tag0 + 1], out[tag0 + 2] = 79, 81, 90  # "OQZ"
        cs = np.cumsum(lens)
        pos = np.arange(int(cs[-1])) - np.repeat(cs - lens, lens)
        # ORIGINAL quals (+33) from the untouched input buffer
        out[np.repeat(tag0 + 3, lens) + pos] = \
            buf[np.repeat(qoff, lens) + pos] + np.uint8(33)
        out[tag0 + 3 + lens] = 0
        return out

    prim_of = {int(r): j for j, r in enumerate(prim_rows)}
    out = bytearray()
    import struct as _st
    for i in range(offs.size):
        o, sz = int(offs[i]), int(sizes[i])
        j = prim_of.get(i)
        if j is None:
            out += wbuf[o - 4:o + sz].tobytes()
            continue
        if odd[j]:
            rec = record_from_body(bytearray(bytes(buf[o:o + sz])))
            from .bam import machine_order_read, rewrite_quals
            L = int(lens[j])
            rewrite_quals(rec, np.asarray(new_q_machine[j, :L], np.uint8),
                          set_oq=True)
            out += _st.pack("<i", len(rec.data)) + bytes(rec.data)
            continue
        L = int(lens[j])
        oldq = (buf[qoff[j]:qoff[j] + L] + np.uint8(33)).tobytes()
        if vs[j] >= 0:
            ts, te = int(vs[j]) - 3, int(ve[j]) + 1  # tag start..NUL
            body = (wbuf[o:ts].tobytes() + wbuf[te:o + sz].tobytes())
        else:
            body = wbuf[o:o + sz].tobytes()
        body += b"OQZ" + oldq + b"\x00"
        out += _st.pack("<i", len(body)) + body
    return out


def scan_chunk(buf: np.ndarray, offs: np.ndarray, sizes: np.ndarray,
               k: int):
    """Metadata for one chunk: (n_primary, bases, kmers, max_len,
    rg_keys_in_first_appearance_order) — the vectorized twin of the
    per-record scan loop.  Appearance order is exact even when some
    records need the per-record fallback: each unique good RG name
    contributes a first-seen event at its first row, each odd row its
    own event, and the merged event order decides registration order.
    """
    f = bam_fields(buf, offs)
    flag, l_seq = f["flag"], f["l_seq"]
    prim = np.flatnonzero(((flag & 0x900) == 0) & (l_seq > 0))
    if prim.size == 0:
        return 0, 0, 0, 1, []
    pl = l_seq[prim]
    p_end = offs[prim] + sizes[prim]
    found, odd = aux_scan(buf, f["aux_off"][prim], p_end, ("RG",))
    vs, ve = found["RG"]
    events = []  # (first prim-row with this name, name)
    good_idx = np.flatnonzero(~odd)
    if good_idx.size:
        pad = _gather_short(buf, vs[good_idx], ve[good_idx])
        uniq, first, _ = _unique_rows(pad)
        for g in range(uniq.shape[0]):
            nm = bytes(uniq[g][uniq[g] != 0]).decode()
            events.append((int(good_idx[first[g]]), nm))
    for i in np.flatnonzero(odd):
        rec = record_from_body(bytearray(bytes(
            buf[offs[prim[i]]:p_end[i]])))
        tag = rec.get_zstr("RG")
        events.append((int(i), tag.decode() if tag is not None else ""))
    events.sort()
    keys, seen = [], set()
    for _, nm in events:
        if nm not in seen:
            seen.add(nm)
            keys.append(nm)
    return (int(prim.size), int(pl.sum()),
            int(np.maximum(pl - k + 1, 0).sum()), int(pl.max(initial=1)),
            keys)
