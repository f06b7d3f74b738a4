"""BAM recalibration path (SURVEY.md §4.2; BASELINE config 3).

Same 4-pass pipeline as FASTQ; differences handled at the IO boundary:
machine-order re-orientation, RG-tag read groups, --use-oq / --set-oq,
secondary/supplementary records passed through untouched.
"""

from __future__ import annotations

import numpy as np

from ..io.bam import (
    machine_order_read,
    rewrite_quals,
    serialize_bam,
)
from ..io.batcher import ReadArrays
from .recalibrate import RecalConfig


class BamStreamingBatches:
    """Re-iterable fixed-shape Batch source streaming a BAM's PRIMARY
    records (machine order, RG registry, optional OQ quals)."""

    def __init__(self, path: str, registry: dict, batch_size: int,
                 max_len: int, use_oq: bool,
                 chunk_records: int | None = None):
        from ..io.bam_stream import DEFAULT_CHUNK_RECORDS
        self.path = path
        self.registry = registry
        self.batch_size = batch_size
        self.max_len = max_len
        self.use_oq = use_oq
        self.chunk_records = chunk_records or DEFAULT_CHUNK_RECORDS

    def _chunk_arrays(self):
        from ..io.bam_stream import iter_bam_raw_chunks
        from ..io.bam_vec import decode_machine_chunk
        _, _, chunks = iter_bam_raw_chunks(self.path, self.chunk_records)
        ordinal = 0
        for buf, offs, sizes in chunks:
            codes, quals, mask, rgs, seconds, _, prim = \
                decode_machine_chunk(buf, offs, sizes, self.max_len,
                                     self.registry, use_oq=self.use_oq)
            n = prim.size
            if not n:
                continue
            ids = np.arange(ordinal, ordinal + n, dtype=np.uint32)
            ordinal += n
            yield codes, quals, mask, rgs, seconds, ids

    def __iter__(self):
        from ..io.stream import _slice_batches, prefetch_iter
        for arrs in prefetch_iter(self._chunk_arrays(), depth=2):
            yield from _slice_batches(arrs, self.batch_size, self.max_len)


def scan_bam(path: str, k: int, use_oq: bool = False,
             chunk_records: int | None = None):
    """Streaming metadata pass: (num_primary, total_bases, total_kmers,
    max_len, registry) — registry is RG-tag -> dense id in
    first-appearance order over primary records.  Whole-chunk vectorized
    (io/bam_vec.py::scan_chunk); no per-record objects."""
    from ..io.bam_stream import DEFAULT_CHUNK_RECORDS, iter_bam_raw_chunks
    from ..io.bam_vec import scan_chunk
    _, _, chunks = iter_bam_raw_chunks(
        path, chunk_records or DEFAULT_CHUNK_RECORDS)
    n = bases = tk = 0
    max_len = 1
    registry: dict[str, int] = {}
    for buf, offs, sizes in chunks:
        cn, cb, ck, cl, keys = scan_chunk(buf, offs, sizes, k)
        n += cn
        bases += cb
        tk += ck
        max_len = max(max_len, cl)
        for key in keys:
            if key not in registry:
                registry[key] = len(registry)
    return n, bases, tk, max_len, registry


def recalibrate_bam_streaming(in_path: str, out_path, config: RecalConfig,
                              use_oq: bool = False, set_oq: bool = False,
                              checkpoint_dir: str | None = None,
                              devices: int | None = None,
                              bloom_layout: str = "auto",
                              chunk_records: int | None = None,
                              report_out: str | None = None,
                              apply_report: str | None = None) -> dict:
    """BAM -> BAM recalibration with O(chunk) host memory: every pass
    re-streams records through the incremental BGZF codec; pass 4 writes
    records out as they are rewritten (secondary/supplementary pass
    through untouched)."""
    from ..io.bam_stream import DEFAULT_CHUNK_RECORDS, BamStreamWriter
    from ..io.stream import _slice_batches, prefetch_iter
    from .streaming import _make_pipeline

    if devices is None or devices <= 1:
        # resident-window engine: one jit per pass per read window
        # instead of one dispatch per batch — bit-identical
        from .stream_resident import recalibrate_bam_stream_resident
        return recalibrate_bam_stream_resident(
            in_path, out_path, config, use_oq=use_oq, set_oq=set_oq,
            checkpoint_dir=checkpoint_dir, chunk_records=chunk_records,
            report_out=report_out, apply_report=apply_report)

    chunk_records = chunk_records or DEFAULT_CHUNK_RECORDS
    k = config.k
    n, bases, tk, max_len, registry = scan_bam(in_path, k, use_oq,
                                               chunk_records)
    num_rg = max(1, len(registry))
    pipe, kind = _make_pipeline(config, num_rg, max_len, bases, tk,
                                devices, bloom_layout)

    ckpt = None
    if checkpoint_dir:
        from ..state.checkpoint import Checkpoint, effective_ext_cap
        ckpt = Checkpoint(checkpoint_dir)
        fp = {"k": k, "alpha": config.alpha, "coverage": config.coverage,
              "genome_length": config.genome_length,
              "num_hashes": config.num_hashes,
              "trust_threshold": config.trust_threshold,
              "ext_cap": effective_ext_cap(config), "use_oq": use_oq,
              "num_reads": n, "total_bases": bases, "bam": True}
        ckpt.check_fingerprint(fp)

    def mk():
        return BamStreamingBatches(in_path, registry, config.batch_size,
                                   max_len, use_oq, chunk_records)

    from .streaming import _get_rows, _load_rows
    if apply_report is not None:
        from ..gatk_report import read_gatk_report, recal_table_from_report
        pipe.set_recal_table(recal_table_from_report(
            read_gatk_report(apply_report), _registry_names(registry),
            max_len))
    else:
        rows = ckpt.load_array("rows_a") if ckpt else None
        if rows is not None:
            _load_rows(pipe, kind, "a", rows)
        else:
            pipe.run_pass1(mk())
            if ckpt:
                ckpt.save_array("rows_a", _get_rows(pipe, kind, "a"))
        rows = ckpt.load_array("rows_b") if ckpt else None
        if rows is not None:
            _load_rows(pipe, kind, "b", rows)
        else:
            pipe.run_pass2(mk())
            if ckpt:
                ckpt.save_array("rows_b", _get_rows(pipe, kind, "b"))
        loaded = ckpt.load_covariates() if ckpt else None
        if loaded is not None:
            pipe.cov.totals = loaded
        else:
            pipe.run_pass3(mk())
            if ckpt:
                ckpt.save_covariates(pipe.cov.totals)
        pipe.compute_recal_table()
        if report_out is not None:
            from ..gatk_report import write_gatk_report
            write_gatk_report(pipe.cov.totals, _registry_names(registry),
                              report_out)

    # pass 4: re-stream ALL records; rewrite primaries whole-chunk
    # (vectorized decode + in-buffer qual scatter, io/bam_vec.py) and
    # write the chunk bytes out verbatim — non-primary records pass
    # through untouched by construction
    from ..io.bam_stream import iter_bam_raw_chunks
    from ..io.bam_vec import decode_machine_chunk, rewrite_quals_chunk
    header_text, refs, chunks = iter_bam_raw_chunks(in_path, chunk_records)
    writer = BamStreamWriter(out_path, header_text, refs)
    B = config.batch_size
    try:
        for buf, offs, sizes in prefetch_iter(chunks, depth=2):
            codes, quals, mask, rgs, seconds, lens, prim = \
                decode_machine_chunk(buf, offs, sizes, max_len,
                                     registry, use_oq=use_oq)
            if prim.size:
                ids = np.zeros(prim.size, np.uint32)  # unused in pass 4
                rows_out = []
                for b in _slice_batches(
                        (codes, quals, mask, rgs, seconds, ids),
                        B, max_len):
                    rows_out.append(
                        np.asarray(pipe.apply_recal(b))[:b.num_real])
                new_q = np.concatenate(rows_out, axis=0)
                writer.write_raw(rewrite_quals_chunk(
                    buf, offs, sizes, prim, lens, new_q, set_oq=set_oq))
            else:
                writer.write_raw(buf)
    finally:
        writer.close()

    return {"num_reads": n, "total_bases": bases,
            "read_groups": num_rg, "streamed": True}


def recalibrate_cram(in_path: str, out_path, config: RecalConfig,
                     use_oq: bool = False, set_oq: bool = False,
                     fasta_ref: str | None = None,
                     checkpoint_dir: str | None = None,
                     devices: int | None = None,
                     bloom_layout: str = "auto",
                     report_out: str | None = None,
                     apply_report: str | None = None) -> dict:
    """CRAM input (SURVEY.md C7: the reference reads CRAM via htslib).

    Decoded records share the BAM record model (io/cram.py), so the
    whole recalibration path is the BAM one; output format follows the
    output extension (.cram re-encodes via io/cram_write.py, else BAM).
    """
    from ..io.cram import read_cram
    from .recalibrate import _run_or_apply

    bf, _ = read_cram(in_path, fasta_ref=fasta_ref)
    primary = [r for r in bf.records
               if not r.is_secondary_or_supp and r.l_seq > 0]
    codes_list, quals_list, seconds = [], [], []
    for rec in primary:
        c, q = machine_order_read(rec, use_oq=use_oq)
        codes_list.append(c)
        quals_list.append(np.clip(q, 0, 93).astype(np.int8))
        seconds.append(rec.is_read2)
    rgs, registry = bam_read_group_ids(bf, primary)
    lens = np.asarray([len(c) for c in codes_list], np.int64)
    max_len = int(lens.max(initial=1))
    arrays = ReadArrays.from_lists(codes_list, quals_list, rgs, seconds,
                                   max_len=max_len)
    new_quals = _run_or_apply(arrays, config, _registry_names(registry),
                              report_out, apply_report,
                              checkpoint_dir=checkpoint_dir,
                              devices=devices, bloom_layout=bloom_layout)
    total_bases = 0
    for i, rec in enumerate(primary):
        L = int(lens[i])
        total_bases += L
        rewrite_quals(rec, new_quals[i][:L], set_oq=set_oq)

    _write_alignment_output(bf, out_path, "bam", primary, rgs, registry)
    return {"num_reads": len(primary), "total_bases": total_bases,
            "read_groups": len(registry)}


def bam_read_group_ids(bf, records):
    """Dense RG index per record (registry order = first appearance);
    records without an RG tag share group 0 of a default registry."""
    registry: dict[str, int] = {}
    rgs = np.zeros(len(records), dtype=np.int32)
    for i, rec in enumerate(records):
        tag = rec.get_zstr("RG")
        key = tag.decode() if tag is not None else ""
        if key not in registry:
            registry[key] = len(registry)
        rgs[i] = registry[key]
    return rgs, registry


def _registry_names(registry: dict) -> list:
    """Registry (RG tag -> dense id) back to names in dense-id order —
    the ReadGroup labels GATK-report interop keys on (P9)."""
    return [k for k, _ in sorted(registry.items(), key=lambda kv: kv[1])]


def recalibrate_bam(in_path: str, out_path, config: RecalConfig,
                    use_oq: bool = False, set_oq: bool = False,
                    checkpoint_dir: str | None = None,
                    devices: int | None = None,
                    bloom_layout: str = "auto",
                    report_out: str | None = None,
                    apply_report: str | None = None) -> dict:
    from .recalibrate import _run_or_apply

    # SAM text and BAM share one record model (htslib sam_read1 duality,
    # SURVEY.md C7); the serializer matches the input format
    is_sam = str(in_path).endswith((".sam", ".sam.gz"))
    if is_sam:
        from ..io.sam import read_sam
        bf = read_sam(in_path)
        buf = None
    else:
        from ..io import bgzf
        from ..io.bam import parse_bam_bytes_indexed
        with open(in_path, "rb") as f:
            data = f.read()
        if bgzf.is_bgzf(data[:18]):
            data = bgzf.decompress(data)
        elif data[:2] == b"\x1f\x8b":
            import gzip
            data = gzip.decompress(data)
        bf, buf, offs, sizes = parse_bam_bytes_indexed(data)
    primary = [r for r in bf.records
               if not r.is_secondary_or_supp and r.l_seq > 0]

    if buf is not None:
        # whole-file vectorized decode (io/bam_vec.py) — the per-record
        # loop was the BAM-mode bottleneck (round-2 VERDICT weak-item 4)
        from ..io.bam_vec import decode_machine_chunk, scan_chunk
        _, _, _, max_len, keys = scan_chunk(buf, offs, sizes, config.k)
        registry = {key: i for i, key in enumerate(keys)}
        codes, quals, mask, rgs, seconds, lens, _ = decode_machine_chunk(
            buf, offs, sizes, max_len, registry, use_oq=use_oq)
        arrays = ReadArrays(codes, quals, mask, rgs, seconds)
    else:
        codes_list, quals_list, seconds = [], [], []
        for rec in primary:
            c, q = machine_order_read(rec, use_oq=use_oq)
            codes_list.append(c)
            quals_list.append(np.clip(q, 0, 93).astype(np.int8))
            seconds.append(rec.is_read2)
        rgs, registry = bam_read_group_ids(bf, primary)
        lens = np.asarray([len(c) for c in codes_list], np.int64)
        max_len = int(lens.max(initial=1))
        arrays = ReadArrays.from_lists(codes_list, quals_list, rgs,
                                       seconds, max_len=max_len)
    new_quals = _run_or_apply(arrays, config, _registry_names(registry),
                              report_out, apply_report,
                              checkpoint_dir=checkpoint_dir,
                              devices=devices, bloom_layout=bloom_layout)

    total_bases = 0
    for i, rec in enumerate(primary):
        L = int(lens[i])
        total_bases += L
        rewrite_quals(rec, new_quals[i][:L], set_oq=set_oq)

    _write_alignment_output(bf, out_path, "sam" if is_sam else "bam",
                            primary, rgs, registry)
    return {"num_reads": len(primary), "total_bases": total_bases,
            "read_groups": len(registry)}


def _assign_cram_rg(bf, primary, rgs, registry) -> None:
    """Numeric RG per record for the CRAM writer.

    The CRAM wire format's RG integer indexes the HEADER's @RG line
    order — which need NOT match the registry's record-first-appearance
    order (a read file whose first record carries the header's second
    RG would silently swap groups on write).  So map each record's RG
    NAME (via the registry's dense id for primaries, the RG:Z tag
    otherwise) to its header index."""
    hdr_idx: dict[str, int] = {}
    for ln in bf.header_text.splitlines():
        if ln.startswith("@RG"):
            for fld in ln.split("\t")[1:]:
                if fld.startswith("ID:"):
                    hdr_idx.setdefault(fld[3:], len(hdr_idx))
    name_of = {v: k for k, v in registry.items()}
    for i, rec in enumerate(primary):
        rec._rg_index = hdr_idx.get(name_of.get(int(rgs[i]), ""), -1)
    for rec in bf.records:
        if hasattr(rec, "_rg_index"):
            continue
        tag = rec.get_zstr("RG")
        key = tag.decode() if tag is not None else ""
        rec._rg_index = hdr_idx.get(key, -1)


def _write_alignment_output(bf, out_path, default_fmt: str, primary,
                            rgs, registry) -> None:
    """Serialize by OUTPUT extension — .sam / .bam / .cram — the
    htslib-style format-polymorphic sink (SURVEY.md C7); unnamed sinks
    (stdout, file objects) keep the input's format."""
    name = out_path if isinstance(out_path, (str, bytes)) else None
    sfx = (name.decode() if isinstance(name, bytes) else name) or ""
    if sfx.endswith(".sam"):
        fmt = "sam"
    elif sfx.endswith(".cram"):
        fmt = "cram"
    elif sfx.endswith(".bam"):
        fmt = "bam"
    else:
        fmt = default_fmt
    if fmt == "cram":
        from ..io.cram_write import write_cram
        _assign_cram_rg(bf, primary, rgs, registry)
        write_cram(bf, out_path)
        return
    if fmt == "sam":
        from ..io.sam import serialize_sam
        data = serialize_sam(bf)
    else:
        data = serialize_bam(bf, compress=True)
    if isinstance(out_path, (str, bytes)):
        with open(out_path, "wb") as f:
            f.write(data)
    else:
        out_path.write(data)
