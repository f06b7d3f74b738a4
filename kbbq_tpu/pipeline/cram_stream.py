"""Streaming CRAM recalibration (SURVEY.md C7; round-3 VERDICT #6).

CRAM plugs into the resident-window streaming engine exactly like BAM:
a window source decodes containers one at a time (bounded memory,
host-chunk-cache memoized), the engine runs the four passes, and pass
4 rewrites ONLY each container's QS blocks in place (io/cram_write.py::
rewrite_container_quals) so names, tags, bases, and mate info keep
their original compressed bytes.

Per-slice decode is vectorized (io/cram_vec.py) for the all-EXTERNAL
profile htslib and io/cram_write.py emit; slices using core-bit codecs
fall back to the general per-record decoder and their containers are
re-encoded (write_cram's profile) instead of surgically patched —
identical decoded content either way (tests assert it).
"""

from __future__ import annotations

import numpy as np

from ..io.cram import CramStream, parse_compression_header, split_slices
from ..io.cram_vec import decode_slice_vec, _ragged_flat_index
from .recalibrate import RecalConfig


def _rg_key(rg_names: list, rg: int) -> str:
    return rg_names[rg] if 0 <= rg < len(rg_names) else ""


def _decode_container(comp, blocks, cont, refs, ref_names, rg_names,
                      max_len, rg_lut, registry, use_oq):
    """Per-slice decode results for one container: list of
    ("fast", (codes, quals, mask, rgs, seconds, lens, prim, n), squals)
    or ("slow", records, prim_idx).  Fast entries carry everything the
    engine and the pass-4 surgery need; slow entries keep BamRecord
    objects for re-encoding."""
    from ..io.cram import decode_slice

    out = []
    groups = split_slices(blocks)
    for group in groups:
        fast = decode_slice_vec(comp, group, refs, ref_names, max_len,
                                rg_lut, use_oq)
        if fast is None:
            break
        codes, quals, mask, rgs, seconds, lens, prim, squals = fast
        from ..io.cram import parse_slice_header
        n = parse_slice_header(group[0].data).n_records
        out.append(("fast", (codes, quals, mask, rgs, seconds,
                             lens, prim, n), squals))
    if len(out) == len(groups):
        return out
    # any fallback slice sends the WHOLE container down the general
    # decoder (pass 4 re-encodes whole containers)
    out = []
    for group in groups:
        recs = decode_slice(comp, group, cont.ref_id, refs, ref_names)
        out.append(("slow", recs, None))
    return out


def _slow_arrays(recs, max_len, registry, rg_names, use_oq):
    """(codes, quals, mask, rgs, seconds, lens, prim) from a slow-path
    record list — the per-record twin of decode_slice_vec's output."""
    from ..io.bam import machine_order_read

    prim = [i for i, r in enumerate(recs)
            if not r.is_secondary_or_supp and r.l_seq > 0]
    n = len(prim)
    codes = np.full((n, max_len), 4, np.int8)
    quals = np.zeros((n, max_len), np.int8)
    mask = np.zeros((n, max_len), bool)
    rgs = np.zeros(n, np.int32)
    seconds = np.zeros(n, bool)
    lens = np.zeros(n, np.int64)
    for j, i in enumerate(prim):
        rec = recs[i]
        c, q = machine_order_read(rec, use_oq=use_oq)
        L = c.size
        codes[j, :L] = c
        quals[j, :L] = np.clip(q, 0, 93)
        mask[j, :L] = True
        lens[j] = L
        seconds[j] = rec.is_read2
        key = _rg_key(rg_names, getattr(rec, "_cram_rg", -1))
        rgs[j] = registry.get(key, 0)
    return codes, quals, mask, rgs, seconds, lens, \
        np.asarray(prim, np.int64)


def scan_cram_meta(path: str, k: int, fasta_ref: str | None,
                   use_oq: bool = False):
    """Per-container streaming metadata pass: (metas, num_primary,
    total_bases, total_kmers, max_len, registry, rg_names, header_text).
    metas[i] = {"n_records", "n_primary", "ordinal"} for DATA container
    i (ordinal = global primary ordinal of its first primary record) —
    the shardable unit multi-host CRAM partitions on.  registry is
    RG-name -> dense id in first-appearance order over primary records,
    matching the whole-file path (pipeline/bam.py::bam_read_group_ids)."""
    from ..io.cram import parse_slice_header
    from ..io.cram_vec import scan_slice_vec

    refs = None
    if fasta_ref:
        from ..benchmark import read_fasta
        refs = read_fasta(fasta_ref)
    n = bases = tk = 0
    max_len = 1
    registry: dict[str, int] = {}
    metas: list[dict] = []
    with CramStream(path) as cs:
        rg_names = cs.rg_names
        for cont, blocks, _ in cs.containers():
            comp = parse_compression_header(blocks[0].data)
            c_prim = c_rec = 0
            ordinal0 = n
            slice_prims: list[int] = []
            for group in split_slices(blocks):
                light = scan_slice_vec(comp, group)
                if light is not None:
                    bf, rl, rg = light
                    pm = ((bf & 0x900) == 0) & (rl > 0)
                    pl = rl[pm]
                    prg = rg[pm]
                    c_rec += bf.size
                else:
                    from ..io.cram import decode_slice
                    recs = decode_slice(comp, group, cont.ref_id, refs,
                                        cs.ref_names)
                    pm_list = [r for r in recs
                               if not r.is_secondary_or_supp
                               and r.l_seq > 0]
                    pl = np.asarray([r.l_seq for r in pm_list], np.int64)
                    prg = np.asarray(
                        [getattr(r, "_cram_rg", -1) for r in pm_list],
                        np.int64)
                    c_rec += len(recs)
                n += pl.size
                c_prim += pl.size
                slice_prims.append(int(pl.size))
                bases += int(pl.sum())
                tk += int(np.maximum(pl - k + 1, 0).sum())
                if pl.size:
                    max_len = max(max_len, int(pl.max()))
                    # first-appearance registry over primary records
                    _, first = np.unique(prg, return_index=True)
                    for rgv in prg[np.sort(first)]:
                        key = _rg_key(rg_names, int(rgv))
                        if key not in registry:
                            registry[key] = len(registry)
            metas.append({"n_records": c_rec, "n_primary": c_prim,
                          "ordinal": ordinal0,
                          # per-SLICE primary counts: the multi-host
                          # step budget must count batches as the batch
                          # source emits them (one _slice_batches call
                          # per slice) or pods with multi-slice
                          # containers desynchronize their collectives
                          "slice_prims": slice_prims})
        if not registry:
            registry[""] = 0
        return (metas, n, bases, tk, max_len, registry, rg_names,
                cs.header_text)


def scan_cram(path: str, k: int, fasta_ref: str | None,
              use_oq: bool = False):
    """Whole-file metadata: (num_primary, total_bases, total_kmers,
    max_len, registry, rg_names, header_text) — scan_cram_meta minus
    the per-container rows."""
    return scan_cram_meta(path, k, fasta_ref, use_oq)[1:]


class CramWindowSource:
    """Window source over a CRAM: container-at-a-time decode re-cut
    into fixed-size windows (the CRAM twin of BamWindowSource)."""

    def __init__(self, path: str, fasta_ref: str | None, registry: dict,
                 rg_names: list, max_len: int, total_bases: int,
                 total_kmers_: int, use_oq: bool, window_reads: int):
        from .stream_resident import _HostChunkCache, _host_cache_budget
        self.path = path
        self.registry = registry
        self.rg_names = rg_names
        self.num_rg = max(1, len(registry))
        self.max_len = max_len
        self.total_bases = total_bases
        self._tk = total_kmers_
        self.use_oq = use_oq
        self.window_reads = int(window_reads)
        self._cache = _HostChunkCache(_host_cache_budget())
        self.refs = None
        if fasta_ref:
            from ..benchmark import read_fasta
            self.refs = read_fasta(fasta_ref)
        # CRAM numeric RG (+1) -> dense registry id
        lut = np.zeros(len(rg_names) + 1, np.int32)
        lut[0] = registry.get("", 0)
        for i, nm in enumerate(rg_names):
            lut[i + 1] = registry.get(nm, 0)
        self.rg_lut = lut

    def total_kmers(self, k: int) -> int:
        return self._tk

    def containers_decoded(self):
        """(cont, blocks, raw, slices) per container, memoized under
        the host cache budget; slices per _decode_container."""
        if self._cache.complete:
            yield from self._cache.items
            return
        self._cache.restart()
        with CramStream(self.path) as cs:
            ref_names = cs.ref_names
            for cont, blocks, raw in cs.containers():
                comp = parse_compression_header(blocks[0].data)
                slices = _decode_container(
                    comp, blocks, cont, self.refs, ref_names,
                    self.rg_names, self.max_len, self.rg_lut,
                    self.registry, self.use_oq)
                item = (cont, blocks, raw, slices)
                nbytes = len(raw)
                for kind, payload, _ in slices:
                    if kind == "fast":
                        nbytes += sum(np.asarray(a).nbytes
                                      for a in payload[:6])
                self._cache.add(item, nbytes)
                yield item
        self._cache.finish()

    def _decoded(self):
        for cont, blocks, raw, slices in self.containers_decoded():
            for kind, payload, _ in slices:
                if kind == "fast":
                    codes, quals, mask, rgs, seconds, lens, prim, _n = \
                        payload
                else:
                    codes, quals, mask, rgs, seconds, lens, prim = \
                        _slow_arrays(payload, self.max_len,
                                     self.registry, self.rg_names,
                                     self.use_oq)
                if prim.size:
                    yield codes, quals, mask, rgs, seconds

    def chunks(self):
        from .stream_resident import rebuffer_windows
        yield from rebuffer_windows(self._decoded(), self.window_reads)


def container_new_qs(slices, blocks, recal, max_len: int):
    """Recalibrated QS streams for one fast-path container: per slice,
    (qs_cid, new_qs_bytes) or None — the input rewrite_container_quals
    expects.  Original QS bytes are kept wherever a record's span is
    not rewritten (non-primary, CF&1 unset)."""
    from ..ops.recal import apply_recal_table_host

    # every slice carries its OWN QS block under the SAME content id,
    # so the lookup must stay within the slice's block group — a
    # container-wide search would hand slice 2 the first slice's bytes
    groups = split_slices(blocks)
    qs_new = []
    for (_, payload, squals), group in zip(slices, groups):
        codes, quals, mask, rgs, seconds, lens, prim, _n = payload
        if prim.size == 0 or squals.qs_len == 0 \
                or not squals.lens.any():
            qs_new.append(None)
            continue
        nq = apply_recal_table_host(recal, codes, quals, mask, rgs,
                                    seconds)
        # rebuild the slice's QS stream: original bytes with each
        # primary's span overwritten (re-flipped to stored orientation
        # for reverse-strand reads)
        qs_block = next(b for b in group
                        if b.content_id == squals.qs_cid
                        and b.content_type == 4)
        qs_arr = np.frombuffer(qs_block.data, np.uint8).copy()
        wl = squals.lens          # 0 where CF&1 unset
        rows_i = np.arange(prim.size, dtype=np.int64)
        vals = np.zeros((prim.size, max_len), np.uint8)
        fwd = nq.astype(np.uint8)
        for Lg in np.unique(lens):
            sel = np.flatnonzero(lens == Lg)
            Lg = int(Lg)
            v = fwd[sel, :Lg]
            r = squals.rev[sel]
            v = v.copy()
            v[r] = v[r, ::-1]
            vals[sel, :Lg] = v
        flat_src = _ragged_flat_index(
            rows_i, np.zeros(prim.size, np.int64), wl, max_len)
        flat_dst = _ragged_flat_index(
            np.zeros(prim.size, np.int64), squals.offs, wl, 0)
        qs_arr[flat_dst] = vals.reshape(-1)[flat_src]
        qs_new.append((squals.qs_cid, qs_arr.tobytes()))
    return qs_new


def rewrite_fallback_container(slices, recal, max_len: int, registry,
                               rg_names, use_oq: bool):
    """Fallback (per-record) containers: recalibrate quals in place on
    the BamRecord list and return the records for re-encoding."""
    from ..io.bam import rewrite_quals
    from ..ops.recal import apply_recal_table_host

    recs_all = []
    for kind, payload, _ in slices:
        if kind != "slow":
            raise RuntimeError(
                "mixed fast/slow slices in one container "
                "are re-encoded whole")
        recs_all.extend(payload)
    arr = _slow_arrays(recs_all, max_len, registry, rg_names, use_oq)
    codes, quals, mask, rgs, seconds, lens, prim = arr
    if prim.size:
        nq = apply_recal_table_host(recal, codes, quals, mask, rgs,
                                    seconds)
        for j, i in enumerate(prim):
            rewrite_quals(recs_all[int(i)], nq[j][:int(lens[j])],
                          set_oq=False)
    for rec in recs_all:
        if not hasattr(rec, "_rg_index"):
            rec._rg_index = getattr(rec, "_cram_rg", -1)
    return recs_all


def recalibrate_cram_stream_resident(
        in_path: str, out_path, config: RecalConfig,
        use_oq: bool = False, set_oq: bool = False,
        fasta_ref: str | None = None,
        checkpoint_dir: str | None = None,
        window_reads: int | None = None,
        timings: dict | None = None,
        report_out: str | None = None,
        apply_report: str | None = None) -> dict:
    """CRAM -> CRAM streaming recalibration, resident-window engine.

    Pass 4 rewrites each container's QS blocks in place (everything
    else byte-verbatim) for vectorized-profile containers; fallback
    containers re-encode through write_cram's profile.  set_oq is not
    supported here (it adds an OQ tag per record, which changes the
    tag streams — use the whole-file path, pipeline/bam.py::
    recalibrate_cram)."""
    import time as _time

    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from ..io.bam import machine_order_read, rewrite_quals  # noqa: F401
    from ..io.cram_write import CramStreamWriter, \
        rewrite_container_quals
    from ..ops.recal import apply_recal_table_host
    from ..io.stream import prefetch_iter
    from .stream_resident import DEFAULT_CHUNK_READS, \
        StreamResidentEngine

    if set_oq:
        raise ValueError(
            "--set-oq with streaming CRAM is unsupported; the "
            "whole-file CRAM path handles it")

    t_last = [_time.time()]

    def _mark(name):
        if timings is not None:
            now = _time.time()
            timings[name] = round(now - t_last[0], 3)
            t_last[0] = now

    window_reads = window_reads or DEFAULT_CHUNK_READS
    k = config.k
    n, bases, tk, max_len, registry, rg_names, header_text = \
        scan_cram(in_path, k, fasta_ref, use_oq)
    src = CramWindowSource(in_path, fasta_ref, registry, rg_names,
                           max_len, bases, tk, use_oq, window_reads)
    eng = StreamResidentEngine(src, config)
    _mark("scan")

    ckpt = None
    if checkpoint_dir:
        from ..state.checkpoint import Checkpoint, effective_ext_cap
        ckpt = Checkpoint(checkpoint_dir)
        fp = {"k": k, "alpha": config.alpha, "coverage": config.coverage,
              "genome_length": config.genome_length,
              "num_hashes": config.num_hashes,
              "trust_threshold": config.trust_threshold,
              "ext_cap": effective_ext_cap(config), "use_oq": use_oq,
              "num_reads": n, "total_bases": bases, "cram": True}
        ckpt.check_fingerprint(fp)

    if apply_report is not None:
        from ..gatk_report import read_gatk_report, recal_table_from_report
        from .bam import _registry_names
        recal = recal_table_from_report(
            read_gatk_report(apply_report), _registry_names(registry),
            eng.L)
        _mark("apply-table")
    else:
        rows = ckpt.load_array("rows_a") if ckpt else None
        if rows is not None:
            eng.rows_a = jnp.asarray(rows)
        else:
            eng.run_pass1()
            if ckpt:
                ckpt.save_array("rows_a", eng.rows_a)
        _mark("pass1")

        rows = ckpt.load_array("rows_b") if ckpt else None
        if rows is not None:
            eng.rows_b = jnp.asarray(rows)
        else:
            eng.run_pass2()
            if ckpt:
                ckpt.save_array("rows_b", eng.rows_b)
        _mark("pass2")

        loaded = ckpt.load_covariates() if ckpt else None
        if loaded is not None:
            eng.tables = loaded
        else:
            eng.run_pass3()
            if ckpt:
                ckpt.save_covariates(eng.tables)
        _mark("pass3")

        recal = eng.compute_recal_table()
        if report_out is not None:
            from ..gatk_report import write_gatk_report
            from .bam import _registry_names
            write_gatk_report(eng.tables, _registry_names(registry),
                              report_out)
        _mark("deltas")

    # ------------------------------------------------------- pass 4
    writer = CramStreamWriter(out_path, header_text, rg_names)
    wex = ThreadPoolExecutor(1)
    pending: list = []
    try:
        for cont, blocks, raw, slices in prefetch_iter(
                src.containers_decoded(), depth=2):
            if all(kind == "fast" for kind, _, _ in slices):
                qs_new = container_new_qs(slices, blocks, recal, max_len)
                pending.append(wex.submit(
                    lambda c, b, r, q: writer.write_raw(
                        rewrite_container_quals(c, b, r, q)),
                    cont, blocks, raw, qs_new))
            else:
                # fallback containers: rewrite record quals and
                # re-encode (write_cram's profile)
                recs_all = rewrite_fallback_container(
                    slices, recal, max_len, registry, rg_names, use_oq)
                pending.append(wex.submit(writer.write_records,
                                          recs_all))
    finally:
        for f in pending:
            f.result()
        wex.shutdown(wait=False)
        writer.close()
    _mark("pass4")

    return {"num_reads": n, "total_bases": bases,
            "read_groups": eng.num_rg, "streamed": True,
            "engine": "resident-window", "format": "cram"}
