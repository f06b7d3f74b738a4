"""End-to-end device recalibration pipeline (passes P1-P4).

Mirrors the reference's 4-pass control flow (SURVEY.md §4.1: subsample ->
trusted -> covariates -> rewrite) with each pass a jitted batched program;
Bloom/covariate state lives in HBM across batches with donated buffers
(no copies per batch).  Bit-exact parity authority: oracle/pipeline.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    DEFAULT_K,
    DEFAULT_NUM_HASHES,
    DEFAULT_SAMPLED_BITS_PER_KEY,
    DEFAULT_TRUSTED_BITS_PER_KEY,
    LIGHTER_ALPHA_NUMERATOR,
)
from ..io.batcher import Batch, Batcher, ReadArrays
from ..oracle.bloom import BloomParams
from ..oracle.gatk import build_recal_table
from ..oracle.kmers import alpha_threshold
from ..oracle.lighter import coverage_thresholds
from ..ops.bloom import bloom_insert_rows, bloom_query_rows, \
    bloom_rows
from ..ops.covariate import accumulate_covariates
from ..ops.inference import infer_errors
from ..ops.kmers import canonical_kmers_batch, sample_keep_mask
from ..ops.recal import apply_recal_table
from ..ops.trusted import trusted_mask_batch
from ..state.bloom import BloomState
from ..state.covariate import CovariateAccumulator


@dataclasses.dataclass
class RecalConfig:
    k: int = DEFAULT_K
    alpha: float | None = None
    coverage: float | None = None
    genome_length: int | None = None
    num_hashes: int = DEFAULT_NUM_HASHES
    sampled_bits_per_key: int = DEFAULT_SAMPLED_BITS_PER_KEY
    trusted_bits_per_key: int = DEFAULT_TRUSTED_BITS_PER_KEY
    trust_threshold: int | None = None
    ext_cap: int | None = None   # None -> DEFAULT_EXT_CAP (D7)
    # floor on both filters' log2_m (WGS pre-sizing / capacity tests);
    # bit-exact-spec relevant: filter size changes FP sets, so the
    # oracle twin (OracleConfig.min_log2_m) must be set identically
    min_log2_m: int | None = None
    batch_size: int = 512
    # walk width for pass-3 error inference (None -> ops.inference
    # WALK_CHUNK).  Wider walks amortize per-round dispatch overhead
    # over more lanes but pay max-rounds-over-width; output is
    # bit-identical at any width (tests assert it)
    walk_chunk: int | None = None
    # None = auto (KBBQ_PALLAS env); Pallas probes need the packed
    # filter to fit VMEM — gated per-filter in the pipeline
    use_pallas: bool | None = None

    def pallas_enabled(self) -> bool:
        import os
        if self.use_pallas is not None:
            return self.use_pallas
        return os.environ.get("KBBQ_PALLAS", "") == "1"

    def resolve_alpha(self, total_bases: int) -> tuple[float, float]:
        cov = self.coverage
        if cov is None and self.genome_length:
            cov = total_bases / self.genome_length
        if cov is None:
            cov = 30.0
        alpha = self.alpha
        if alpha is None:
            alpha = min(1.0, LIGHTER_ALPHA_NUMERATOR / max(cov, 1.0))
        return alpha, cov


# --------------------------------------------------------------- jit steps

@functools.partial(jax.jit, static_argnames=("k", "num_hashes"),
                   donate_argnames=("slots",))
def _step_sample(slots, codes, read_ids, threshold, *, k, num_hashes):
    hi, lo, valid = canonical_kmers_batch(codes, k)
    keep = valid & sample_keep_mask(read_ids, hi.shape[1], threshold)
    return bloom_insert_rows(slots, hi, lo, keep, num_hashes)


@functools.partial(jax.jit,
                   static_argnames=("k", "num_hashes", "trust_threshold"),
                   donate_argnames=("slots_b",))
def _step_trusted(rows_a, slots_b, codes, t_table, *, k, num_hashes,
                  trust_threshold=None):
    # NOTE: the bulk query is ALWAYS the XLA serialized gather — the
    # Pallas probe kernel cannot compile above 8 filter rows (Mosaic
    # single-vreg dynamic_gather, pinned by test_aot_tpu.py) and every
    # measured alternative is slower (docs/PERF.md round-3 microbench)
    hi, lo, valid = canonical_kmers_batch(codes, k)
    hits = bloom_query_rows(rows_a, hi, lo, num_hashes) & valid
    tr = trusted_mask_batch(hits, valid, t_table, k, trust_threshold)
    return bloom_insert_rows(slots_b, hi, lo, tr, num_hashes)


# accumulate with donated tables; error inference goes through the
# chunked wrapper (WALK_CHUNK-wide async dispatches, no host syncs —
# sync latency through the axon tunnel dominates otherwise)
_accumulate_donated = jax.jit(accumulate_covariates, donate_argnums=(0,))


# ---------------------------------------------------------------- pipeline

class RecalPipeline:
    """Runs P1-P4 over an iterable-of-batches source (single chip)."""

    def __init__(self, config: RecalConfig, num_rg: int, max_len: int,
                 total_bases: int, total_kmers: int):
        self.config = config
        self.num_rg = num_rg
        self.max_len = max_len
        self.alpha, self.coverage = config.resolve_alpha(total_bases)
        self.threshold = jnp.uint32(alpha_threshold(self.alpha))
        self.t_table = jnp.asarray(
            coverage_thresholds(self.alpha, config.k), dtype=jnp.int32)
        from ..oracle.bloom import check_layout_capacity
        from ..oracle.pipeline import bloom_params_for
        params_a, params_b = bloom_params_for(config, total_kmers,
                                              self.alpha, self.coverage)
        for p in (params_a, params_b):
            # byte-per-slot staging: 2^31 slots = 2 GiB staging per filter
            check_layout_capacity(
                p, 31, "batched staging",
                "use the streaming driver (dense builds) or "
                "--devices N --bloom-layout sharded")
        self.bloom_a = BloomState.empty(params_a)
        self.bloom_b = BloomState.empty(params_b)
        self.cov = CovariateAccumulator(
            num_rg, max_len, config.batch_size * max_len)
        self.recal_table = None
        # Pallas walk ROUND kernel (opt-in, measured slower — PERF.md):
        # only when the packed trusted filter fits VMEM
        PALLAS_VMEM_BUDGET = 13 << 20
        self.pallas_b = (config.pallas_enabled()
                         and self.bloom_b.params.m // 8
                         <= PALLAS_VMEM_BUDGET)

    def run_pass1(self, batches: Iterable[Batch]) -> None:
        k, h = self.config.k, self.config.num_hashes
        slots = self.bloom_a.slots
        for b in batches:
            slots = _step_sample(slots, jnp.asarray(b.codes),
                                 jnp.asarray(b.read_ids), self.threshold,
                                 k=k, num_hashes=h)
        jax.block_until_ready(slots)  # pass-boundary sync: deep async
        # queues across passes trigger an axon scheduling pathology
        # (~50s stalls; docs/KNOWN_ISSUES.md #6)
        self.bloom_a = BloomState(self.bloom_a.params, slots)
        self.rows_a = bloom_rows(slots)  # uint32 row view for queries

    def run_pass2(self, batches: Iterable[Batch]) -> None:
        k, h = self.config.k, self.config.num_hashes
        slots_b = self.bloom_b.slots
        for b in batches:
            slots_b = _step_trusted(self.rows_a, slots_b,
                                    jnp.asarray(b.codes), self.t_table,
                                    k=k, num_hashes=h,
                                    trust_threshold=
                                    self.config.trust_threshold)
        jax.block_until_ready(slots_b)
        self.bloom_b = BloomState(self.bloom_b.params, slots_b)
        self.rows_b = bloom_rows(slots_b)

    def run_pass3(self, batches: Iterable[Batch]) -> None:
        import os
        import sys
        import time
        dbg = os.environ.get("KBBQ_DEBUG_TIMING")
        k, h = self.config.k, self.config.num_hashes
        for bi, b in enumerate(batches):
            t0 = time.time()
            codes = jnp.asarray(b.codes)
            errors = infer_errors(self.rows_b, codes, k, h,
                                  walk_chunk=self.config.walk_chunk,
                                  ext_cap=self.config.ext_cap,
                                  use_pallas=self.pallas_b)
            t1 = time.time()
            self.cov.device_state = _accumulate_donated(
                self.cov.device_state, codes, jnp.asarray(b.quals),
                jnp.asarray(b.mask), jnp.asarray(b.rgs),
                jnp.asarray(b.seconds), errors)
            self.cov.note_batch()
            if dbg:
                jax.block_until_ready(self.cov.device_state["cyc_total"])
                print(f"[p3 b{bi}] infer={t1-t0:.3f} "
                      f"accum+block={time.time()-t1:.3f}",
                      file=sys.stderr, flush=True)
        t0 = time.time()
        jax.block_until_ready(self.cov.device_state["cyc_total"])
        if dbg:
            print(f"[p3] final block={time.time()-t0:.3f}",
                  file=sys.stderr, flush=True)
        self.cov.flush()

    def compute_recal_table(self) -> np.ndarray:
        self.recal_table = build_recal_table(self.cov.totals)
        self._recal_dev = jnp.asarray(self.recal_table)
        return self.recal_table

    def set_recal_table(self, table) -> None:
        """Install an externally-built Q' table (apply-report mode, P9)."""
        self.recal_table = np.asarray(table, np.int8)
        self._recal_dev = jnp.asarray(self.recal_table)

    def apply_recal(self, b: Batch):
        """Pass-4 gather for ONE batch; returns the device array (caller
        controls the device->host transfer overlap).  Uniform across the
        single-chip and sharded pipelines — the streaming driver's hook."""
        return apply_recal_table(
            self._recal_dev, jnp.asarray(b.codes), jnp.asarray(b.quals),
            jnp.asarray(b.mask), jnp.asarray(b.rgs),
            jnp.asarray(b.seconds))

    def run_pass4(self, batches: Iterable[Batch]) -> np.ndarray:
        from concurrent.futures import ThreadPoolExecutor
        recal = jnp.asarray(self.recal_table)
        futs, reals = [], []
        # overlap device->host transfers with subsequent batch compute
        # (device_get releases the GIL; the tunnel is the bottleneck)
        with ThreadPoolExecutor(max_workers=2) as ex:
            for b in batches:
                nq = apply_recal_table(
                    recal, jnp.asarray(b.codes), jnp.asarray(b.quals),
                    jnp.asarray(b.mask), jnp.asarray(b.rgs),
                    jnp.asarray(b.seconds))
                futs.append(ex.submit(np.asarray, nq))
                reals.append(b.num_real)
            outs = [f.result() for f in futs]
        if not outs:
            return np.zeros((0, 0))
        return np.concatenate(
            [o[:r] for o, r in zip(outs, reals)], axis=0)


def recalibrate_arrays(arrays: ReadArrays, config: RecalConfig,
                       start_ordinal: int = 0,
                       checkpoint_dir: str | None = None) -> np.ndarray:
    """Full single-chip pipeline over in-memory arrays -> new quals [N, L].

    With checkpoint_dir, completed passes are saved at their boundaries
    (SURVEY.md §6) and a rerun resumes from the first incomplete pass.
    """
    k = config.k
    lens = arrays.mask.sum(axis=1)
    total_bases = int(lens.sum())
    total_kmers = int(np.maximum(lens - k + 1, 0).sum())
    num_rg = int(arrays.rgs.max(initial=0)) + 1
    pipe = RecalPipeline(config, num_rg, arrays.max_len, total_bases,
                         total_kmers)
    mk = lambda: Batcher(arrays, config.batch_size, start_ordinal)

    ckpt = None
    if checkpoint_dir:
        from ..state.checkpoint import Checkpoint, run_fingerprint
        ckpt = Checkpoint(checkpoint_dir)
        ckpt.check_fingerprint(run_fingerprint(config, arrays))

    loaded = ckpt.load_bloom("bloom_a") if ckpt else None
    if loaded is not None:
        pipe.bloom_a = loaded
        pipe.rows_a = bloom_rows(loaded.slots)
    else:
        pipe.run_pass1(mk())
        if ckpt:
            ckpt.save_bloom("bloom_a", pipe.bloom_a)

    loaded = ckpt.load_bloom("bloom_b") if ckpt else None
    if loaded is not None:
        pipe.bloom_b = loaded
        pipe.rows_b = bloom_rows(loaded.slots)
    else:
        pipe.run_pass2(mk())
        if ckpt:
            ckpt.save_bloom("bloom_b", pipe.bloom_b)

    loaded = ckpt.load_covariates() if ckpt else None
    if loaded is not None:
        pipe.cov.totals = loaded
    else:
        pipe.run_pass3(mk())
        if ckpt:
            ckpt.save_covariates(pipe.cov.totals)

    pipe.compute_recal_table()
    return pipe.run_pass4(mk())


REPLICATED_BLOOM_BUDGET = 4 << 30  # bytes of staging per chip (v5e HBM-aware)


def run_pipeline(arrays: ReadArrays, config: RecalConfig,
                 checkpoint_dir: str | None = None,
                 devices: int | None = None,
                 bloom_layout: str = "auto",
                 start_ordinal: int = 0) -> np.ndarray:
    """Dispatch to the single-chip or sharded pipeline (all bit-identical).

    devices: None/1 = single chip; N > 1 = shard the reads axis over an
    N-device mesh.  bloom_layout chooses how the Bloom filters live on the
    mesh: 'replicated' (per-chip copy, max-merge at pass boundaries),
    'sharded' (hash-space sharded with collective probes, for filters
    that exceed per-chip HBM), or 'auto' (by estimated filter size).
    Round-1 VERDICT missing-item 3: this is the CLI's route to the
    parallel paths.
    """
    if devices is None or devices <= 1:
        # device-resident variant (one jit per pass, bit-identical —
        # tests/test_resident.py) when nothing needs per-batch hooks:
        # checkpoints restore at pass boundaries and ordinal offsets
        # belong to the streaming driver
        RESIDENT_BUDGET = 6 << 30   # ~device bytes (v5e has 16G HBM)
        if (checkpoint_dir is None and start_ordinal == 0
                and arrays.num_reads
                and arrays.num_reads * arrays.max_len * 6
                <= RESIDENT_BUDGET):
            from .resident import recalibrate_arrays_resident
            return recalibrate_arrays_resident(arrays, config)
        return recalibrate_arrays(arrays, config, start_ordinal,
                                  checkpoint_dir)
    avail = len(jax.devices())
    if devices > avail:
        raise ValueError(
            f"--devices {devices} requested but only {avail} "
            f"device(s) available")
    if config.batch_size % devices:
        raise ValueError(
            f"batch size {config.batch_size} must be divisible by "
            f"--devices {devices}")
    from ..parallel.mesh import make_mesh
    mesh = make_mesh(devices)

    if bloom_layout == "auto":
        from ..oracle.pipeline import bloom_params_for
        k = config.k
        lens = arrays.mask.sum(axis=1)
        total_kmers = int(np.maximum(lens - k + 1, 0).sum())
        alpha, coverage = config.resolve_alpha(int(lens.sum()))
        pa, pb = bloom_params_for(config, total_kmers, alpha, coverage)
        bloom_layout = ("replicated"
                        if pa.m + pb.m <= REPLICATED_BLOOM_BUDGET
                        else "sharded")
    if bloom_layout == "replicated":
        # device-resident sharded fast path (one jit per pass, dense
        # sort-built filters, OR all-reduce merge) when nothing needs
        # per-batch hooks — same gate as the single-chip resident route
        RESIDENT_BUDGET = 6 << 30
        if (checkpoint_dir is None and start_ordinal == 0
                and arrays.num_reads
                and arrays.num_reads * arrays.max_len * 6
                <= RESIDENT_BUDGET):
            from ..parallel.resident_sharded import \
                recalibrate_arrays_resident_sharded
            return recalibrate_arrays_resident_sharded(arrays, config,
                                                       mesh=mesh)
        from ..parallel.sharded import sharded_recalibrate_arrays
        return sharded_recalibrate_arrays(
            arrays, config, mesh, start_ordinal,
            checkpoint_dir=checkpoint_dir)
    if bloom_layout == "sharded":
        from ..parallel.sharded_bloom import sharded_bloom_recalibrate_arrays
        return sharded_bloom_recalibrate_arrays(
            arrays, config, mesh, start_ordinal,
            checkpoint_dir=checkpoint_dir)
    raise ValueError(f"unknown bloom layout {bloom_layout!r}")


def _load_fastq_arrays(in_paths, interleaved: bool):
    """Load FASTQ inputs into one padded ReadArrays (each input file is
    its own read group, DECISIONS.md D8): (fqs, mask_list, arrays)."""
    from ..io.fastq import extract_padded_arrays, read_fastq

    fqs = [read_fastq(p) for p in in_paths]
    parts = [extract_padded_arrays(fq) for fq in fqs]
    max_len = max((p[0].shape[1] for p in parts if p[0].shape[0]),
                  default=1)
    codes_l, quals_l, mask_l, rg_l, sec_l = [], [], [], [], []
    for rg, (fq, (codes, quals, mask, lens)) in enumerate(zip(fqs, parts)):
        pad = max_len - codes.shape[1]
        if pad:
            codes = np.pad(codes, ((0, 0), (0, pad)), constant_values=4)
            quals = np.pad(quals, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        codes_l.append(codes)
        quals_l.append(quals)
        mask_l.append(mask)
        rg_l.append(np.full(fq.num_reads, rg, np.int32))
        if interleaved:
            # D11: interleaved pairing — odd ordinals are second-in-pair
            sec_l.append(np.arange(fq.num_reads) % 2 == 1)
        else:
            sec_l.append(fq.seconds_mask())
    arrays = ReadArrays(np.concatenate(codes_l), np.concatenate(quals_l),
                        np.concatenate(mask_l), np.concatenate(rg_l),
                        np.concatenate(sec_l))
    return fqs, mask_l, arrays


def _write_fastq_outputs(fqs, mask_l, new_quals, out_paths) -> None:
    """Route per-input qual rows to out_paths (matching list, one
    concatenated sink path, or a writable)."""
    from ..io.fastq import write_fastq_with_quals

    # A single path (or file object) with multiple inputs is ONE
    # concatenated sink: open it once so later inputs append rather than
    # truncate (a str sink opened per-input with 'wb' silently kept only
    # the last file's reads — ADVICE.md round-1 high-severity finding).
    from ..io.fastq import open_fastq_sink

    opened = None
    if isinstance(out_paths, (str, bytes)) and len(fqs) > 1:
        opened = open_fastq_sink(out_paths)
        out_paths = [opened] * len(fqs)
    elif isinstance(out_paths, (str, bytes)) or not isinstance(
            out_paths, (list, tuple)):
        out_paths = [out_paths] * len(fqs)
    if len(out_paths) != len(fqs):
        raise ValueError("need one output per input (or a single sink)")
    try:
        s = 0
        for fq, mask, out in zip(fqs, mask_l, out_paths):
            e = s + fq.num_reads
            write_fastq_with_quals(fq, new_quals[s:e], mask[:fq.num_reads],
                                   out)
            s = e
    finally:
        if opened is not None:
            opened.close()


def apply_table_arrays(arrays: ReadArrays, recal_table: np.ndarray,
                       batch_size: int) -> np.ndarray:
    """Pass 4 ONLY: apply an externally-supplied recal table — the
    ApplyBQSR-equivalent compute path (reference kbbq/gatk/applybqsr.py,
    SURVEY.md §3.2 P9).  Same gather the full pipeline's pass 4 uses,
    so a table rebuilt from a report reproduces the direct run."""
    from concurrent.futures import ThreadPoolExecutor

    recal = jnp.asarray(recal_table)
    futs, reals = [], []
    with ThreadPoolExecutor(max_workers=2) as ex:
        for b in Batcher(arrays, batch_size):
            nq = apply_recal_table(
                recal, jnp.asarray(b.codes), jnp.asarray(b.quals),
                jnp.asarray(b.mask), jnp.asarray(b.rgs),
                jnp.asarray(b.seconds))
            futs.append(ex.submit(np.asarray, nq))
            reals.append(b.num_real)
        outs = [f.result() for f in futs]
    if not outs:
        return np.zeros((0, 0), np.int8)
    return np.concatenate([o[:r] for o, r in zip(outs, reals)], axis=0)


def _run_or_apply(arrays, config, rg_names, report_out, apply_report,
                  **run_kwargs):
    """Engine dispatch for report-interop-aware drivers (P9):
    apply_report -> pass-4-only from a parsed GATKReport; report_out ->
    full pipeline + report emission; else the plain pipeline."""
    if apply_report is not None:
        from ..gatk_report import read_gatk_report, recal_table_from_report
        table = recal_table_from_report(
            read_gatk_report(apply_report), rg_names, arrays.max_len)
        return apply_table_arrays(arrays, table, config.batch_size)
    if report_out is not None:
        from ..gatk_report import write_gatk_report
        from ..oracle.gatk import captured_tables
        with captured_tables() as cap:
            new_quals = run_pipeline(arrays, config, **run_kwargs)
        write_gatk_report(cap["tables"], rg_names, report_out)
        return new_quals
    return run_pipeline(arrays, config, **run_kwargs)


def recalibrate_fastq(in_paths, out_paths, config: RecalConfig,
                      checkpoint_dir: str | None = None,
                      interleaved: bool = False,
                      devices: int | None = None,
                      bloom_layout: str = "auto",
                      report_out: str | None = None,
                      apply_report: str | None = None) -> dict:
    """FASTQ -> FASTQ recalibration (the reference CLI's main flow).

    Accepts one path or a list; each input file is its own read group
    (DECISIONS.md D8).  out_paths: matching list, a single path, or a
    writable (outputs concatenated in input order).

    report_out: also write the computed covariates as a GATKReport.
    apply_report: SKIP passes 1-3 and recalibrate from a previously
    written report instead (ApplyBQSR-equivalent; read groups match by
    input path, so pass the same inputs in the same order).
    """
    if isinstance(in_paths, (str, bytes)):
        in_paths = [in_paths]
    fqs, mask_l, arrays = _load_fastq_arrays(in_paths, interleaved)
    new_quals = _run_or_apply(arrays, config,
                              [str(p) for p in in_paths],
                              report_out, apply_report,
                              checkpoint_dir=checkpoint_dir,
                              devices=devices, bloom_layout=bloom_layout)
    _write_fastq_outputs(fqs, mask_l, new_quals, out_paths)
    return {"num_reads": arrays.num_reads,
            "total_bases": int(arrays.mask.sum()),
            "read_groups": len(fqs)}
