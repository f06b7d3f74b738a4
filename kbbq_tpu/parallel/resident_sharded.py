"""Device-resident SHARDED pipeline: the multi-chip twin of
pipeline/resident.py — whole dataset staged sharded over the reads axis,
ONE jit dispatch per pass, dense sort-built Bloom filters per shard with
an OR all-reduce merge.

Layout (SURVEY.md §3.3):
- codes/quals/mask/ids [Npad, L]: sharded on axis 0 over the 1-D reads
  mesh; Npad is padded to D * B * ceil(...) so every device scans the
  same number of fixed-size local batches (B // D rows each).
- Bloom filters: built per shard from the shard's k-mers via the dense
  sort build (ops/bloom.py::bloom_rows_dense — no serialized scatter),
  then OR-merged across devices with an all_gather + fold.  OR commutes,
  so the merged filter is bit-identical to the single-chip one.
- covariate tables: accumulated on the HOST over bit-packed per-shard
  error masks (ops/covariate_host.py) — quals/mask/rgs/seconds never
  cross the link; integer adds commute -> shard-count invariant
  (SURVEY.md H5).
- pass 4 runs on HOST via the native C++ kernel (ops/recal.py), exactly
  as the single-chip resident path — the recal table is tiny and the
  gather is output-bound.

Bit-identity vs the single-chip pipeline is asserted for 1/2/8 devices
in tests/test_parallel.py.  Reference analog: the single while-loop of
pub:src/kbbq/recalibrateutils.cc (SURVEY.md §3.1 C2; mount empty, §0) —
parallelism is this framework's addition per BASELINE.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..io.batcher import ReadArrays
from ..oracle.bloom import BloomParams
from ..oracle.gatk import build_recal_table
from ..oracle.kmers import alpha_threshold
from ..oracle.lighter import coverage_thresholds
from ..ops.bloom import bloom_query_rows, bloom_rows_dense, probe_words
from ..ops.inference import WALK_CHUNK, infer_errors
from ..ops.kmers import canonical_kmers_batch, sample_keep_mask
from ..ops.recal import apply_recal_table_host
from ..ops.trusted import trusted_mask_batch
from ..pipeline.recalibrate import RecalConfig
from .mesh import READS_AXIS, make_mesh

R = READS_AXIS


def _or_merge(rows_local):
    """Replicated OR of per-device packed filters (inside shard_map)."""
    g = jax.lax.all_gather(rows_local, R)          # [D, m/32]
    D = g.shape[0]
    out = g[0]
    for d in range(1, D):
        out = out | g[d]
    return out


def _shmap(mesh, in_specs, out_specs):
    return functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)


def build_resident_sharded(mesh: Mesh, *, k: int, num_hashes: int,
                           trust_threshold, ext_cap, log2_ma: int,
                           log2_mb: int, Bd: int, num_rg: int,
                           max_len: int, walk_chunk: int):
    """One jitted fn per pass per SLICE, each a shard_map over the reads
    axis.  Passes 1/2 accumulate into a donated per-device local filter
    and merge once at the end — so staging h2d of later slices hides
    under compute on earlier ones, the multi-chip twin of
    pipeline/resident.py's slice overlap (round-2 VERDICT weak #5).
    Read ids are derived on device from the slice offset (the ids array
    never crosses the link)."""
    D = int(mesh.devices.size)

    def _slice_ids(off, nreal, local_rows):
        """Global ordinals for this device's rows of the slice (pads ->
        0xFFFFFFFF), from traced scalars only."""
        d = jax.lax.axis_index(R).astype(jnp.uint32)
        row = d * jnp.uint32(local_rows) + jax.lax.iota(jnp.uint32,
                                                        local_rows)
        return jnp.where(row < nreal.astype(jnp.uint32),
                         off.astype(jnp.uint32) + row,
                         jnp.uint32(0xFFFFFFFF))

    def scan_batches(codes, body):
        nb = codes.shape[0] // Bd
        _, out = jax.lax.scan(
            lambda _, i: (None, body(i)), None, jnp.arange(nb))
        return out

    @_shmap(mesh, in_specs=(P(R, None), P(R, None), P(), P(), P()),
            out_specs=P(R, None))
    def pass1_window(rows_acc, codes, off, nreal, threshold):
        local_rows = codes.shape[0]
        ids = _slice_ids(off, nreal, local_rows)

        def body(i):
            c = jax.lax.dynamic_slice_in_dim(codes, i * Bd, Bd, 0)
            rid = jax.lax.dynamic_slice_in_dim(ids, i * Bd, Bd, 0)
            hi, lo, valid = canonical_kmers_batch(c, k)
            keep = valid & sample_keep_mask(rid, hi.shape[1], threshold)
            blk, w = probe_words(hi, lo, num_hashes, log2_ma)
            return blk.reshape(-1), w.reshape(-1), keep.reshape(-1)

        blks, ws, keeps = scan_batches(codes, body)
        rows = bloom_rows_dense(blks.reshape(-1), ws.reshape(-1),
                                keeps.reshape(-1), log2_ma)
        return rows_acc | rows[None]

    @_shmap(mesh, in_specs=(P(None), P(R, None), P(R, None), P()),
            out_specs=P(R, None))
    def pass2_window(rows_a, rows_acc, codes, t_table):
        def body(i):
            c = jax.lax.dynamic_slice_in_dim(codes, i * Bd, Bd, 0)
            hi, lo, valid = canonical_kmers_batch(c, k)
            hits = bloom_query_rows(rows_a, hi, lo, num_hashes) & valid
            tr = trusted_mask_batch(hits, valid, t_table, k,
                                    trust_threshold)
            blk, w = probe_words(hi, lo, num_hashes, log2_mb)
            return blk.reshape(-1), w.reshape(-1), tr.reshape(-1)

        blks, ws, trs = scan_batches(codes, body)
        rows = bloom_rows_dense(blks.reshape(-1), ws.reshape(-1),
                                trs.reshape(-1), log2_mb)
        return rows_acc | rows[None]

    pass1_window = jax.jit(pass1_window, donate_argnums=(0,))
    pass2_window = jax.jit(pass2_window, donate_argnums=(1,))

    @jax.jit
    @_shmap(mesh, in_specs=(P(R, None),), out_specs=P(None))
    def merge_rows(rows_acc):
        return _or_merge(rows_acc[0])

    def _walk_shard(rows_b, codes):
        def body(_, i):
            c = jax.lax.dynamic_slice_in_dim(codes, i * Bd, Bd, 0)
            errors = infer_errors(rows_b, c, k, num_hashes,
                                  walk_chunk=walk_chunk, ext_cap=ext_cap)
            return None, errors

        nb = codes.shape[0] // Bd
        _, errs = jax.lax.scan(body, None, jnp.arange(nb))
        return errs

    @jax.jit
    @_shmap(mesh, in_specs=(P(None), P(R, None)), out_specs=P(R, None))
    def pass3_dense(rows_b, codes):
        """Walks only; the error mask returns BIT-PACKED per shard
        ([D, local_rows*L/8] bytes d2h) and the covariate histogram
        runs on the HOST (ops/covariate_host.py) over the quals that
        never left host RAM — same design as the single-chip resident
        driver.  Exact-fallback twin of pass3_sparse (compiled lazily:
        only an overflowing, error-dense input ever calls it)."""
        return jnp.packbits(_walk_shard(rows_b, codes).reshape(-1))[None]

    def make_pass3_sparse(cap: int):
        @jax.jit
        @_shmap(mesh, in_specs=(P(None), P(R, None)), out_specs=P(R, None))
        def pass3_sparse(rows_b, codes):
            """Sparse per-shard error transport (count at [:, 0], sorted
            local flat indices after), the multi-chip twin of
            pipeline/resident.py::_sparse_error_idx — error marks are
            ~0.5-1% of bases, so indices at a 1/64 capacity halve the
            dense d2h bytes.  A shard whose count exceeds `cap` makes
            the caller re-fetch via pass3_dense."""
            flat = _walk_shard(rows_b, codes).reshape(-1)
            n = flat.shape[0]
            iota = jax.lax.iota(jnp.int32, n)
            ks = jax.lax.sort(jnp.where(flat, iota, jnp.int32(n)))
            cnt = jnp.sum(flat.astype(jnp.int32))
            return jnp.concatenate([cnt[None], ks[:cap]])[None]

        return pass3_sparse

    return pass1_window, pass2_window, merge_rows, make_pass3_sparse, \
        pass3_dense


# rows per staged slice, in units of global batches: big enough to keep
# per-dispatch overhead negligible, small enough that slice h2d overlaps
# pass-1 compute on earlier slices
SLICE_BATCHES = 8


def recalibrate_arrays_resident_sharded(
        arrays: ReadArrays, config: RecalConfig,
        mesh: Mesh | None = None,
        timings: dict | None = None) -> np.ndarray:
    """Full sharded pipeline: slice-staged codes (async device_put per
    slice, h2d hidden under pass-1 windows), one window dispatch per
    slice per pass with a donated per-device filter accumulator, host
    covariate accumulation overlapping pass-3 walks.  Bit-identical to
    the single-chip pipelines for any device count (tests assert it)."""
    import concurrent.futures as _cf
    import time as _time
    t_last = [_time.time()]

    def _mark(name):
        if timings is not None:
            now = _time.time()
            timings[name] = round(now - t_last[0], 3)
            t_last[0] = now

    mesh = mesh or make_mesh()
    D = int(mesh.devices.size)
    B = config.batch_size
    if B % D:
        raise ValueError(f"batch_size {B} not divisible by {D} devices")
    Bd = B // D
    k, h = config.k, config.num_hashes

    N = arrays.num_reads
    L = arrays.max_len
    lens = arrays.mask.sum(axis=1)
    total_bases = int(lens.sum())
    total_kmers = int(np.maximum(lens - k + 1, 0).sum())
    num_rg = int(arrays.rgs.max(initial=0)) + 1
    alpha, coverage = config.resolve_alpha(total_bases)
    threshold = jnp.uint32(alpha_threshold(alpha))
    t_table = jnp.asarray(coverage_thresholds(alpha, k), dtype=jnp.int32)
    from ..oracle.bloom import check_layout_capacity
    from ..oracle.pipeline import bloom_params_for
    params_a, params_b = bloom_params_for(config, total_kmers, alpha,
                                          coverage)
    for p in (params_a, params_b):
        # replicated dense builds: packed rows per chip (m/8 bytes)
        check_layout_capacity(p, 33, "replicated resident",
                              "use --bloom-layout sharded")

    # pad rows to a whole number of GLOBAL batches (D * Bd)
    nb = max(1, (N + B - 1) // B)
    npad = nb * B
    rows_slice = min(npad, SLICE_BATCHES * B)
    starts = list(range(0, npad, rows_slice))

    # only codes cross the link (ids derive on device from the slice
    # offset): quals/mask/rgs/seconds stay in host RAM for the host
    # covariate accumulation and host pass 4
    sharding = NamedSharding(mesh, P(R, None))

    def _put_slice(s: int):
        e = min(npad, s + rows_slice)
        c = arrays.codes[s:min(e, N)]
        pad_rows = (e - s) - c.shape[0]
        if pad_rows:
            c = np.concatenate(
                [c, np.full((pad_rows, L), 4, np.int8)])
        return jax.device_put(c, sharding)

    _put_ex = _cf.ThreadPoolExecutor(1)
    slice_futs = [(s, _put_ex.submit(_put_slice, s)) for s in starts]
    _mark("h2d")  # puts are async; waits surface inside pass1

    pass1_window, pass2_window, merge_rows, make_pass3_sparse, \
        pass3_dense = build_resident_sharded(
            mesh, k=k, num_hashes=h,
            trust_threshold=config.trust_threshold,
            ext_cap=config.ext_cap,
            log2_ma=int(params_a.m).bit_length() - 1,
            log2_mb=int(params_b.m).bit_length() - 1,
            Bd=Bd, num_rg=num_rg, max_len=L,
            walk_chunk=config.walk_chunk or WALK_CHUNK)

    ma32 = int(params_a.m) // 32
    mb32 = int(params_b.m) // 32
    acc_a = jax.device_put(np.zeros((D, ma32), np.uint32), sharding)
    slices = []   # (start, nreal_rows, codes_dev) — stays on device
    h2d_waits = []
    for s, f in slice_futs:
        t0 = _time.time()
        c = f.result()
        h2d_waits.append(round(_time.time() - t0, 3))
        nreal = max(0, min(N - s, rows_slice if s + rows_slice <= npad
                           else npad - s))
        slices.append((s, nreal, c))
        acc_a = pass1_window(acc_a, c, jnp.uint32(s), jnp.uint32(nreal),
                             threshold)
    rows_a = merge_rows(acc_a)
    jax.block_until_ready(rows_a)
    if timings is not None:
        timings["h2d_waits"] = h2d_waits
    _mark("pass1")

    acc_b = jax.device_put(np.zeros((D, mb32), np.uint32), sharding)
    for s, nreal, c in slices:
        acc_b = pass2_window(rows_a, acc_b, c, t_table)
    rows_b = merge_rows(acc_b)
    jax.block_until_ready(rows_b)
    _mark("pass2")

    from ..ops.covariate_host import accumulate_covariates_host
    from ..oracle.covariate import CovariateTables
    from ..pipeline.resident import sparse_err_cap
    tables = CovariateTables(num_rg, L)
    _acc_ex = _cf.ThreadPoolExecutor(1)

    def _accum_slice(s, nreal, enc_dev, dense_fallback):
        """Fold one slice's device error transport into the host tables
        (runs on the worker thread, overlapping the next slice's walks)."""
        local_rows = (min(npad, s + rows_slice) - s) // D
        local_n = local_rows * L
        enc = np.asarray(enc_dev)
        if enc.ndim == 2 and enc.shape[1] and not dense_fallback:
            cap = enc.shape[1] - 1
            if (enc[:, 0] > cap).any():
                enc = np.asarray(dense_fetch(s))
                dense_fallback = True
        if dense_fallback:
            err_flat = np.concatenate(
                [np.unpackbits(enc[d], count=local_n) for d in range(D)])
            err_idx = np.flatnonzero(err_flat).astype(np.int64)
        else:
            err_idx = np.concatenate(
                [enc[d, 1:1 + enc[d, 0]].astype(np.int64) + d * local_n
                 for d in range(D)])
        err_idx = err_idx[err_idx < nreal * L]
        accumulate_covariates_host(
            arrays.codes[s:s + nreal], arrays.quals[s:s + nreal],
            arrays.mask[s:s + nreal], arrays.rgs[s:s + nreal],
            arrays.seconds[s:s + nreal], err_idx, num_rg, L,
            tables=tables)

    def dense_fetch(s):
        _, _, c = next(t for t in slices if t[0] == s)
        return pass3_dense(rows_b, c)

    futs = []
    sparse_fns: dict = {}  # cap -> jitted fn (one per distinct slice size)
    for s, nreal, c in slices:
        local_n = ((min(npad, s + rows_slice) - s) // D) * L
        if local_n < 2 ** 31:
            # sparse transport: int32 iota + local_n sentinel would wrap
            # at >= 2^31 local bases — such shards go straight to dense
            cap = sparse_err_cap(local_n)
            fn = sparse_fns.get(cap)
            if fn is None:
                fn = sparse_fns[cap] = make_pass3_sparse(cap)
            futs.append(_acc_ex.submit(_accum_slice, s, nreal,
                                       fn(rows_b, c), False))
        else:
            futs.append(_acc_ex.submit(_accum_slice, s, nreal,
                                       pass3_dense(rows_b, c), True))
    for f in futs:
        f.result()
    _acc_ex.shutdown(wait=False)
    _put_ex.shutdown(wait=False)
    totals = tables
    _mark("pass3")

    recal = build_recal_table(totals)
    _mark("deltas")

    res = apply_recal_table_host(recal, arrays.codes, arrays.quals,
                                 arrays.mask, arrays.rgs, arrays.seconds)
    _mark("pass4")
    return res
