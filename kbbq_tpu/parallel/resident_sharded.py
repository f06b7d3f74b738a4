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
    """One jitted fn per pass, each a shard_map over the reads axis."""

    def scan_batches(codes, body):
        nb = codes.shape[0] // Bd
        _, out = jax.lax.scan(
            lambda _, i: (None, body(i)), None, jnp.arange(nb))
        return out

    @jax.jit
    @_shmap(mesh, in_specs=(P(R, None), P(R), P()), out_specs=P(None))
    def pass1(codes, ids, threshold):
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
        return _or_merge(rows)

    @jax.jit
    @_shmap(mesh, in_specs=(P(None), P(R, None), P()), out_specs=P(None))
    def pass2(rows_a, codes, t_table):
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
        return _or_merge(rows)

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

    return pass1, pass2, make_pass3_sparse, pass3_dense


def recalibrate_arrays_resident_sharded(
        arrays: ReadArrays, config: RecalConfig,
        mesh: Mesh | None = None,
        timings: dict | None = None) -> np.ndarray:
    """Full sharded pipeline, one dispatch per pass.  Bit-identical to
    the single-chip pipelines for any device count (tests assert it)."""
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
    from ..oracle.pipeline import expected_bloom_keys
    n_a, n_b = expected_bloom_keys(total_kmers, alpha, coverage)
    params_a = BloomParams.for_keys(n_a, config.sampled_bits_per_key, h)
    params_b = BloomParams.for_keys(n_b, config.trusted_bits_per_key, h)

    # pad rows to a whole number of GLOBAL batches (D * Bd)
    nb = max(1, (N + B - 1) // B)
    npad = nb * B
    pad = npad - N

    def p2(a, fill):
        if not pad:
            return a
        return np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)])

    # only codes + ids cross the link: quals/mask/rgs/seconds stay in
    # host RAM for the host covariate accumulation and host pass 4
    sh = lambda a, *rest: jax.device_put(
        a, NamedSharding(mesh, P(R, *rest)))
    codes = sh(p2(arrays.codes, 4), None)
    ids_h = np.arange(npad, dtype=np.uint32)
    ids_h[N:] = 0xFFFFFFFF
    ids = sh(ids_h)
    jax.block_until_ready(codes)
    _mark("h2d")

    pass1, pass2, make_pass3_sparse, pass3_dense = build_resident_sharded(
        mesh, k=k, num_hashes=h, trust_threshold=config.trust_threshold,
        ext_cap=config.ext_cap,
        log2_ma=int(params_a.m).bit_length() - 1,
        log2_mb=int(params_b.m).bit_length() - 1,
        Bd=Bd, num_rg=num_rg, max_len=L,
        walk_chunk=config.walk_chunk or WALK_CHUNK)

    rows_a = pass1(codes, ids, threshold)
    jax.block_until_ready(rows_a)
    _mark("pass1")
    rows_b = pass2(rows_a, codes, t_table)
    jax.block_until_ready(rows_b)
    _mark("pass2")
    rows_per_dev = npad // D
    local_n = rows_per_dev * L
    from ..pipeline.resident import sparse_err_cap
    # the sparse transport indexes local flat bases with an int32 iota +
    # a local_n sentinel: shards holding >= 2^31 local bases would wrap
    # silently — route those straight to the exact dense bit transport
    enc = None
    if local_n < 2 ** 31:
        cap = sparse_err_cap(local_n)
        enc = np.asarray(make_pass3_sparse(cap)(rows_b, codes))  # [D, cap+1]
        if (enc[:, 0] > cap).any():
            # error-dense shard (adversarial input): the sparse transport
            # overflowed its capacity — fall back to dense bits
            enc = None
    if enc is None:
        errbits = np.asarray(pass3_dense(rows_b, codes))
        err_flat = np.concatenate(
            [np.unpackbits(errbits[d], count=local_n) for d in range(D)])
        err_idx = np.flatnonzero(err_flat[:N * L]).astype(np.int64)
    else:
        err_idx = np.concatenate(
            [enc[d, 1:1 + enc[d, 0]].astype(np.int64) + d * local_n
             for d in range(D)])
        err_idx = err_idx[err_idx < N * L]
    from ..ops.covariate_host import accumulate_covariates_host
    totals = accumulate_covariates_host(
        arrays.codes, arrays.quals, arrays.mask, arrays.rgs,
        arrays.seconds, err_idx, num_rg, L)
    _mark("pass3")

    recal = build_recal_table(totals)
    _mark("deltas")

    res = apply_recal_table_host(recal, arrays.codes, arrays.quals,
                                 arrays.mask, arrays.rgs, arrays.seconds)
    _mark("pass4")
    return res
