"""Pallas TPU kernels: VMEM-resident Bloom filter query.

The round-1 trace analysis (docs/PERF.md) showed the pipeline ceiling is
XLA's serialized HBM gathers on exactly the Bloom probe ops.  The
TPU-native fix is architectural, not micro-optimization: the PACKED
filter row view for an E. coli-scale genome is ~14 MB — it FITS IN VMEM
(~16 MB/core on v5e).  Inside a Pallas kernel the filter is pinned in
VMEM for the whole call, so every probe is an on-chip access instead of
a serialized HBM transaction, and the k-mer scan + hash + bit-test fuse
into the same kernel (zero HBM round-trips per window).

At human scale the filter exceeds VMEM; there the hash-space-sharded
layout (parallel/sharded_bloom.py) splits it across chips — each shard
fits VMEM again on >= 16 chips, so this kernel composes with the
collective query.

Kernels are bit-exact twins of ops/kmers.py + ops/bloom.py (same scan
recurrence, same fmix32 double hash, same blocked probe layout) and are
tested against them in interpret mode on CPU; the TPU compile path is
gated by KBBQ_PALLAS (axon remote-compile availability varies, see
docs/KNOWN_ISSUES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    FMIX32_C1,
    FMIX32_C2,
    HASH_SEED_H1,
    HASH_SEED_H2,
)

_u32 = jnp.uint32
LANES = 256  # reads per kernel call; two 128-lane vectors


def _fmix32(x):
    x = x ^ (x >> 16)
    x = x * _u32(FMIX32_C1)
    x = x ^ (x >> 13)
    x = x * _u32(FMIX32_C2)
    x = x ^ (x >> 16)
    return x


def _query_kernel(codes_ref, filt_ref, out_ref, *, k, num_hashes,
                  log2_m, L):
    """codes [L, R] int32 (transposed!), filt [m/32] uint32 (VMEM),
    out [n, R] int32 (1 = filter hit & valid window).

    One fori_loop over base positions carries the rolling forward/RC
    lanes (the ops/kmers.py scan recurrence); at each step with a full
    valid window it canonicalizes, hashes, fetches the window's single
    block word from the VMEM-resident filter and tests all probe bits.
    """
    n = L - k + 1
    R = codes_ref.shape[1]

    if k >= 17:
        mask_hi = _u32((1 << (2 * k - 32)) - 1)
        rc_shift = 2 * k - 34
    else:
        mask_lo = _u32((1 << (2 * k)) - 1)
        rc_shift = 2 * k - 2

    words = filt_ref.shape[0]
    block_mask = _u32((1 << (log2_m - 5)) - 1)

    def step(t, carry):
        fh, fl, rh, rl, run = carry
        c = codes_ref[t, :].astype(jnp.int32).reshape(1, R)
        valid = c < 4
        cc = jnp.where(valid, c, 0).astype(_u32)
        comp = _u32(3) - cc
        if k >= 17:
            nfh = ((fh << 2) | (fl >> 30)) & mask_hi
            nfl = fl << 2 | cc
            nrl = (rl >> 2) | ((rh & _u32(3)) << 30)
            nrh = ((rh >> 2) | (comp << rc_shift)) & mask_hi
        else:
            nfh = jnp.zeros_like(fh)
            nfl = ((fl << 2) | cc) & mask_lo
            nrl = ((rl >> 2) | (comp << rc_shift)) & mask_lo
            nrh = jnp.zeros_like(rh)
        z = _u32(0)
        nfh = jnp.where(valid, nfh, z)
        nfl = jnp.where(valid, nfl, z)
        nrh = jnp.where(valid, nrh, z)
        nrl = jnp.where(valid, nrl, z)
        nrun = jnp.where(valid, run + 1, 0)

        @pl.when(t >= k - 1)
        def _():
            # canonical = min(fwd, rc) by (hi, lo) unsigned compare
            fwd_le = (nfh < nrh) | ((nfh == nrh) & (nfl <= nrl))
            hi = jnp.where(fwd_le, nfh, nrh)
            lo = jnp.where(fwd_le, nfl, nrl)
            h1 = _fmix32(lo ^ _fmix32(hi ^ _u32(HASH_SEED_H1)))
            h2 = _fmix32(hi ^ _fmix32(lo ^ _u32(HASH_SEED_H2)))
            block = (h1 & block_mask).astype(jnp.int32)
            # THE op that makes this kernel worth writing: a dynamic
            # per-lane fetch served from VMEM instead of HBM
            word = jnp.take(filt_ref[:], block.reshape(R), axis=0,
                            indices_are_sorted=False,
                            unique_indices=False).reshape(1, R)
            hit = jnp.ones((1, R), dtype=jnp.bool_)
            for j in range(num_hashes):
                s = _u32((j * 5) & 31)
                rot = (h2 >> s) | (h2 << ((_u32(32) - s) & _u32(31)))
                off = rot & _u32(31)
                bit = (word >> off) & _u32(1)
                hit = hit & (bit > 0)
            ok = hit & (nrun >= k)
            out_ref[t - (k - 1), :] = ok.astype(jnp.int32).reshape(R)

        return nfh, nfl, nrh, nrl, nrun

    z = jnp.zeros((1, R), dtype=_u32)
    zi = jnp.zeros((1, R), dtype=jnp.int32)
    jax.lax.fori_loop(0, L, step, (z, z, z, z, zi))


def _probe_kernel(hi_ref, lo_ref, filt_ref, out_ref, *, num_hashes,
                  log2_m):
    """hi/lo [rows, 128] uint32 -> hit int32 [rows, 128]; filter VMEM."""
    hi = hi_ref[:]
    lo = lo_ref[:]
    h1 = _fmix32(lo ^ _fmix32(hi ^ _u32(HASH_SEED_H1)))
    h2 = _fmix32(hi ^ _fmix32(lo ^ _u32(HASH_SEED_H2)))
    block = (h1 & _u32((1 << (log2_m - 5)) - 1)).astype(jnp.int32)
    shape = block.shape
    word = jnp.take(filt_ref[:], block.reshape(-1), axis=0).reshape(shape)
    hit = jnp.ones(shape, dtype=jnp.bool_)
    for j in range(num_hashes):
        s = _u32((j * 5) & 31)
        rot = (h2 >> s) | (h2 << ((_u32(32) - s) & _u32(31)))
        off = rot & _u32(31)
        hit = hit & (((word >> off) & _u32(1)) > 0)
    out_ref[:] = hit.astype(jnp.int32)


_PROBE_ROWS = 512  # 512x128 = 64k probes per grid step


@functools.partial(jax.jit, static_argnames=("num_hashes", "interpret"))
def bloom_query_rows_pallas(packed: jax.Array, hi: jax.Array,
                            lo: jax.Array, num_hashes: int,
                            interpret: bool | None = None) -> jax.Array:
    """Drop-in twin of ops.bloom.bloom_query_rows with the filter pinned
    in VMEM — plugs straight into infer_errors_core's query_fn, so the
    walk rounds probe on-chip memory instead of HBM.

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (CPU tests exercise the same kernel code path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    log2_m = int(packed.shape[0] * 32).bit_length() - 1
    shape = hi.shape
    N = hi.size
    cols = 128
    rows = max(1, (N + cols - 1) // cols)
    grid_rows = min(_PROBE_ROWS, rows)
    pad_rows = (-rows) % grid_rows
    total = (rows + pad_rows) * cols
    hif = jnp.concatenate(
        [hi.reshape(-1), jnp.zeros(total - N, _u32)]).reshape(-1, cols)
    lof = jnp.concatenate(
        [lo.reshape(-1), jnp.zeros(total - N, _u32)]).reshape(-1, cols)
    G = hif.shape[0] // grid_rows
    kern = functools.partial(_probe_kernel, num_hashes=num_hashes,
                             log2_m=log2_m)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((grid_rows, cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid_rows, cols), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((grid_rows, cols), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(hif.shape, jnp.int32),
        interpret=interpret,
    )(hif, lof, packed)
    return out.reshape(-1)[:N].reshape(shape) > 0


@functools.partial(jax.jit,
                   static_argnames=("k", "num_hashes", "interpret"))
def bloom_query_windows_pallas(packed: jax.Array, codes: jax.Array,
                               k: int, num_hashes: int,
                               interpret: bool | None = None) -> jax.Array:
    """Fused scan+hash+probe for every window of every read.

    packed: uint32 [m/32] (must fit VMEM, <= ~3.5M words on v5e);
    codes: int8 [B, L].  Returns bool [B, n] == bloom_query_rows(
    packed, *canonical_kmers_batch(codes, k)) & valid — the pass-2 hits
    query and the pass-3 initial trust query.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L = codes.shape
    n = L - k + 1
    log2_m = int(packed.shape[0] * 32).bit_length() - 1
    R = LANES  # fixed lane width: TPU tiling wants 128-multiples
    pad = (-B) % R
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.full((pad, L), 4, jnp.int8)], axis=0)
    ct = codes.astype(jnp.int32).T  # [L, B+pad]
    G = ct.shape[1] // R

    kern = functools.partial(_query_kernel, k=k, num_hashes=num_hashes,
                             log2_m=log2_m, L=L)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((L, R), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole filter
        ],
        out_specs=pl.BlockSpec((n, R), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ct.shape[1]), jnp.int32),
        interpret=interpret,
    )(ct, packed)
    return (out.T[:B] > 0)
