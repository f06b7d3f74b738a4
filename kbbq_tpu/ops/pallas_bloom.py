"""Pallas TPU kernels: VMEM-resident Bloom filter probes.

The round-1 trace analysis (docs/PERF.md) showed the pipeline ceiling is
XLA's serialized HBM gathers on exactly the Bloom probe ops.  The
TPU-native fix is architectural, not micro-optimization: the PACKED
filter row view for an E. coli-scale genome is ~4-14 MB — it FITS IN
VMEM (~16 MB/core on v5e).  Inside a Pallas kernel the filter is pinned
in VMEM for the whole call, so every probe is an on-chip access instead
of a serialized HBM transaction.

Mosaic constraint (measured on hardware 2026-08-17): only 2-D gathers
lower, so the filter is laid out [W/128, 128] and each probe fetches its
block's whole 128-word ROW (embedding-style row gather); the probe's
word is then selected with an iota-compare + lane reduction.  Hash math
stays in XLA outside the kernel (elementwise work XLA already does
perfectly); the kernel is exactly the part XLA does badly.

At human scale the filter exceeds VMEM; there the hash-space-sharded
layout (parallel/sharded_bloom.py) splits it across chips — each shard
fits VMEM again on >= 16 chips, so this kernel composes with the
collective query.

Bit-exact twin of ops/bloom.py::bloom_query_rows (same blocked layout,
same probe derivation), tested against it in interpret mode on CPU and
for compiled parity on the TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kmers import kmer_hashes

_u32 = jnp.uint32

_QT = 1024  # probes per grid step: [1024, 128] row-gather = 512 KB


def _probe_kernel(block_ref, h2_ref, filt_ref, out_ref, *, num_hashes):
    """block/h2 (QT, 1); filt (rows, 128) uint32 VMEM; out (QT, 1).

    out = 1 iff all num_hashes probe bits of the block word are set.
    """
    block = block_ref[:]                       # (QT, 1) int32
    h2 = h2_ref[:]                             # (QT, 1) uint32
    rowidx = jax.lax.shift_right_logical(block, 7).reshape(-1)
    rows = jnp.take(filt_ref[:], rowidx, axis=0)       # (QT, 128)
    col = (block & 127)                        # (QT, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    word = jnp.sum(jnp.where(lane == col, rows, _u32(0)),
                   axis=1, keepdims=True).astype(_u32)  # (QT, 1)
    hit = jnp.ones(word.shape, dtype=jnp.bool_)
    for j in range(num_hashes):
        s = _u32((j * 5) & 31)
        rot = (h2 >> s) | (h2 << ((_u32(32) - s) & _u32(31)))
        off = rot & _u32(31)
        hit = hit & (((word >> off) & _u32(1)) > 0)
    out_ref[:] = hit.astype(jnp.int32)


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

    # hash math in XLA (elementwise, fuses fine); kernel does the fetch
    h1, h2 = kmer_hashes(hi, lo)
    block = (h1 & _u32((1 << (log2_m - 5)) - 1)).astype(jnp.int32)

    shape = block.shape
    N = block.size
    total = ((N + _QT - 1) // _QT) * _QT
    bf = jnp.concatenate(
        [block.reshape(-1), jnp.zeros(total - N, jnp.int32)]
    ).reshape(total, 1)
    hf = jnp.concatenate(
        [h2.reshape(-1), jnp.zeros(total - N, _u32)]).reshape(total, 1)

    W = packed.shape[0]
    Wr = ((W + 127) // 128) * 128
    filt2d = jnp.concatenate(
        [packed, jnp.zeros(Wr - W, _u32)]).reshape(Wr // 128, 128)

    kern = functools.partial(_probe_kernel, num_hashes=num_hashes)
    out = pl.pallas_call(
        kern,
        grid=(total // _QT,),
        in_specs=[
            pl.BlockSpec((_QT, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_QT, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_QT, 1), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, 1), jnp.int32),
        interpret=interpret,
    )(bf, hf, filt2d)
    return out.reshape(-1)[:N].reshape(shape) > 0
