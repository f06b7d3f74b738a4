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

_MIN_ROWS = 512  # pad small filters so each grid step serves >= 512 probes


def _probe_kernel(block_ref, h2_ref, filt_ref, out_ref, *, num_hashes):
    """block/h2 (S, 1); filt (S, 128) uint32 VMEM; out (S, 1).

    Mosaic's dynamic_gather requires operand == indices == output shape,
    so one grid step serves exactly S probes where S is the filter's row
    count: probe i (sublane i) fetches its block's whole 128-word row
    (gather along sublanes), then selects its word (gather along lanes).
    All probe bits share that one word (blocked design D3), so a single
    select answers every hash.
    """
    S = filt_ref.shape[0]
    block = block_ref[:]                       # (S, 1) int32
    h2 = h2_ref[:]                             # (S, 1) uint32
    rowidx = jnp.broadcast_to(
        jax.lax.shift_right_logical(block, 7), (S, 128))
    rows = jnp.take_along_axis(filt_ref[:], rowidx, axis=0)  # (S, 128)
    colidx = jnp.broadcast_to(block & 127, (S, 128))
    wsel = jnp.take_along_axis(rows, colidx, axis=1)         # (S, 128)
    hit = jnp.ones(wsel.shape, dtype=jnp.bool_)
    for j in range(num_hashes):
        s = _u32((j * 5) & 31)
        rot = (h2 >> s) | (h2 << ((_u32(32) - s) & _u32(31)))
        off = jnp.broadcast_to(rot & _u32(31), (S, 128))
        hit = hit & (((wsel >> off) & _u32(1)) > 0)
    out_ref[:] = hit[:, :1].astype(jnp.int32)


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

    W = packed.shape[0]
    rows = max(_MIN_ROWS, (W + 127) // 128)  # probes served per step
    filt2d = jnp.concatenate(
        [packed, jnp.zeros(rows * 128 - W, _u32)]).reshape(rows, 128)

    total = ((N + rows - 1) // rows) * rows
    bf = jnp.concatenate(
        [block.reshape(-1), jnp.zeros(total - N, jnp.int32)]
    ).reshape(total, 1)
    hf = jnp.concatenate(
        [h2.reshape(-1), jnp.zeros(total - N, _u32)]).reshape(total, 1)

    kern = functools.partial(_probe_kernel, num_hashes=num_hashes)
    out = pl.pallas_call(
        kern,
        grid=(total // rows,),
        in_specs=[
            pl.BlockSpec((rows, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 1), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, 1), jnp.int32),
        interpret=interpret,
    )(bf, hf, filt2d)
    return out.reshape(-1)[:N].reshape(shape) > 0
