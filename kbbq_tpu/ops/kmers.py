"""Batched JAX k-mer kernels: rolling canonical packing + 32-bit hashing.

Bit-exact twins of kbbq_tpu/oracle/kmers.py (DECISIONS.md D1-D3, D5).
Design notes (SURVEY.md H3): k-mers are (hi, lo) uint32 lane pairs — no
int64 on TPU; the packer is a length-L `lax.scan` carrying 4 uint32 lanes
per read, vectorized over the batch (VPU elementwise work, O(B*L), vs
O(B*L*k) for naive per-window packing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import (
    FMIX32_C1,
    FMIX32_C2,
    HASH_SEED_H1,
    HASH_SEED_H2,
    HASH_SEED_SAMPLE,
)

_u32 = jnp.uint32


def fmix32(x: jax.Array) -> jax.Array:
    """murmur3 finalizer on uint32 arrays (oracle: kmers.fmix32)."""
    x = x.astype(_u32)
    x = x ^ (x >> 16)
    x = x * _u32(FMIX32_C1)
    x = x ^ (x >> 13)
    x = x * _u32(FMIX32_C2)
    x = x ^ (x >> 16)
    return x


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_lanes_batch(codes: jax.Array, k: int):
    """Raw forward/RC lane pairs for every window of every read.

    Args:
      codes: int8 [B, L] base codes (4 = N/pad).
      k: static k-mer size (<= 32).
    Returns:
      (fhi, flo, rhi, rlo, valid): uint32 x4 + bool, each [B, n], n = L-k+1.
      Lane values of invalid windows are unspecified (scan resets on N).

    The fast inference kernel patches these lanes in place on substitution
    (O(1) per window) instead of re-rolling the window (O(k)).
    """
    B, L = codes.shape
    n = L - k + 1
    assert n >= 1, "read length must be >= k"

    if k >= 17:
        mask_hi = _u32((1 << (2 * k - 32)) - 1)
        rc_shift = 2 * k - 34  # comp << rc_shift into hi lane
    else:
        mask_lo = _u32((1 << (2 * k)) - 1)
        rc_shift = 2 * k - 2

    def step(carry, c):
        fh, fl, rh, rl, run = carry
        c = c.astype(jnp.int32)
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
        out_valid = nrun >= k
        return ((nfh, nfl, nrh, nrl, nrun),
                (nfh, nfl, nrh, nrl, out_valid))

    z = jnp.zeros((B,), dtype=_u32)
    init = (z, z, z, z, jnp.zeros((B,), dtype=jnp.int32))
    _, (fhi, flo, rhi, rlo, valid) = jax.lax.scan(step, init, codes.T)
    # emitted at step i describes window j = i-k+1
    return (fhi[k - 1:].T, flo[k - 1:].T, rhi[k - 1:].T, rlo[k - 1:].T,
            valid[k - 1:].T)


def canonical_from_lanes(fhi, flo, rhi, rlo):
    """min(forward, rc) by (hi, lo) unsigned compare (oracle D2)."""
    fwd_le = (fhi < rhi) | ((fhi == rhi) & (flo <= rlo))
    return jnp.where(fwd_le, fhi, rhi), jnp.where(fwd_le, flo, rlo)


@functools.partial(jax.jit, static_argnames=("k",))
def canonical_kmers_batch(codes: jax.Array, k: int):
    """Canonical k-mers for every window of every read.

    Returns (hi, lo, valid): uint32/uint32/bool [B, n] with n = L-k+1.
    Matches oracle canonical_kmers exactly.
    """
    fhi, flo, rhi, rlo, valid = kmer_lanes_batch(codes, k)
    hi, lo = canonical_from_lanes(fhi, flo, rhi, rlo)
    return hi, lo, valid


def kmer_hashes(hi: jax.Array, lo: jax.Array):
    """(h1, h2): block selector / in-block offsets (oracle: kmer_hashes)."""
    hi = hi.astype(_u32)
    lo = lo.astype(_u32)
    h1 = fmix32(lo ^ fmix32(hi ^ _u32(HASH_SEED_H1)))
    h2 = fmix32(hi ^ fmix32(lo ^ _u32(HASH_SEED_H2)))
    return h1, h2


def sample_keep_mask(read_ids: jax.Array, num_windows: int,
                     threshold) -> jax.Array:
    """Per-occurrence sampling decisions (oracle: sample_hash; D5).

    Args:
      read_ids: uint32 [B] global read ordinals.
      num_windows: static window count n.
      threshold: uint32 scalar (inclusive keep threshold).
    Returns: bool [B, n].
    """
    r = read_ids.astype(_u32)[:, None]
    j = jax.lax.broadcasted_iota(_u32, (1, num_windows), 1)
    s = fmix32(fmix32(r ^ _u32(HASH_SEED_SAMPLE)) ^ (j * _u32(0x9E3779B9)))
    return s <= _u32(threshold)
