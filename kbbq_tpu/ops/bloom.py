"""JAX Bloom filter ops over a byte-per-slot uint8 array (D3/D4).

Insert = scatter-set (no read-modify-write: all writes store 1, so
collisions commute — sharding cannot change the result, SURVEY.md H5).
Query = gather + all-reduce over the probe axis.  Twin: oracle/bloom.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .kmers import kmer_hashes

_u32 = jnp.uint32


def probe_positions(hi: jax.Array, lo: jax.Array, num_hashes: int,
                    log2_m: int) -> jax.Array:
    """uint32 [..., num_hashes] slot indices (oracle: probe_positions)."""
    h1, h2 = kmer_hashes(hi, lo)
    i = jax.lax.broadcasted_iota(_u32, (num_hashes,), 0)
    pos = h1[..., None] + i * h2[..., None]
    return pos & _u32((1 << log2_m) - 1)


def bloom_insert(slots: jax.Array, hi: jax.Array, lo: jax.Array,
                 mask: jax.Array, num_hashes: int) -> jax.Array:
    """Set probe slots for masked k-mers. slots: uint8 [m] (donated).

    Masked-out entries are routed out of bounds and dropped.
    """
    m = slots.shape[0]
    log2_m = int(m).bit_length() - 1
    assert (1 << log2_m) == m, "bloom size must be a power of two"
    pos = probe_positions(hi, lo, num_hashes, log2_m).astype(jnp.int32)
    oob = jnp.int32(m)
    pos = jnp.where(mask[..., None], pos, oob)
    return slots.at[pos.reshape(-1)].set(
        jnp.uint8(1), mode="drop", indices_are_sorted=False,
        unique_indices=False)


def bloom_query(slots: jax.Array, hi: jax.Array, lo: jax.Array,
                num_hashes: int) -> jax.Array:
    """Membership per k-mer: bool [...]. All probe slots must be 1."""
    m = slots.shape[0]
    log2_m = int(m).bit_length() - 1
    pos = probe_positions(hi, lo, num_hashes, log2_m).astype(jnp.int32)
    got = slots[pos]
    return jnp.min(got, axis=-1) > 0
