"""Oracle Bloom filter: byte-per-slot, double hashing (DECISIONS.md D3/D4).

Mirrors the device layout exactly (kbbq_tpu/state/bloom.py): a uint8 array of
2^log2_m slots, h probes per key at (h1 + i*h2) & (m-1).  Reference analog:
bloom.cc/.hh in adamjorr/kbbq (SURVEY.md §3.1 C3; mount empty, see §0).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..constants import (
    DEFAULT_NUM_HASHES,
    MIN_BLOOM_LOG2,
)
from .kmers import kmer_hashes, probe_positions


@dataclasses.dataclass(frozen=True)
class BloomParams:
    log2_m: int
    num_hashes: int = DEFAULT_NUM_HASHES

    @property
    def m(self) -> int:
        return 1 << self.log2_m

    @staticmethod
    def for_keys(expected_keys: int, slots_per_key: int,
                 num_hashes: int = DEFAULT_NUM_HASHES) -> "BloomParams":
        slots = max(1, expected_keys) * slots_per_key
        log2_m = max(MIN_BLOOM_LOG2, math.ceil(math.log2(max(2, slots))))
        # cap at 2^31 slots: positions are int32 on device; beyond this
        # scale the filter is hash-space sharded (parallel/sharded_bloom)
        return BloomParams(log2_m=min(log2_m, 31), num_hashes=num_hashes)

    def fpr(self, inserted_keys: int) -> float:
        """Classic Bloom FPR estimate for the current sizing."""
        m, h = self.m, self.num_hashes
        return (1.0 - math.exp(-h * inserted_keys / m)) ** h


class OracleBloom:
    """NumPy byte-per-slot Bloom filter over (hi, lo) uint32 k-mer lanes."""

    def __init__(self, params: BloomParams):
        self.params = params
        self.slots = np.zeros(params.m, dtype=np.uint8)

    def _positions(self, hi, lo):
        h1, h2 = kmer_hashes(hi, lo)
        return probe_positions(h1, h2, self.params.num_hashes, self.params.log2_m)

    def insert(self, hi, lo, mask=None):
        """Insert k-mers; mask selects which entries to insert (bool [...])."""
        pos = self._positions(hi, lo)  # [..., h]
        if mask is not None:
            pos = pos[np.asarray(mask, dtype=bool)]
        self.slots[pos.reshape(-1)] = 1

    def query(self, hi, lo) -> np.ndarray:
        """Membership per k-mer: bool [...]. All h probe slots must be set."""
        pos = self._positions(hi, lo)
        return self.slots[pos].all(axis=-1)
