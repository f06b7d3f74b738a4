"""Fixed-shape batcher: host arrays -> device-ready [B, Lmax] batches.

Static shapes are mandatory under jit (SURVEY.md §8.1 L0): every batch has
the same (B, Lmax); the final partial batch is padded with empty reads
(mask all-False, rg 0) which contribute nothing to any table.  Each batch
carries the global read ordinal of its first read so the per-occurrence
sampling hash (DECISIONS.md D5) is shard- and batch-invariant.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np


@dataclasses.dataclass
class ReadArrays:
    """Whole-dataset fixed-shape arrays (host, NumPy)."""

    codes: np.ndarray    # int8  [N, Lmax]   (4 = N/pad)
    quals: np.ndarray    # int8  [N, Lmax]
    mask: np.ndarray     # bool  [N, Lmax]   (True = real base)
    rgs: np.ndarray      # int32 [N]
    seconds: np.ndarray  # bool  [N]

    @property
    def num_reads(self) -> int:
        return int(self.codes.shape[0])

    @property
    def max_len(self) -> int:
        return int(self.codes.shape[1])

    @staticmethod
    def from_lists(codes_list, quals_list, rgs, seconds,
                   max_len: int | None = None) -> "ReadArrays":
        n = len(codes_list)
        L = int(max_len or max((len(c) for c in codes_list), default=1))
        codes = np.full((n, L), 4, dtype=np.int8)
        quals = np.zeros((n, L), dtype=np.int8)
        mask = np.zeros((n, L), dtype=bool)
        for i, (c, q) in enumerate(zip(codes_list, quals_list)):
            m = len(c)
            codes[i, :m] = c
            quals[i, :m] = q
            mask[i, :m] = True
        return ReadArrays(codes, quals, mask,
                          np.asarray(rgs, dtype=np.int32),
                          np.asarray(seconds, dtype=bool))


@dataclasses.dataclass
class Batch:
    codes: np.ndarray    # int8  [B, Lmax]
    quals: np.ndarray    # int8  [B, Lmax]
    mask: np.ndarray     # bool  [B, Lmax]
    rgs: np.ndarray      # int32 [B]
    seconds: np.ndarray  # bool  [B]
    read_ids: np.ndarray  # uint32 [B] global read ordinals (pads get ~0)
    num_real: int        # reads (not pads) in this batch


class Batcher:
    """Slices ReadArrays into fixed-[B, Lmax] batches with global ids."""

    def __init__(self, arrays: ReadArrays, batch_size: int,
                 start_ordinal: int = 0):
        self.arrays = arrays
        self.batch_size = int(batch_size)
        self.start_ordinal = int(start_ordinal)

    @property
    def num_batches(self) -> int:
        n = self.arrays.num_reads
        return (n + self.batch_size - 1) // self.batch_size if n else 0

    def __iter__(self) -> Iterator[Batch]:
        a = self.arrays
        B = self.batch_size
        n = a.num_reads
        for s in range(0, n, B):
            e = min(s + B, n)
            real = e - s
            pad = B - real
            codes = a.codes[s:e]
            quals = a.quals[s:e]
            mask = a.mask[s:e]
            rgs = a.rgs[s:e]
            seconds = a.seconds[s:e]
            ids = (np.arange(s, e, dtype=np.uint32)
                   + np.uint32(self.start_ordinal))
            if pad:
                L = a.max_len
                codes = np.concatenate(
                    [codes, np.full((pad, L), 4, np.int8)])
                quals = np.concatenate([quals, np.zeros((pad, L), np.int8)])
                mask = np.concatenate([mask, np.zeros((pad, L), bool)])
                rgs = np.concatenate([rgs, np.zeros(pad, np.int32)])
                seconds = np.concatenate([seconds, np.zeros(pad, bool)])
                ids = np.concatenate(
                    [ids, np.full(pad, 0xFFFFFFFF, np.uint32)])
            yield Batch(codes, quals, mask, rgs, seconds, ids, real)
