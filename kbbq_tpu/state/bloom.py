"""Device Bloom filter state (byte-per-slot uint8 in HBM).

Replicated per chip when it fits (small genomes); hash-space sharded across
the mesh for human scale (kbbq_tpu/parallel; SURVEY.md H4).  Checkpoint =
the slots array + params (SURVEY.md §6: pass-boundary checkpointing).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from ..oracle.bloom import BloomParams


@dataclasses.dataclass
class BloomState:
    params: BloomParams
    slots: jnp.ndarray  # uint8 [m] (device)

    @staticmethod
    def empty(params: BloomParams) -> "BloomState":
        return BloomState(params, jnp.zeros(params.m, dtype=jnp.uint8))

    @property
    def nbytes(self) -> int:
        return self.params.m

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.save(path + ".slots.npy", np.asarray(self.slots))
        with open(path + ".json", "w") as f:
            json.dump({"log2_m": self.params.log2_m,
                       "num_hashes": self.params.num_hashes}, f)

    @staticmethod
    def load(path: str) -> "BloomState":
        with open(path + ".json") as f:
            meta = json.load(f)
        slots = np.load(path + ".slots.npy")
        return BloomState(
            BloomParams(meta["log2_m"], meta["num_hashes"]),
            jnp.asarray(slots))
