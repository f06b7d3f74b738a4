"""Device mesh construction.

One mesh axis, ``reads``: the batch dimension of every pass shards over it
(pure data parallelism — the only axis this problem has; SURVEY.md §6
"long-context" note records why there is no sequence-parallel analog).
A second axis, ``hash``, appears at human scale when the trusted filter is
hash-space sharded (kbbq_tpu/parallel/sharded_bloom.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

READS_AXIS = "reads"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (READS_AXIS,))
