"""Multi-host runtime (BASELINE config 5; SURVEY.md §3.3 / §6).

Replaces the NCCL/MPI world of GPU frameworks with the TPU-native stack:
`jax.distributed.initialize` + GSPMD global arrays; intra-slice traffic
rides ICI, cross-host covariate merges ride DCN — all through the same
shard_map programs as single-host (kbbq_tpu/parallel/sharded*.py), which
operate on global arrays and are host-count agnostic.

This module provides the host-side glue that cannot be expressed in XLA:
process initialization, per-host input partitioning, and global-array
assembly from host-local batches.  It is exercised in CI via the
single-process CPU mesh (the collective programs are identical); real
multi-host runs only need `init_multihost()` + per-host file lists.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> dict:
    """Initialize jax.distributed (no-op when single-process).

    Args resolve from env (JAX_COORDINATOR, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) when not given — the standard TPU pod launch shape.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes, process_id=process_id)
    return {
        "process_id": process_id,
        "num_processes": num_processes,
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


@dataclasses.dataclass
class HostShard:
    """This host's slice of the global read stream.

    Reads are partitioned by contiguous ranges so global read ordinals
    (the sampling keys, DECISIONS.md D5) stay stable: host h of H
    processes reads [h*N/H, (h+1)*N/H) and passes start_ordinal
    accordingly — output bits are independent of H (SURVEY.md H5).
    """
    paths: list
    start_ordinal: int


def partition_inputs(paths: list, read_counts: list,
                     process_id: int, num_processes: int) -> HostShard:
    """Whole files are assigned round-robin by cumulative read count;
    start_ordinal = total reads in files assigned to lower-id... files
    preceding this host's files in global order."""
    assert len(paths) == len(read_counts)
    mine = []
    start = None
    ordinal = 0
    for i, (p, n) in enumerate(zip(paths, read_counts)):
        if i % num_processes == process_id:
            if start is None:
                start = ordinal
            mine.append((p, ordinal))
        ordinal += n
    return HostShard(paths=mine, start_ordinal=start or 0)


def make_global_batch(mesh, host_arrays: dict):
    """Assemble a global array from per-host local batches.

    host_arrays: dict of numpy arrays whose leading dim is this host's
    local batch rows.  Uses
    jax.make_array_from_process_local_data so each host contributes its
    shard without materializing the global array anywhere.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in host_arrays.items():
        spec = P(mesh.axis_names[0], *([None] * (v.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
