"""Subprocess worker for the 2-process multi-host driver test.

Usage: python mh_worker.py <pid> <nproc> <coord> <workdir>
The workdir holds in0.fq/in1.fq/in2.fq; outputs go to out<i>.fq.
"""

import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, workdir = sys.argv[3], sys.argv[4]

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)

    from kbbq_tpu.parallel.multihost import (
        init_multihost,
        recalibrate_fastq_multihost,
    )
    from kbbq_tpu.pipeline import RecalConfig

    info = {
        "process_id": pid,
        "num_processes": nproc,
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
    ins = [os.path.join(workdir, f"in{i}.fq") for i in range(3)]
    outs = [os.path.join(workdir, f"out{i}.fq") for i in range(3)]
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    stats = recalibrate_fastq_multihost(ins, outs, cfg, info=info)
    print(json.dumps(stats), flush=True)


if __name__ == "__main__":
    main()
