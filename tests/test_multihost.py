"""Multi-host glue tests (single-process; the collective programs are the
same shard_map code tested in test_parallel.py)."""

import numpy as np

from kbbq_tpu.parallel.multihost import (
    HostShard,
    init_multihost,
    make_global_batch,
    partition_inputs,
)
from kbbq_tpu.parallel import make_mesh


def test_init_single_process():
    info = init_multihost()
    assert info["num_processes"] == 1
    assert info["global_devices"] >= 1


def test_partition_inputs_stable_ordinals():
    paths = [f"f{i}.fq" for i in range(5)]
    counts = [100, 50, 200, 10, 40]
    shards = [partition_inputs(paths, counts, p, 2) for p in range(2)]
    # every file assigned exactly once
    all_files = sorted(p for s in shards for p, _ in s.paths)
    assert all_files == sorted(paths)
    # ordinals are the global cumulative counts of preceding files
    lookup = {p: o for s in shards for p, o in s.paths}
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for p, c in zip(paths, cum):
        assert lookup[p] == c


def test_make_global_batch_roundtrip():
    mesh = make_mesh(8)
    B, L = 16, 10
    arrs = {"codes": np.arange(B * L, dtype=np.int8).reshape(B, L),
            "rgs": np.arange(B, dtype=np.int32)}
    out = make_global_batch(mesh, arrs)
    assert out["codes"].shape == (B, L)
    assert (np.asarray(out["codes"]) == arrs["codes"]).all()
    assert (np.asarray(out["rgs"]) == arrs["rgs"]).all()


def test_metrics_pass_timer(capsys):
    from kbbq_tpu.utils.metrics import Metrics
    import io
    buf = io.StringIO()
    m = Metrics(stream=buf)
    with m.pass_timer("pass1", 1000):
        pass
    assert "pass1" in buf.getvalue()
    assert m.records[0]["event"] == "pass1"
    assert "reads_per_s" in m.records[0]
