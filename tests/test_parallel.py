"""Shard-invariance tests (SURVEY.md §5.4): output must be bit-identical
for 1, 2 and 8 device shards, and identical to the single-chip pipeline."""

import numpy as np
import pytest

from kbbq_tpu.io.batcher import ReadArrays
from kbbq_tpu.parallel import make_mesh, sharded_recalibrate_arrays
from kbbq_tpu.pipeline import RecalConfig, recalibrate_arrays
from kbbq_tpu.utils.synth import make_dataset


@pytest.fixture(scope="module")
def arrays():
    ds = make_dataset(genome_len=800, read_len=50, coverage=20.0,
                      error_rate=0.02, seed=31, num_rg=2, paired=True,
                      n_rate=0.01)
    return ReadArrays.from_lists(ds.codes, ds.quals, ds.rgs, ds.seconds)


@pytest.fixture(scope="module")
def single_chip_quals(arrays):
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    return recalibrate_arrays(arrays, cfg)


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sharded_matches_single_chip(arrays, single_chip_quals, ndev):
    import jax
    assert jax.device_count() >= ndev, "conftest should give 8 CPU devices"
    mesh = make_mesh(ndev)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    got = sharded_recalibrate_arrays(arrays, cfg, mesh=mesh)
    assert got.shape == single_chip_quals.shape
    assert (got == single_chip_quals).all()


def test_batch_size_must_divide_devices(arrays):
    mesh = make_mesh(8)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=63)
    with pytest.raises(ValueError, match="not divisible"):
        sharded_recalibrate_arrays(arrays, cfg, mesh=mesh)


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_bloom_matches_single_chip(arrays, single_chip_quals, ndev):
    """Hash-space-sharded filter (config 4) is bit-identical too."""
    from kbbq_tpu.parallel.sharded_bloom import \
        sharded_bloom_recalibrate_arrays
    mesh = make_mesh(ndev)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    got = sharded_bloom_recalibrate_arrays(arrays, cfg, mesh=mesh)
    assert got.shape == single_chip_quals.shape
    assert (got == single_chip_quals).all()


def test_sharded_bloom_overflow_fallback(arrays, single_chip_quals,
                                         monkeypatch):
    """Forcing the bucket-exchange capacity to overflow must route every
    step through the all-gather fallback with identical output bits."""
    from kbbq_tpu.parallel import sharded_bloom as sb
    monkeypatch.setattr(sb, "CAP_SLACK", 1e-6)
    monkeypatch.setattr(sb, "_CAP_PAD", 1)
    mesh = make_mesh(4)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    got = sb.sharded_bloom_recalibrate_arrays(arrays, cfg, mesh=mesh)
    assert (got == single_chip_quals).all()


@pytest.mark.parametrize("layout", ["replicated", "sharded", "auto"])
def test_run_pipeline_dispatch(arrays, single_chip_quals, layout):
    """The CLI-reachable dispatcher routes --devices to the sharded
    pipelines and stays bit-identical (round-1 VERDICT missing-item 3)."""
    from kbbq_tpu.pipeline.recalibrate import run_pipeline
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    got = run_pipeline(arrays, cfg, devices=8, bloom_layout=layout)
    assert (got == single_chip_quals).all()


def test_run_pipeline_too_many_devices(arrays):
    from kbbq_tpu.pipeline.recalibrate import run_pipeline
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    with pytest.raises(ValueError, match="available"):
        run_pipeline(arrays, cfg, devices=99)


def test_sharded_checkpoint_resume(arrays, single_chip_quals, tmp_path):
    """Checkpoint/resume on the sharded paths (round-1 VERDICT item 7):
    a second run resumes from saved Bloom rows + covariates and the
    output is unchanged."""
    import os
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    mesh = make_mesh(2)
    ck = tmp_path / "ck"
    got = sharded_recalibrate_arrays(arrays, cfg, mesh=mesh,
                                     checkpoint_dir=str(ck))
    assert (got == single_chip_quals).all()
    assert (ck / "rows_a.npy").exists()
    assert (ck / "rows_b.npy").exists()
    got2 = sharded_recalibrate_arrays(arrays, cfg, mesh=mesh,
                                      checkpoint_dir=str(ck))
    assert (got2 == single_chip_quals).all()

    from kbbq_tpu.parallel.sharded_bloom import \
        sharded_bloom_recalibrate_arrays
    ck2 = tmp_path / "ck2"
    got3 = sharded_bloom_recalibrate_arrays(arrays, cfg, mesh=mesh,
                                            checkpoint_dir=str(ck2))
    assert (got3 == single_chip_quals).all()
    got4 = sharded_bloom_recalibrate_arrays(arrays, cfg, mesh=mesh,
                                            checkpoint_dir=str(ck2))
    assert (got4 == single_chip_quals).all()


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_resident_sharded_matches_single_chip(arrays, single_chip_quals,
                                              ndev):
    """The device-resident sharded pipeline (one jit per pass, dense
    sort-built filters, OR all-reduce merge) is bit-identical to the
    single-chip pipeline for any device count."""
    from kbbq_tpu.parallel.resident_sharded import \
        recalibrate_arrays_resident_sharded

    mesh = make_mesh(ndev)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    t = {}
    got = recalibrate_arrays_resident_sharded(arrays, cfg, mesh=mesh,
                                              timings=t)
    assert set(t) >= {"h2d", "pass1", "pass2", "pass3", "pass4"}
    assert got.shape == single_chip_quals.shape
    assert (got == single_chip_quals).all()


def test_resident_sharded_sparse_errbit_overflow_fallback(
        arrays, single_chip_quals, monkeypatch):
    """Forcing the per-shard sparse error-index capacity to overflow
    must re-run pass 3 with the dense bit transport and identical
    output bits (same invariant as the single-chip resident path)."""
    from kbbq_tpu.parallel.resident_sharded import \
        recalibrate_arrays_resident_sharded
    from kbbq_tpu.pipeline import resident as res

    monkeypatch.setattr(res, "SPARSE_ERR_DENOM", 10 ** 9)
    monkeypatch.setattr(res, "_SPARSE_ERR_MIN", 1)
    mesh = make_mesh(2)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    got = recalibrate_arrays_resident_sharded(arrays, cfg, mesh=mesh)
    assert (got == single_chip_quals).all()
