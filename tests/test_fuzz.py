"""Seeded property-style fuzz: device pipeline vs oracle across configs.

Sweeps k (boundary values for the dual-lane packer), alpha, N-rates and
read-length mixes — every configuration must be byte-identical to the
oracle (SURVEY.md §5.2 strategy: property-style random reads + edge
cases).
"""

import numpy as np
import pytest

from kbbq_tpu.io.batcher import ReadArrays
from kbbq_tpu.oracle import OracleConfig, recalibrate_reads
from kbbq_tpu.oracle.pipeline import ReadBatch
from kbbq_tpu.pipeline import RecalConfig, recalibrate_arrays


def _random_reads(rng, n_reads, lmin, lmax, n_rate):
    genome = rng.integers(0, 4, 3000).astype(np.int8)
    codes, quals = [], []
    for _ in range(n_reads):
        L = int(rng.integers(lmin, lmax + 1))
        s = int(rng.integers(0, 3000 - L))
        read = genome[s:s + L].copy()
        err = rng.random(L) < 0.02
        read[err] = (read[err] + rng.integers(1, 4, int(err.sum()))) % 4
        if n_rate:
            read[rng.random(L) < n_rate] = 4
        codes.append(read)
        quals.append(rng.integers(2, 42, L).astype(np.int64))
    return codes, quals


CASES = [
    # (seed, k, alpha, n_rate, lmin, lmax)
    (1, 16, 0.3, 0.0, 60, 60),
    (2, 17, 0.25, 0.02, 40, 70),   # k=17: hi-lane boundary
    (3, 31, 0.4, 0.01, 45, 80),
    (4, 32, 0.2, 0.03, 50, 64),    # k=32: full 64-bit pack
    (5, 20, 1.0, 0.05, 36, 90),    # alpha=1, heavy Ns, mixed lengths
]


@pytest.mark.parametrize("seed,k,alpha,n_rate,lmin,lmax", CASES)
def test_fuzz_device_matches_oracle(seed, k, alpha, n_rate, lmin, lmax):
    rng = np.random.default_rng(seed)
    codes, quals = _random_reads(rng, 150, lmin, lmax, n_rate)
    rgs = (rng.integers(0, 2, 150)).astype(np.int32).tolist()
    secs = (rng.integers(0, 2, 150) == 1).tolist()

    batch = ReadBatch(codes, quals, rgs, secs)
    want, _ = recalibrate_reads(
        batch, OracleConfig(k=k, alpha=alpha, coverage=20.0))

    arrays = ReadArrays.from_lists(codes, quals, rgs, secs)
    got = recalibrate_arrays(
        arrays, RecalConfig(k=k, alpha=alpha, coverage=20.0,
                            batch_size=64))
    for i, w in enumerate(want):
        assert (got[i][:w.size].astype(np.int64) == w).all(), \
            f"case seed={seed} k={k}: read {i} differs"


@pytest.mark.parametrize("seed,k,alpha,n_rate,lmin,lmax",
                         [CASES[1], CASES[4]])
def test_fuzz_resident_paths_match_batched(seed, k, alpha, n_rate,
                                           lmin, lmax):
    """The device-resident single-chip and sharded fast paths must be
    byte-identical to the batched pipeline on fuzz configs (mixed
    lengths, N bases, k lane boundaries)."""
    from kbbq_tpu.parallel import make_mesh
    from kbbq_tpu.parallel.resident_sharded import \
        recalibrate_arrays_resident_sharded
    from kbbq_tpu.pipeline.resident import recalibrate_arrays_resident

    rng = np.random.default_rng(seed)
    codes, quals = _random_reads(rng, 150, lmin, lmax, n_rate)
    rgs = (rng.integers(0, 2, 150)).astype(np.int32).tolist()
    secs = (rng.integers(0, 2, 150) == 1).tolist()
    arrays = ReadArrays.from_lists(codes, quals, rgs, secs)
    cfg = RecalConfig(k=k, alpha=alpha, coverage=20.0, batch_size=64)
    want = recalibrate_arrays(arrays, cfg)
    got_res = recalibrate_arrays_resident(arrays, cfg)
    assert (got_res == want).all()
    got_sh = recalibrate_arrays_resident_sharded(
        arrays, cfg, mesh=make_mesh(8))
    assert (got_sh == want).all()
