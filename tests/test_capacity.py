"""Bloom capacity semantics (round-3 VERDICT missing #2 / next-round
item 1): no silent clamps anywhere, WGS-scale sizing is real, layouts
that cannot hold a filter ERROR with a routing hint, and the hash-space-
sharded layout is bit-correct past 2^31 slots (the old int32 slot-math
ceiling)."""

import numpy as np
import pytest

from kbbq_tpu.constants import MAX_BLOOM_LOG2
from kbbq_tpu.io.batcher import ReadArrays
from kbbq_tpu.oracle.bloom import (
    BloomCapacityError,
    BloomParams,
    OracleBloom,
    check_layout_capacity,
)
from kbbq_tpu.pipeline import RecalConfig
from kbbq_tpu.utils.synth import make_dataset


def test_wgs_sizing_no_silent_clamp():
    """Human 30x WGS (~2.5e9 distinct trusted k-mers, 20 slots/key =
    5e10 slots) sizes to 2^36 — the round-3 code silently clamped this
    to 2^31 (a saturated filter, FPR -> 1)."""
    p = BloomParams.for_keys(2_500_000_000, 20)
    assert p.log2_m == 36
    assert p.m == 1 << 36
    # chr20-class (config 4): ~6.4e7 distinct keys -> 2^31
    p20 = BloomParams.for_keys(64_000_000, 20)
    assert p20.log2_m == 31
    # sane FPR at the sized capacity (not saturated)
    assert p.fpr(2_500_000_000) < 0.01


def test_sizing_past_addressing_ceiling_errors():
    with pytest.raises(BloomCapacityError, match="addressing"):
        BloomParams.for_keys(2_500_000_000, 40)
    with pytest.raises(BloomCapacityError):
        BloomParams.for_keys(10 ** 12, 20)
    # the ceiling itself is allowed
    assert BloomParams.for_keys(1, 1, min_log2=MAX_BLOOM_LOG2).log2_m \
        == MAX_BLOOM_LOG2


def test_layout_capacity_check_message():
    p = BloomParams(34)
    with pytest.raises(BloomCapacityError, match="sharded"):
        check_layout_capacity(p, 33, "single-chip streaming",
                              "use --bloom-layout sharded")
    check_layout_capacity(BloomParams(33), 33, "x", "y")  # at cap: fine


def _tiny_arrays(seed=7):
    ds = make_dataset(genome_len=600, read_len=50, coverage=18.0,
                      error_rate=0.02, seed=seed, num_rg=2, paired=True)
    return ds, ReadArrays.from_lists(ds.codes, ds.quals, ds.rgs,
                                     ds.seconds)


def test_batched_pipeline_errors_past_staging_cap():
    from kbbq_tpu.pipeline.recalibrate import RecalPipeline
    cfg = RecalConfig(k=16, coverage=18.0, batch_size=64, min_log2_m=32)
    with pytest.raises(BloomCapacityError, match="staging"):
        RecalPipeline(cfg, 2, 50, 10_000, 7_000)


def test_stream_resident_errors_past_packed_cap():
    from kbbq_tpu.pipeline.stream_resident import StreamResidentEngine

    class _Src:
        max_len = 50
        total_bases = 10_000
        num_rg = 1

        def total_kmers(self, k):
            return 7_000

    cfg = RecalConfig(k=16, coverage=18.0, batch_size=64, min_log2_m=34)
    with pytest.raises(BloomCapacityError, match="sharded"):
        StreamResidentEngine(_Src(), cfg)


def test_replicated_pipeline_errors_past_staging_cap():
    from kbbq_tpu.parallel import make_mesh
    from kbbq_tpu.parallel.sharded import ShardedRecalPipeline
    cfg = RecalConfig(k=16, coverage=18.0, batch_size=64, min_log2_m=32)
    with pytest.raises(BloomCapacityError, match="sharded"):
        ShardedRecalPipeline(cfg, 2, 50, 10_000, 7_000,
                             mesh=make_mesh(4))


def test_oracle_bloom_sparse_beyond_2_31_matches_dense_semantics():
    """The sparse (set-backed) oracle store used past 2^31 slots answers
    exactly like the dense byte array for the same hash math."""
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 2 ** 32, 500, dtype=np.uint32)
    lo = rng.integers(0, 2 ** 32, 500, dtype=np.uint32)
    big = OracleBloom(BloomParams(33))       # sparse store
    assert big.slots is None
    mask = np.arange(500) % 3 == 0
    big.insert(hi, lo, mask=mask)
    got = big.query(hi, lo)
    assert got[mask].all()                   # inserted -> present
    # non-inserted keys: essentially all absent at this sparseness
    assert got[~mask].sum() <= 2


def test_sharded_bloom_beyond_int32_bitmatches_oracle():
    """8-device CPU mesh with BOTH global filters forced to 2^32 slots
    (> the old int32 ceiling): output must bit-match the NumPy oracle
    run at the identical sizing.  This is the round-3 VERDICT item-1
    'done' gate."""
    from kbbq_tpu.oracle.pipeline import (
        OracleConfig,
        ReadBatch,
        recalibrate_reads,
    )
    from kbbq_tpu.parallel import make_mesh
    from kbbq_tpu.parallel.sharded_bloom import (
        ShardedBloomRecalPipeline,
        sharded_bloom_recalibrate_arrays,
    )

    ds, arrays = _tiny_arrays()
    cfg = RecalConfig(k=16, coverage=18.0, batch_size=64, min_log2_m=32)
    mesh = make_mesh(8)

    # sizing really is past 2^31 slots
    lens = arrays.mask.sum(axis=1)
    pipe = ShardedBloomRecalPipeline(
        cfg, int(arrays.rgs.max()) + 1, arrays.max_len,
        int(lens.sum()), int(np.maximum(lens - 15, 0).sum()), mesh)
    assert pipe.params_a.m == 1 << 32
    assert pipe.params_b.m == 1 << 32

    got = sharded_bloom_recalibrate_arrays(arrays, cfg, mesh=mesh)

    ocfg = OracleConfig(k=16, coverage=18.0, min_log2_m=32)
    want, _ = recalibrate_reads(
        ReadBatch(ds.codes, ds.quals, ds.rgs, ds.seconds), ocfg)
    for i, w in enumerate(want):
        L = len(w)
        assert (got[i, :L] == w).all(), f"read {i} mismatch"
