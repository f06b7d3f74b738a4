"""Pallas kernel parity tests (interpret mode on CPU).

Bit-exactness against the XLA ops is the contract; the TPU compile path
is exercised separately on hardware (bench --pallas / KBBQ_PALLAS).
"""

import numpy as np
import pytest

from kbbq_tpu.ops.bloom import bloom_insert, bloom_query_rows, bloom_rows
from kbbq_tpu.ops.kmers import canonical_kmers_batch


@pytest.mark.parametrize("k", [16, 31, 32])
def test_probe_kernel_full_windows(k):
    """Probe kernel over all windows of a batch matches the XLA query."""
    import jax.numpy as jnp
    from kbbq_tpu.ops.pallas_bloom import bloom_query_rows_pallas

    rng = np.random.default_rng(5)
    B, L = 64, 100
    codes = rng.integers(0, 4, (B, L)).astype(np.int8)
    codes[rng.random((B, L)) < 0.02] = 4  # sprinkle Ns

    # build a filter from a random subset of the batch's own k-mers
    hi, lo, valid = canonical_kmers_batch(jnp.asarray(codes), k)
    keep = jnp.asarray(rng.random((B, L - k + 1)) < 0.5) & valid
    slots = jnp.zeros(1 << 18, dtype=jnp.uint8)
    slots = bloom_insert(slots, hi, lo, keep, 7)
    packed = bloom_rows(slots)

    want = np.asarray(bloom_query_rows(packed, hi, lo, 7) & valid)
    got = np.asarray(bloom_query_rows_pallas(packed, hi, lo, 7,
                                             interpret=True)
                     & valid)
    assert got.shape == want.shape
    assert (got == want).all()


@pytest.mark.parametrize("shape", [(64, 85), (64, 4, 8), (3,), (1, 1)])
def test_probe_kernel_matches_xla(shape):
    import jax.numpy as jnp
    from kbbq_tpu.ops.pallas_bloom import bloom_query_rows_pallas

    rng = np.random.default_rng(8)
    hi = jnp.asarray(rng.integers(0, 2**32, shape, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, shape, dtype=np.uint32))
    slots = jnp.asarray((rng.random(1 << 16) < 0.3).astype(np.uint8))
    packed = bloom_rows(slots)
    want = np.asarray(bloom_query_rows(packed, hi, lo, 7))
    got = np.asarray(bloom_query_rows_pallas(packed, hi, lo, 7,
                                             interpret=True))
    assert got.shape == want.shape
    assert (got == want).all()


def test_walk_with_pallas_query_matches(tmp_path):
    """infer_errors_core with the pallas probe as query_fn is
    bit-identical to the XLA query path."""
    import jax.numpy as jnp
    from kbbq_tpu.ops.inference import infer_errors_batch, \
        infer_errors_core
    from kbbq_tpu.ops.pallas_bloom import bloom_query_rows_pallas
    from kbbq_tpu.utils.synth import make_dataset
    from kbbq_tpu.io.batcher import ReadArrays

    ds = make_dataset(genome_len=600, read_len=50, coverage=20.0,
                      error_rate=0.03, seed=11)
    arrays = ReadArrays.from_lists(ds.codes, ds.quals, ds.rgs, ds.seconds)
    k, h = 16, 7
    codes = jnp.asarray(arrays.codes[:128])
    hi, lo, valid = canonical_kmers_batch(codes, k)
    slots = jnp.zeros(1 << 18, dtype=jnp.uint8)
    slots = bloom_insert(slots, hi, lo, valid, h)
    packed = bloom_rows(slots)

    want = np.asarray(infer_errors_batch(packed, codes, k, h))
    qf = lambda a, b: bloom_query_rows_pallas(packed, a, b, h,
                                              interpret=True)
    got = np.asarray(infer_errors_core(qf, codes, k))
    assert (got == want).all()


def test_pipeline_with_pallas_flag_bit_identical():
    """Full 4-pass pipeline with use_pallas=True (interpreted on CPU)
    matches the XLA path byte for byte."""
    from kbbq_tpu.io.batcher import ReadArrays
    from kbbq_tpu.pipeline import RecalConfig
    from kbbq_tpu.pipeline.recalibrate import recalibrate_arrays
    from kbbq_tpu.utils.synth import make_dataset

    ds = make_dataset(genome_len=700, read_len=50, coverage=20.0,
                      error_rate=0.02, seed=13, n_rate=0.01)
    arrays = ReadArrays.from_lists(ds.codes, ds.quals, ds.rgs, ds.seconds)
    want = recalibrate_arrays(
        arrays, RecalConfig(k=16, coverage=20.0, batch_size=64,
                            use_pallas=False))
    got = recalibrate_arrays(
        arrays, RecalConfig(k=16, coverage=20.0, batch_size=64,
                            use_pallas=True))
    assert (got == want).all()


@pytest.mark.parametrize("k", [16, 32])
def test_walk_round_kernel_bit_identical(k):
    """The Pallas walk round kernel (ops/pallas_walk.py, interpret mode)
    matches the XLA stacked-plane walk bit for bit, including N bases,
    commits, and multi-error reads."""
    import jax.numpy as jnp

    from kbbq_tpu.io.batcher import ReadArrays
    from kbbq_tpu.ops.inference import infer_errors_batch
    from kbbq_tpu.oracle.kmers import alpha_threshold
    from kbbq_tpu.utils.synth import make_dataset

    from test_ops import _build_filters

    alpha = 7.0 / 30.0
    ds = make_dataset(genome_len=1500, read_len=60, coverage=30.0,
                      error_rate=0.03, seed=23, n_rate=0.01)
    _, bloom_b = _build_filters(ds, k, alpha)
    arrays = ReadArrays.from_lists(ds.codes, ds.quals, ds.rgs, ds.seconds)
    rows = bloom_rows(jnp.asarray(bloom_b.slots))
    codes = jnp.asarray(arrays.codes[:64])
    plain = np.asarray(infer_errors_batch(rows, codes, k, 7))
    pw = np.asarray(infer_errors_batch(rows, codes, k, 7,
                                       use_pallas=True))
    assert (plain == pw).all()


def test_probe_kernel_odd_sizes():
    """Probe counts not a multiple of the grid tile still match."""
    import jax.numpy as jnp
    from kbbq_tpu.ops.pallas_bloom import bloom_query_rows_pallas

    rng = np.random.default_rng(6)
    k = 16
    B, L = 300, 60  # 300*45 probes: pads to tile multiple
    codes = rng.integers(0, 4, (B, L)).astype(np.int8)
    hi, lo, valid = canonical_kmers_batch(jnp.asarray(codes), k)
    slots = jnp.zeros(1 << 16, dtype=jnp.uint8)
    slots = bloom_insert(slots, hi, lo, valid, 7)
    packed = bloom_rows(slots)
    want = np.asarray(bloom_query_rows(packed, hi, lo, 7) & valid)
    got = np.asarray(bloom_query_rows_pallas(packed, hi, lo, 7,
                                             interpret=True) & valid)
    assert (got == want).all()
