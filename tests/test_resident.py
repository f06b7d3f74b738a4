"""Device-resident pipeline (pipeline/resident.py) parity.

The resident variant runs each pass as ONE jit dispatch (lax.scan over
batch slices) instead of one dispatch per batch; it must be bit-identical
to the batched pipeline on the same arrays/config.
"""

import numpy as np
import pytest

from kbbq_tpu.io.batcher import ReadArrays
from kbbq_tpu.pipeline import RecalConfig, recalibrate_arrays
from kbbq_tpu.pipeline.resident import recalibrate_arrays_resident
from kbbq_tpu.utils.synth import make_dataset


@pytest.fixture(scope="module")
def arrays():
    ds = make_dataset(genome_len=1200, read_len=60, coverage=25.0,
                      error_rate=0.02, seed=31, num_rg=2, paired=True,
                      n_rate=0.01)
    return ReadArrays.from_lists(ds.codes, ds.quals, ds.rgs, ds.seconds)


def test_resident_matches_batched_bitforbit(arrays):
    cfg = RecalConfig(k=16, coverage=25.0, batch_size=64)
    want = recalibrate_arrays(arrays, cfg)
    got = recalibrate_arrays_resident(arrays, cfg)
    assert got.shape == want.shape
    assert (got == want).all()


def test_resident_sample_prefix_overflow_fallback(arrays, monkeypatch):
    """Forcing the pass-1 sampled-prefix bound to overflow must rebuild
    from the uncompacted triples with identical output bits."""
    from kbbq_tpu.pipeline import resident as res
    cfg = RecalConfig(k=16, coverage=25.0, batch_size=64)
    want = recalibrate_arrays(arrays, cfg)
    monkeypatch.setattr(res, "SAMPLE_PREFIX_SLACK", 1e-6)
    monkeypatch.setattr(res, "_SAMPLE_PREFIX_PAD", 1)
    got = recalibrate_arrays_resident(arrays, cfg)
    assert (got == want).all()


def test_resident_sparse_errbit_overflow_fallback(arrays, monkeypatch):
    """Forcing the pass-3 sparse error-index capacity to overflow must
    re-fetch the dense bit mask with identical output bits (the sparse
    d2h encoding is a transport optimization only)."""
    from kbbq_tpu.pipeline import resident as res
    cfg = RecalConfig(k=16, coverage=25.0, batch_size=64)
    want = recalibrate_arrays(arrays, cfg)
    monkeypatch.setattr(res, "SPARSE_ERR_DENOM", 10 ** 9)
    monkeypatch.setattr(res, "_SPARSE_ERR_MIN", 1)
    got = recalibrate_arrays_resident(arrays, cfg)
    assert (got == want).all()


def test_resident_batch_size_invariance(arrays):
    cfg_a = RecalConfig(k=16, coverage=25.0, batch_size=32)
    cfg_b = RecalConfig(k=16, coverage=25.0, batch_size=128)
    qa = recalibrate_arrays_resident(arrays, cfg_a)
    qb = recalibrate_arrays_resident(arrays, cfg_b)
    assert (qa == qb).all()


def test_resident_nondivisible_batch(arrays):
    # num_reads not a multiple of batch_size: padding must not leak
    cfg = RecalConfig(k=16, coverage=25.0, batch_size=97)
    want = recalibrate_arrays(arrays, cfg)
    got = recalibrate_arrays_resident(arrays, cfg)
    assert (got == want).all()


def test_resident_mixed_lengths():
    # ragged reads: the packed h2d feed re-marks per-read tails as 4 on
    # device from the shipped lengths; a leak would corrupt k-mer
    # validity at read ends
    ds = make_dataset(genome_len=900, read_len=48, coverage=20.0,
                      error_rate=0.02, seed=7, n_rate=0.02)
    rng = np.random.default_rng(3)
    codes, quals = [], []
    for c, q in zip(ds.codes, ds.quals):
        ln = int(rng.integers(20, len(c) + 1))
        codes.append(np.asarray(c)[:ln])
        quals.append(np.asarray(q)[:ln])
    arrays = ReadArrays.from_lists(codes, quals, ds.rgs, ds.seconds)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    want = recalibrate_arrays(arrays, cfg)
    got = recalibrate_arrays_resident(arrays, cfg)
    assert (got == want).all()


@pytest.mark.parametrize("nvals", [3, 11, 40])
def test_quals_palette_pack_roundtrip(nvals):
    """The quals h2d palette pack (2-bit <=4 distinct, 4-bit <=16, raw
    otherwise) must reconstruct the padded quals bit for bit."""
    import jax.numpy as jnp

    from kbbq_tpu.pipeline.resident import _pad_to_batches

    rng = np.random.default_rng(7)
    vals = rng.choice(np.arange(2, 80), size=nvals, replace=False)
    N, L = 37, 51
    quals = rng.choice(vals, size=(N, L)).astype(np.int8)
    codes = rng.integers(0, 4, size=(N, L)).astype(np.int8)
    lens = rng.integers(20, L + 1, size=N)
    mask = np.arange(L)[None, :] < lens[:, None]
    quals[~mask] = 0
    arrays = ReadArrays(codes, quals, mask,
                        np.zeros(N, np.int32), np.zeros(N, bool))
    B = 16
    _, join_quals, *_ = _pad_to_batches(arrays, B)
    got = np.asarray(join_quals())
    npad = ((N + B - 1) // B) * B
    want = np.concatenate(
        [quals, np.zeros((npad - N, L), np.int8)])
    assert got.dtype == want.dtype
    assert (got == want).all()
