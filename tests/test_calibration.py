"""Scientific validation: recalibration must IMPROVE calibration.

Ground truth comes from the synthetic generator's planted-error mask.
Calibration error = |reported Q - actual Q| averaged over quality bins,
weighted by bin size; the recalibrated qualities must beat the raw ones
on data whose reported qualities are systematically miscalibrated.
"""

import numpy as np

from kbbq_tpu.io.batcher import ReadArrays
from kbbq_tpu.pipeline import RecalConfig, recalibrate_arrays
from kbbq_tpu.utils.synth import make_dataset


def _calibration_error(quals, true_errors):
    q = np.concatenate([np.asarray(x) for x in quals])
    e = np.concatenate([np.asarray(x) for x in true_errors])
    err_sum = np.bincount(q, weights=e.astype(float), minlength=94)
    tot = np.bincount(q, minlength=94)
    score, weight = 0.0, 0
    for qq in range(94):
        if tot[qq] < 50:
            continue
        actual = -10 * np.log10((err_sum[qq] + 1) / (tot[qq] + 2))
        score += abs(qq - actual) * tot[qq]
        weight += tot[qq]
    return score / max(weight, 1)


def test_recalibration_improves_calibration():
    ds = make_dataset(genome_len=5000, read_len=100, coverage=30.0,
                      error_rate=0.02, seed=71)
    arrays = ReadArrays.from_lists(ds.codes, ds.quals,
                                   [0] * len(ds.codes),
                                   [False] * len(ds.codes))
    new_quals = recalibrate_arrays(
        arrays, RecalConfig(k=16, coverage=30.0, batch_size=256))

    before = _calibration_error(ds.quals, ds.true_errors)
    after = _calibration_error(
        [new_quals[i][:len(ds.codes[i])] for i in range(len(ds.codes))],
        ds.true_errors)
    # the synthetic data's reported qualities are systematically off;
    # recalibration must cut the weighted calibration error by >= 2x
    assert after < before / 2, (before, after)
