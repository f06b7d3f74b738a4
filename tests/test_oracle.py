"""Unit tests for the NumPy oracle (the executable spec).

These pin the semantics in kbbq_tpu/oracle/DECISIONS.md; the JAX kernels are
then tested bit-for-bit against the oracle in test_ops.py.
"""

import numpy as np
import pytest

from kbbq_tpu.constants import BASE_N, DINUC_INVALID, NUM_Q
from kbbq_tpu.oracle import (
    BloomParams,
    CovariateTables,
    OracleBloom,
    OracleConfig,
    accumulate_read,
    canonical_kmers,
    decode_seq,
    empirical_quality,
    encode_seq,
    fmix32,
    infer_read_errors,
    recalibrate_reads,
    trusted_kmer_mask,
)
from kbbq_tpu.oracle.covariate import cycle_indices, dinuc_indices
from kbbq_tpu.oracle.gatk import build_recal_table, compute_deltas
from kbbq_tpu.oracle.kmers import alpha_threshold, sample_hash
from kbbq_tpu.oracle.pipeline import ReadBatch
from kbbq_tpu.utils.synth import make_dataset

# ---------------------------------------------------------------------- kmers


def test_encode_decode_roundtrip():
    s = b"ACGTNacgtX"
    codes = encode_seq(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert decode_seq(codes) == b"ACGTNACGTN"


def test_fmix32_known_values():
    # murmur3 fmix32 published test vectors
    assert int(fmix32(0)) == 0
    assert int(fmix32(1)) == 0x514E28B7 ^ 0  # fmix32(1) = 1364076727
    assert int(fmix32(1)) == 1364076727
    assert int(fmix32(0xFFFFFFFF)) == 0x81F16F39


def _brute_canonical(seq: str, k: int):
    """String-based canonical k-mers for cross-checking the rolling packer."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    enc = {"A": 0, "C": 1, "G": 2, "T": 3}
    out = []
    for j in range(len(seq) - k + 1):
        w = seq[j:j + k]
        if any(c not in enc for c in w):
            out.append(None)
            continue
        rc = "".join(comp[c] for c in reversed(w))
        best = min(w, rc, key=lambda x: [enc[c] for c in x])
        v = 0
        for c in best:
            v = (v << 2) | enc[c]
        out.append(v)
    return out


@pytest.mark.parametrize("k", [4, 16, 17, 31, 32])
def test_canonical_kmers_vs_bruteforce(k):
    rng = np.random.default_rng(42)
    for _ in range(5):
        L = int(rng.integers(k, k + 40))
        seq = "".join(rng.choice(list("ACGT"), size=L))
        codes = encode_seq(seq)
        hi, lo, valid = canonical_kmers(codes, k)
        ref = _brute_canonical(seq, k)
        assert valid.all()
        got = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
        assert [int(g) for g in got] == ref


def test_canonical_kmers_with_n():
    seq = "ACGTNACGTACGT"
    k = 4
    codes = encode_seq(seq)
    hi, lo, valid = canonical_kmers(codes, k)
    ref = _brute_canonical(seq, k)
    assert list(valid) == [r is not None for r in ref]
    got = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    for g, r in zip(got, ref):
        if r is not None:
            assert int(g) == r


def test_canonical_is_strand_symmetric():
    seq = "ACGTTGCACCGTTA"
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(seq))
    k = 8
    h1, l1, _ = canonical_kmers(encode_seq(seq), k)
    h2, l2, _ = canonical_kmers(encode_seq(rc), k)
    a = set(zip(h1.tolist(), l1.tolist()))
    b = set(zip(h2.tolist(), l2.tolist()))
    assert a == b


def test_short_read_yields_no_kmers():
    hi, lo, valid = canonical_kmers(encode_seq("ACG"), 4)
    assert hi.size == lo.size == valid.size == 0


def test_alpha_threshold_edges():
    assert int(alpha_threshold(1.0)) == 0xFFFFFFFF
    assert int(alpha_threshold(2.0)) == 0xFFFFFFFF
    assert int(alpha_threshold(0.5)) == 2**31 - 1
    t = alpha_threshold(1e-12)
    assert int(t) == 0


# ---------------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_low_fpr():
    rng = np.random.default_rng(0)
    params = BloomParams.for_keys(10_000, 20)
    bloom = OracleBloom(params)
    hi = rng.integers(0, 2**32, size=10_000, dtype=np.uint32)
    lo = rng.integers(0, 2**32, size=10_000, dtype=np.uint32)
    bloom.insert(hi, lo)
    assert bloom.query(hi, lo).all()
    qhi = rng.integers(0, 2**32, size=20_000, dtype=np.uint32)
    qlo = rng.integers(0, 2**32, size=20_000, dtype=np.uint32)
    fp = bloom.query(qhi, qlo).mean()
    assert fp < 0.01


def test_bloom_insert_mask():
    params = BloomParams.for_keys(100, 20)
    bloom = OracleBloom(params)
    hi = np.arange(10, dtype=np.uint32)
    lo = np.arange(10, dtype=np.uint32) + 100
    mask = np.zeros(10, dtype=bool)
    mask[::2] = True
    bloom.insert(hi, lo, mask=mask)
    got = bloom.query(hi, lo)
    assert got[::2].all()
    # odd entries may be FPs but at 20 slots/key on 100-key sizing ~ none
    assert not got[1::2].any()


# -------------------------------------------------------------------- lighter


def test_coverage_thresholds_monotone_and_sane():
    from kbbq_tpu.oracle.lighter import coverage_thresholds
    t = coverage_thresholds(0.23, 16)
    assert t.shape == (17,)
    assert t[0] >= 1
    assert (np.diff(t) >= 0).all()          # more overlaps -> higher bar
    assert t[16] <= 16                       # interior positions coverable
    # error position: P[Binom(16, .23) >= t(16)] must be <= 1%
    from scipy.stats import binom
    assert binom.sf(int(t[16]) - 1, 16, 0.23) <= 0.01


def test_sample_hash_keep_rate_matches_alpha():
    rids = np.repeat(np.arange(200, dtype=np.uint32), 50)
    offs = np.tile(np.arange(50, dtype=np.uint32), 200)
    s = sample_hash(rids, offs)
    for alpha in (0.1, 0.25, 0.5):
        rate = (s <= alpha_threshold(alpha)).mean()
        assert abs(rate - alpha) < 0.02


def test_trusted_kmer_mask_error_free_high_coverage():
    """Error-free reads at alpha*C ~ 7: interior kmers trusted."""
    ds = make_dataset(genome_len=2000, read_len=60, coverage=40.0,
                      error_rate=0.0, seed=1)
    k = 16
    alpha = 7.0 / 40.0
    thresh = alpha_threshold(alpha)
    bloom_a = OracleBloom(BloomParams.for_keys(20_000, 20))
    for rid, codes in enumerate(ds.codes):
        hi, lo, valid = canonical_kmers(codes, k)
        offs = np.arange(hi.size, dtype=np.uint32)
        keep = valid & (sample_hash(np.uint32(rid), offs) <= thresh)
        bloom_a.insert(hi, lo, mask=keep)
    frac = []
    for codes in ds.codes[:20]:
        tr = trusted_kmer_mask(codes, k, bloom_a, alpha)
        frac.append(tr.mean())
    assert np.mean(frac) > 0.8  # most kmers trusted in error-free data


def test_infer_errors_planted_single_error():
    """One planted error mid-read, trusted filter = all true genome kmers."""
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, size=5000).astype(np.int8)
    k = 16
    params = BloomParams.for_keys(20_000, 20)
    bloom_b = OracleBloom(params)
    hi, lo, valid = canonical_kmers(genome, k)
    bloom_b.insert(hi, lo, mask=valid)

    hits = 0
    for start in range(0, 400, 40):
        read = genome[start:start + 80].copy()
        pos = 40
        read[pos] = (read[pos] + 1) % 4
        err = infer_read_errors(read, k, bloom_b)
        if err[pos] and err.sum() == 1:
            hits += 1
    assert hits >= 8  # rare repeat-induced misses tolerated


def test_infer_errors_clean_read():
    rng = np.random.default_rng(4)
    genome = rng.integers(0, 4, size=3000).astype(np.int8)
    k = 16
    bloom_b = OracleBloom(BloomParams.for_keys(10_000, 20))
    hi, lo, valid = canonical_kmers(genome, k)
    bloom_b.insert(hi, lo, mask=valid)
    read = genome[100:180]
    assert not infer_read_errors(read, k, bloom_b).any()


def test_infer_errors_no_anchor_marks_nothing():
    rng = np.random.default_rng(5)
    read = rng.integers(0, 4, size=50).astype(np.int8)
    bloom_b = OracleBloom(BloomParams.for_keys(1000, 20))  # empty filter
    assert not infer_read_errors(read, 16, bloom_b).any()


def test_infer_errors_error_at_read_edge():
    rng = np.random.default_rng(6)
    genome = rng.integers(0, 4, size=4000).astype(np.int8)
    k = 16
    bloom_b = OracleBloom(BloomParams.for_keys(20_000, 20))
    hi, lo, valid = canonical_kmers(genome, k)
    bloom_b.insert(hi, lo, mask=valid)
    read = genome[200:280].copy()
    read[0] = (read[0] + 2) % 4        # left edge error
    read[-1] = (read[-1] + 1) % 4      # right edge error
    err = infer_read_errors(read, k, bloom_b)
    assert err[0] and err[-1]
    assert err.sum() == 2


# ----------------------------------------------------------------- covariates


def test_cycle_indices_layout():
    idx1 = cycle_indices(3, second=False)
    idx2 = cycle_indices(3, second=True)
    assert list(idx1) == [0, 2, 4]
    assert list(idx2) == [1, 3, 5]


def test_dinuc_indices():
    codes = encode_seq("ACGNTA")
    din = dinuc_indices(codes)
    assert din[0] == DINUC_INVALID
    assert din[1] == 0 * 4 + 1
    assert din[2] == 1 * 4 + 2
    assert din[3] == DINUC_INVALID  # cur is N
    assert din[4] == DINUC_INVALID  # prev is N
    assert din[5] == 3 * 4 + 0


def test_accumulate_read_counts_and_marginals():
    tables = CovariateTables(num_rg=2, max_len=10)
    codes = encode_seq("ACGTACGTA")
    quals = np.array([2, 20, 20, 20, 20, 30, 30, 30, 30])  # q=2 skipped
    errors = np.zeros(9, dtype=bool)
    errors[1] = True
    accumulate_read(tables, codes, quals, errors, rg=1, second=False)
    assert tables.rg_total()[1] == 8          # one base skipped
    assert tables.rg_total()[0] == 0
    assert tables.rg_errors()[1] == 1
    assert tables.q_total()[1, 20] == 4
    assert tables.q_total()[1, 30] == 4
    assert tables.q_errors()[1, 20] == 1
    # dinuc table: position 0 invalid, rest valid and non-skipped except pos0
    assert tables.din_total[1].sum() == 8  # pos1..8 all have valid prev
    # merge = elementwise add
    merged = tables.merge(tables)
    assert merged.rg_total()[1] == 16


# ----------------------------------------------------------------- gatk math


def test_empirical_quality_large_n_tracks_observed_rate():
    # 1e6 observations at 1e-3 error rate -> empQ ~ 30 despite prior at 25
    q = empirical_quality(np.array([1000.0]), np.array([1e6]),
                          np.array([25.0]))
    assert abs(q[0] - 30) <= 1


def test_empirical_quality_empty_cell_returns_prior():
    q = empirical_quality(np.array([0.0]), np.array([0.0]), np.array([37.3]))
    assert q[0] == 37.0
    q = empirical_quality(np.array([0.0]), np.array([0.0]), np.array([36.5]))
    assert q[0] == 36.0  # round-half-even


def test_empirical_quality_small_n_shrinks_to_prior():
    # 1 error in 10 obs (raw ~10) with prior 30 -> pulled strongly toward 30
    q = empirical_quality(np.array([1.0]), np.array([10.0]), np.array([30.0]))
    assert q[0] >= 15


def test_compute_deltas_zero_when_calibrated():
    """If observed error rates exactly match reported Q, deltas ~ 0."""
    tables = CovariateTables(num_rg=1, max_len=50)
    n = 1_000_000
    for q in (10, 20, 30):
        e = int(n * 10 ** (-q / 10))
        tables.cyc_total[0, q, 0] = n
        tables.cyc_errors[0, q, 0] = e
        tables.din_total[0, q, 3] = n
        tables.din_errors[0, q, 3] = e
    d = compute_deltas(tables)
    assert abs(d["delta_rg"][0]) <= 1.0
    for q in (10, 20, 30):
        total = (d["delta_rg"][0] + d["delta_q"][0, q]
                 + d["delta_cyc"][0, q, 0] + d["delta_din"][0, q, 3])
        assert abs(total) <= 1.0


def test_build_recal_table_shape_and_range():
    tables = CovariateTables(num_rg=1, max_len=10)
    tables.cyc_total[0, 20, 0] = 1000
    tables.cyc_errors[0, 20, 0] = 10
    recal = build_recal_table(tables)
    assert recal.shape == (1, NUM_Q, 20, 17)
    assert recal.min() >= 1 and recal.max() <= 93


# --------------------------------------------------------------- end-to-end


def test_pipeline_end_to_end_smoke():
    ds = make_dataset(genome_len=3000, read_len=60, coverage=30.0,
                      error_rate=0.02, seed=7)
    batch = ReadBatch(ds.codes, ds.quals, ds.rgs, ds.seconds)
    cfg = OracleConfig(k=16, coverage=30.0)
    new_quals, dbg = recalibrate_reads(batch, cfg)
    assert len(new_quals) == len(ds.codes)
    for q in new_quals:
        assert q.min() >= 1 and q.max() <= 93
    # at least half the planted errors detected (repeats/edges tolerated)
    det, tot = 0, 0
    for err, true_err in zip(dbg["errors"], ds.true_errors):
        det += int((err & true_err).sum())
        tot += int(true_err.sum())
    assert tot > 0
    assert det / tot > 0.5


def test_pipeline_deterministic():
    ds = make_dataset(genome_len=2000, read_len=50, coverage=8.0,
                      error_rate=0.01, seed=9)
    batch = ReadBatch(ds.codes, ds.quals, ds.rgs, ds.seconds)
    cfg = OracleConfig(k=16, alpha=0.9)
    q1, _ = recalibrate_reads(batch, cfg)
    q2, _ = recalibrate_reads(batch, cfg)
    for a, b in zip(q1, q2):
        assert (a == b).all()
