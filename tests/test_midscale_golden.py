"""Mid-scale oracle golden (round-4 VERDICT next #2): the NumPy oracle
was never run above ~150 reads, so scale parity was engine-vs-engine
only.  tests/data/midscale_golden.npz is the ORACLE's output for a
20 000-read production-config dataset (k=32, alpha=7/coverage, default
ext-cap, 3 read groups round-robin, paired/interleaved seconds, Ns
present) — regenerate with:

    python - <<'PY'
    import numpy as np
    from kbbq_tpu.utils.synth import make_dataset
    from kbbq_tpu.oracle import OracleConfig, recalibrate_reads
    from kbbq_tpu.oracle.pipeline import ReadBatch
    ds = make_dataset(genome_len=100_000, read_len=150, coverage=30.0,
                      error_rate=0.01, seed=421, num_rg=3, paired=True,
                      n_rate=0.002)
    nq, _ = recalibrate_reads(
        ReadBatch(ds.codes, ds.quals, ds.rgs, ds.seconds),
        OracleConfig(k=32, coverage=30.0))
    np.savez_compressed("tests/data/midscale_golden.npz",
                        quals=np.stack([np.asarray(q).astype(np.int8)
                                        for q in nq]),
                        meta=np.array([421, 100_000, 150, 30, 32, 3],
                                      np.int64))
    PY

The production engines (resident, streamed BAM, hash-space-sharded
8-device) must byte-match it — breaking the engine-vs-engine parity
circle at a scale where the dense builds, hash cache, and sharded
routing all run their production code paths.
"""

import os

import numpy as np
import pytest

from kbbq_tpu.io.batcher import ReadArrays
from kbbq_tpu.pipeline import RecalConfig
from kbbq_tpu.pipeline.recalibrate import run_pipeline
from kbbq_tpu.utils.synth import make_dataset

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "midscale_golden.npz")


@pytest.fixture(scope="module")
def midscale():
    z = np.load(GOLDEN)
    seed, gl, rl, cov, k, nrg = (int(v) for v in z["meta"])
    ds = make_dataset(genome_len=gl, read_len=rl, coverage=float(cov),
                      error_rate=0.01, seed=seed, num_rg=nrg,
                      paired=True, n_rate=0.002)
    codes = np.stack([np.asarray(c) for c in ds.codes])
    quals = np.stack([np.asarray(q).astype(np.int8) for q in ds.quals])
    mask = np.ones(codes.shape, bool)
    arrays = ReadArrays(codes, quals, mask,
                        np.asarray(ds.rgs, np.int32),
                        np.asarray(ds.seconds, bool))
    cfg = RecalConfig(k=k, coverage=float(cov), batch_size=2048)
    return arrays, cfg, z["quals"], ds


def test_midscale_resident_matches_oracle(midscale):
    arrays, cfg, want, _ = midscale
    got = run_pipeline(arrays, cfg)
    assert np.array_equal(np.asarray(got, np.int8), want)


def test_midscale_sharded_bloom_matches_oracle(midscale):
    """Hash-space-sharded Bloom over the 8-device CPU mesh — the
    WGS-relevant layout — against the oracle at 20k reads."""
    arrays, cfg, want, _ = midscale
    got = run_pipeline(arrays, cfg, devices=8, bloom_layout="sharded")
    assert np.array_equal(np.asarray(got, np.int8), want)


def test_midscale_streamed_bam_matches_oracle(midscale, tmp_path):
    """Streamed resident-window BAM engine (chunked decode, dense
    builds, window cache) against the oracle — RG tags round-robin per
    record reproduce the dataset's read-group order exactly."""
    from kbbq_tpu.io.bam import BamFile, build_record, read_bam, \
        serialize_bam
    from kbbq_tpu.pipeline.bam import recalibrate_bam_streaming

    arrays, cfg, want, ds = midscale
    recs = []
    for i in range(arrays.num_reads):
        flag = 0x4 | ((0x1 | 0x80) if ds.seconds[i] else 0x1)
        recs.append(build_record(
            f"r{i}", arrays.codes[i], arrays.quals[i].astype(np.uint8),
            flag=flag, rg=f"g{ds.rgs[i]}"))
    src = tmp_path / "in.bam"
    src.write_bytes(serialize_bam(
        BamFile("@HD\tVN:1.6\n@RG\tID:g0\n@RG\tID:g1\n@RG\tID:g2\n",
                [], recs), compress=True))
    out = tmp_path / "out.bam"
    recalibrate_bam_streaming(str(src), str(out), cfg,
                              chunk_records=4096)
    bf = read_bam(str(out))
    got = np.stack([r.quals().astype(np.int8) for r in bf.records])
    assert np.array_equal(got, want)
