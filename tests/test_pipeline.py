"""End-to-end parity: device pipeline vs oracle, byte-for-byte.

This is the integration test of SURVEY.md §5.3: FASTQ->FASTQ equality
between the NumPy oracle and the JAX pipeline, plus invariance tests
(determinism, batch-size independence).
"""

import numpy as np
import pytest

from kbbq_tpu.io.batcher import ReadArrays
from kbbq_tpu.io.fastq import (
    extract_padded_arrays,
    parse_fastq_bytes,
    write_fastq_with_quals,
)
from kbbq_tpu.oracle import OracleConfig, recalibrate_reads
from kbbq_tpu.oracle.pipeline import ReadBatch
from kbbq_tpu.pipeline import RecalConfig, recalibrate_arrays, recalibrate_fastq
from kbbq_tpu.utils.synth import make_dataset, to_fastq_bytes


@pytest.fixture(scope="module")
def ds():
    return make_dataset(genome_len=1200, read_len=60, coverage=25.0,
                        error_rate=0.02, seed=21, num_rg=2, paired=True,
                        n_rate=0.01)


@pytest.fixture(scope="module")
def oracle_quals(ds):
    batch = ReadBatch(ds.codes, ds.quals, ds.rgs, ds.seconds)
    cfg = OracleConfig(k=16, coverage=25.0)
    quals, _ = recalibrate_reads(batch, cfg)
    return quals


def _device_quals(ds, batch_size):
    arrays = ReadArrays.from_lists(ds.codes, ds.quals, ds.rgs, ds.seconds)
    cfg = RecalConfig(k=16, coverage=25.0, batch_size=batch_size)
    return recalibrate_arrays(arrays, cfg), arrays


def test_device_matches_oracle_bitforbit(ds, oracle_quals):
    got, arrays = _device_quals(ds, batch_size=64)
    assert got.shape[0] == len(oracle_quals)
    for i, want in enumerate(oracle_quals):
        L = want.size
        assert (got[i][:L].astype(np.int64) == want).all(), f"read {i}"


def test_device_batch_size_invariance(ds):
    q1, _ = _device_quals(ds, batch_size=32)
    q2, _ = _device_quals(ds, batch_size=173)
    assert (q1 == q2).all()


def test_device_deterministic(ds):
    q1, _ = _device_quals(ds, batch_size=64)
    q2, _ = _device_quals(ds, batch_size=64)
    assert (q1 == q2).all()


def test_fastq_roundtrip_only_quals_change(tmp_path, ds, oracle_quals):
    fq_bytes = to_fastq_bytes(ds)
    in_path = tmp_path / "in.fq"
    out_path = tmp_path / "out.fq"
    in_path.write_bytes(fq_bytes)

    # note: synth names carry no /2 suffix, so the FASTQ path treats all
    # reads as first-in-pair and as one read group — rerun oracle to match
    batch = ReadBatch(ds.codes, ds.quals, [0] * len(ds.codes),
                      [False] * len(ds.codes))
    want_quals, _ = recalibrate_reads(batch, OracleConfig(k=16, coverage=25.0))

    stats = recalibrate_fastq(str(in_path), str(out_path),
                              RecalConfig(k=16, coverage=25.0, batch_size=64))
    assert stats["num_reads"] == len(ds.codes)

    out_fq = parse_fastq_bytes(out_path.read_bytes())
    in_fq = parse_fastq_bytes(fq_bytes)
    assert out_fq.num_reads == in_fq.num_reads
    for i in range(out_fq.num_reads):
        assert out_fq.name_bytes(i) == in_fq.name_bytes(i)
        assert out_fq.seq_bytes(i) == in_fq.seq_bytes(i)
        got_q = np.frombuffer(out_fq.qual_bytes(i), np.uint8).astype(int) - 33
        assert (got_q == want_quals[i]).all(), f"read {i}"


def test_fastq_parse_errors():
    # exact message differs between the native scanner and numpy fallback
    with pytest.raises(ValueError):
        parse_fastq_bytes(b"@r1\nACGT\n+\n")
    with pytest.raises(ValueError):
        parse_fastq_bytes(b"r1\nACGT\n+\nFFFF\n")
    with pytest.raises(ValueError):
        parse_fastq_bytes(b"@r1\nACGT\n+\nFFF\n")


def test_write_fastq_preserves_non_qual_bytes(tmp_path):
    data = b"@r1 comment here\nACGTN\n+\nFF:FF\n@r2/2\nGGGG\n+\n!!!!\n"
    fq = parse_fastq_bytes(data)
    codes, quals, mask, lens = extract_padded_arrays(fq)
    assert fq.seconds_mask().tolist() == [False, True]
    new_q = np.where(mask, 40, 0)
    out = tmp_path / "o.fq"
    write_fastq_with_quals(fq, new_q, mask, str(out))
    got = out.read_bytes()
    assert got == b"@r1 comment here\nACGTN\n+\nIIIII\n@r2/2\nGGGG\n+\nIIII\n"


def test_checkpoint_resume(tmp_path, ds, oracle_quals):
    """Interrupt after pass 2; resume must produce identical output."""
    arrays = ReadArrays.from_lists(ds.codes, ds.quals, ds.rgs, ds.seconds)
    cfg = RecalConfig(k=16, coverage=25.0, batch_size=64)
    from kbbq_tpu.pipeline.recalibrate import recalibrate_arrays as ra
    ck = str(tmp_path / "ckpt")
    full = ra(arrays, cfg, checkpoint_dir=ck)

    # checkpoint dir now holds all passes; a "resumed" run must reuse them
    # and still match; also must match the no-checkpoint run bit-for-bit
    resumed = ra(arrays, cfg, checkpoint_dir=ck)
    assert (resumed == full).all()
    plain = ra(arrays, cfg)
    assert (plain == full).all()

    # partial checkpoint: drop covariates, keep blooms -> resume recomputes
    import json, os
    meta_p = os.path.join(ck, "meta.json")
    meta = json.load(open(meta_p))
    meta["passes_done"] = ["bloom_a", "bloom_b"]
    json.dump(meta, open(meta_p, "w"))
    resumed2 = ra(arrays, cfg, checkpoint_dir=ck)
    assert (resumed2 == full).all()


def test_checkpoint_refuses_mismatched_config(tmp_path, ds):
    """Resuming with a changed -k or different input must fail loudly
    instead of loading stale Bloom filters (ADVICE.md round-1 medium)."""
    import pytest
    arrays = ReadArrays.from_lists(ds.codes, ds.quals, ds.rgs, ds.seconds)
    cfg = RecalConfig(k=16, coverage=25.0, batch_size=64)
    from kbbq_tpu.pipeline.recalibrate import recalibrate_arrays as ra
    ck = str(tmp_path / "ckpt")
    ra(arrays, cfg, checkpoint_dir=ck)

    with pytest.raises(ValueError, match="different parameters"):
        ra(arrays, RecalConfig(k=20, coverage=25.0, batch_size=64),
           checkpoint_dir=ck)
    with pytest.raises(ValueError, match="different parameters"):
        ra(arrays, RecalConfig(k=16, coverage=25.0, alpha=0.9,
                               batch_size=64), checkpoint_dir=ck)
    # different input data -> content hash mismatch
    arrays2 = ReadArrays.from_lists(
        [c[::-1].copy() for c in ds.codes], ds.quals, ds.rgs, ds.seconds)
    with pytest.raises(ValueError, match="different parameters"):
        ra(arrays2, cfg, checkpoint_dir=ck)


def test_multi_input_single_output_concatenates(tmp_path, ds):
    """One -o path with several inputs must hold ALL reads (round-1
    ADVICE high: per-input 'wb' reopen kept only the last file)."""
    from kbbq_tpu.oracle.kmers import decode_seq

    def fq_bytes(codes_l, quals_l, tag):
        out = bytearray()
        for i, (c, q) in enumerate(zip(codes_l, quals_l)):
            out += b"@%s%d\n" % (tag, i) + decode_seq(c) + b"\n+\n"
            out += bytes((np.asarray(q) + 33).astype(np.uint8)) + b"\n"
        return bytes(out)

    half = len(ds.codes) // 2
    fq1 = tmp_path / "a.fq"
    fq2 = tmp_path / "b.fq"
    fq1.write_bytes(fq_bytes(ds.codes[:half], ds.quals[:half], b"x"))
    fq2.write_bytes(fq_bytes(ds.codes[half:], ds.quals[half:], b"y"))
    out = tmp_path / "out.fq"
    cfg = RecalConfig(k=16, coverage=25.0, batch_size=64)
    stats = recalibrate_fastq([str(fq1), str(fq2)], str(out), cfg)
    assert stats["num_reads"] == len(ds.codes)
    got = parse_fastq_bytes(out.read_bytes())
    assert got.num_reads == len(ds.codes)
    # order: all of input 1 then all of input 2, sequences untouched
    src1 = parse_fastq_bytes(fq1.read_bytes())
    src2 = parse_fastq_bytes(fq2.read_bytes())
    for i in range(src1.num_reads):
        assert got.seq_bytes(i) == src1.seq_bytes(i)
    for j in range(src2.num_reads):
        assert got.seq_bytes(src1.num_reads + j) == src2.seq_bytes(j)
