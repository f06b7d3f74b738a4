"""Golden-file regression (SURVEY.md §5: the reference's own strategy).

tests/data/tiny.fq is the committed fixture (the role of the reference's
bundled test FASTQ, BASELINE config 1); tiny.recal.golden.fq is the
oracle's frozen output for k=16, coverage=18.  Any semantic change to the
algorithm — oracle or device — trips this byte-for-byte.
"""

import os

from kbbq_tpu.pipeline import RecalConfig, recalibrate_fastq

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_device_pipeline_matches_golden_bytes(tmp_path):
    out = tmp_path / "out.fq"
    recalibrate_fastq(os.path.join(DATA, "tiny.fq"), str(out),
                      RecalConfig(k=16, coverage=18.0, batch_size=64))
    got = out.read_bytes()
    want = open(os.path.join(DATA, "tiny.recal.golden.fq"), "rb").read()
    assert got == want


def test_oracle_matches_golden_bytes():
    import numpy as np

    from kbbq_tpu.io.fastq import extract_padded_arrays, read_fastq
    from kbbq_tpu.oracle import OracleConfig, recalibrate_reads
    from kbbq_tpu.oracle.pipeline import ReadBatch

    fq = read_fastq(os.path.join(DATA, "tiny.fq"))
    codes, quals, mask, lens = extract_padded_arrays(fq)
    codes_l = [codes[i][:lens[i]] for i in range(fq.num_reads)]
    quals_l = [quals[i][:lens[i]].astype(np.int64)
               for i in range(fq.num_reads)]
    batch = ReadBatch(codes_l, quals_l, [0] * fq.num_reads,
                      [False] * fq.num_reads)
    got, _ = recalibrate_reads(batch, OracleConfig(k=16, coverage=18.0))

    want_fq = read_fastq(os.path.join(DATA, "tiny.recal.golden.fq"))
    for i in range(fq.num_reads):
        want = np.frombuffer(want_fq.qual_bytes(i), np.uint8).astype(
            np.int64) - 33
        assert (got[i] == want).all(), f"read {i}"
