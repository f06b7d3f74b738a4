"""GATKReport round-trip: write tables -> parse -> rebuild the dense Q'
lookup -> must equal the directly-computed one (ApplyBQSR equivalence)."""

import io

import numpy as np

from kbbq_tpu.gatk_report import (
    read_gatk_report,
    recal_table_from_report,
    write_gatk_report,
)
from kbbq_tpu.oracle import CovariateTables, accumulate_read
from kbbq_tpu.oracle.gatk import build_recal_table
from kbbq_tpu.utils.synth import make_dataset


def _tables():
    ds = make_dataset(genome_len=1000, read_len=50, coverage=15.0,
                      error_rate=0.02, seed=51, num_rg=2, paired=True)
    tables = CovariateTables(num_rg=2, max_len=50)
    rng = np.random.default_rng(3)
    for i in range(len(ds.codes)):
        err = rng.random(50) < 0.03
        accumulate_read(tables, ds.codes[i], ds.quals[i], err,
                        ds.rgs[i], ds.seconds[i])
    return tables


def test_report_roundtrip_rebuilds_identical_recal_table(tmp_path):
    tables = _tables()
    rg_names = ["rgA", "rgB"]
    path = tmp_path / "recal.table"
    write_gatk_report(tables, rg_names, str(path))

    report = read_gatk_report(str(path))
    assert set(report) == {"RecalTable0", "RecalTable1", "RecalTable2"}
    assert len(report["RecalTable0"]) == 2

    rebuilt = recal_table_from_report(report, rg_names, tables.max_len)
    direct = build_recal_table(tables)
    # cells actually observed must match exactly; unobserved cells may
    # differ (the report doesn't carry empty cells, deltas default 0)
    obs_cyc = tables.cyc_total > 0   # [rg, q, c]
    mism = 0
    for rg, q, c in zip(*np.nonzero(obs_cyc)):
        for dn in range(17):
            if dn < 16 and tables.din_total[rg, q, dn] == 0:
                continue
            if rebuilt[rg, q, c, dn] != direct[rg, q, c, dn]:
                mism += 1
    assert mism == 0


def test_report_header_format(tmp_path):
    tables = _tables()
    buf = io.StringIO()
    write_gatk_report(tables, ["a", "b"], buf)
    text = buf.getvalue()
    assert text.startswith("#:GATKReport.v1.1:3\n")
    assert "#:GATKTable:RecalTable0:" in text
    assert "EstimatedQReported" in text


def test_report_roundtrip_cram(tmp_path):
    """P9 on CRAM: report-out then apply-report reproduces the direct
    run, on both the whole-file and streaming drivers."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_cram import _mixed_records

    from kbbq_tpu.io.cram_write import write_cram
    from kbbq_tpu.pipeline import RecalConfig
    from kbbq_tpu.pipeline.bam import recalibrate_cram
    from kbbq_tpu.pipeline.cram_stream import \
        recalibrate_cram_stream_resident

    bf = _mixed_records(seed=19, n=48)
    src = tmp_path / "in.cram"
    write_cram(bf, str(src), records_per_container=16)
    cfg = RecalConfig(k=16, coverage=12.0, batch_size=32)
    rpt = tmp_path / "recal.txt"
    out1 = tmp_path / "direct.cram"
    recalibrate_cram(str(src), str(out1), cfg, report_out=str(rpt))
    out2 = tmp_path / "applied.cram"
    recalibrate_cram(str(src), str(out2), cfg, apply_report=str(rpt))
    assert out1.read_bytes() == out2.read_bytes()
    # streaming apply: decoded content matches (framing differs by design)
    out3 = tmp_path / "applied_stream.cram"
    recalibrate_cram_stream_resident(str(src), str(out3), cfg,
                                     apply_report=str(rpt),
                                     window_reads=16)
    from kbbq_tpu.io.cram import read_cram
    a, _ = read_cram(str(out1))
    b, _ = read_cram(str(out3))
    assert len(a.records) == len(b.records)
    for ra, rb in zip(a.records, b.records):
        assert ra.name == rb.name
        assert (ra.quals() == rb.quals()).all()


def test_rg_label_injective():
    """'rg 1' and 'rg_1' must stay DISTINCT report keys (round-5
    self-review #4) — and the escape round-trips via the apply path."""
    from kbbq_tpu.gatk_report import _rg_label

    names = ["rg 1", "rg_1", "rg%201", "rg\t1", "", "a b", "a%20b",
             "a\nb", "plain"]
    labels = [_rg_label(n) for n in names]
    assert len(set(labels)) == len(labels), labels
    for lab in labels:
        assert not any(c.isspace() for c in lab), lab


def test_gz_pathlib_sink(tmp_path):
    """pathlib.Path('out.fq.gz') through the library API must compress
    (round-5 self-review #5)."""
    import gzip
    import pathlib

    from kbbq_tpu.pipeline import RecalConfig
    from kbbq_tpu.pipeline.recalibrate import recalibrate_fastq
    from kbbq_tpu.utils.synth import make_dataset, to_fastq_bytes

    ds = make_dataset(genome_len=600, read_len=50, coverage=12.0,
                      error_rate=0.02, seed=3)
    src = tmp_path / "in.fq"
    src.write_bytes(to_fastq_bytes(ds))
    out = pathlib.Path(tmp_path / "out.fq.gz")
    recalibrate_fastq([str(src)], out,
                      RecalConfig(k=16, coverage=12.0, batch_size=64))
    raw = out.read_bytes()
    assert raw[:2] == b"\x1f\x8b"
    assert gzip.decompress(raw).count(b"\n") == \
        src.read_bytes().count(b"\n")
