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
