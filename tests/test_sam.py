"""SAM text codec tests (round-1 VERDICT missing-item 4).

htslib's sam_read1 reads SAM text and BAM through one API; our .sam path
must parse into the same record model, recalibrate, and emit SAM text
with only the QUAL column changed.
"""

import numpy as np
import pytest

from kbbq_tpu.io.bam import machine_order_read, serialize_bam
from kbbq_tpu.io.batcher import ReadArrays
from kbbq_tpu.io.sam import (
    parse_sam_text,
    read_sam,
    record_to_sam_line,
    serialize_sam,
)
from kbbq_tpu.pipeline import RecalConfig, recalibrate_arrays
from kbbq_tpu.pipeline.bam import recalibrate_bam
from kbbq_tpu.utils.synth import make_dataset

SAM = (
    "@HD\tVN:1.6\tSO:coordinate\n"
    "@SQ\tSN:chr1\tLN:1000\n"
    "@SQ\tSN:chr2\tLN:500\n"
    "@RG\tID:g1\tPU:unit1\n"
    "r1\t0\tchr1\t100\t60\t5M\t*\t0\t0\tACGTA\tIIIII\tRG:Z:g1\n"
    "r2\t16\tchr2\t7\t30\t3M2S\t=\t7\t0\tGGTTA\t!!!FF\t"
    "RG:Z:g1\tNM:i:2\tAS:i:-3\tXF:f:1.5\n"
    "r3\t4\t*\t0\t0\t*\t*\t0\t0\tTTTT\t####\n"
)


def test_sam_parse_fields():
    bf = parse_sam_text(SAM)
    assert bf.refs == [("chr1", 1000), ("chr2", 500)]
    assert bf.num_records == 3
    r1, r2, r3 = bf.records
    assert r1.name == "r1" and r1.refid == 0 and r1.pos == 99
    assert r1.flag == 0 and r1.l_seq == 5
    assert bytes(r1.get_zstr("RG")) == b"g1"
    assert (r1.seq_codes() == [0, 1, 2, 3, 0]).all()
    assert (r1.quals() == 40).all()
    assert r2.refid == 1 and r2.is_reverse
    tags = r2.aux_tags()
    assert tags["NM"][0] == "i"
    assert r3.refid == -1 and r3.flag == 4


def test_sam_roundtrip_byte_stable():
    bf = parse_sam_text(SAM)
    out = serialize_sam(bf).decode()
    # every alignment line round-trips exactly (aux order preserved)
    src_lines = [l for l in SAM.splitlines() if not l.startswith("@")]
    got_lines = [l for l in out.splitlines() if not l.startswith("@")]
    assert got_lines == src_lines
    # headers preserved too
    assert out.startswith("@HD\tVN:1.6\tSO:coordinate\n@SQ")


def test_sam_unknown_ref_rejected():
    bad = "@SQ\tSN:chr1\tLN:10\nr\t0\tchrX\t1\t0\t4M\t*\t0\t0\tACGT\tIIII\n"
    with pytest.raises(ValueError, match="unknown sequence"):
        parse_sam_text(bad)


def test_recalibrate_sam_matches_bam(tmp_path):
    """The .sam input path produces the same qualities as the .bam path
    on the same records, and only QUAL changes in the output."""
    from kbbq_tpu.io.bam import BamFile, build_record

    ds = make_dataset(genome_len=600, read_len=50, coverage=20.0,
                      error_rate=0.02, seed=7)
    recs = []
    for i, (c, q) in enumerate(zip(ds.codes, ds.quals)):
        recs.append(build_record(f"r{i}", np.asarray(c),
                                 np.asarray(q, dtype=np.uint8),
                                 flag=4, rg="g1"))
    bf = BamFile("@HD\tVN:1.6\n", [], recs)
    sam_path = tmp_path / "in.sam"
    sam_path.write_bytes(b"@HD\tVN:1.6\n@RG\tID:g1\n" + b"".join(
        record_to_sam_line(r, []).encode() + b"\n" for r in recs))
    bam_path = tmp_path / "in.bam"
    bam_path.write_bytes(serialize_bam(bf))

    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    out_sam = tmp_path / "out.sam"
    out_bam = tmp_path / "out.bam"
    s1 = recalibrate_bam(str(sam_path), str(out_sam), cfg)
    s2 = recalibrate_bam(str(bam_path), str(out_bam), cfg)
    assert s1["num_reads"] == s2["num_reads"] == len(ds.codes)

    got = read_sam(str(out_sam))
    from kbbq_tpu.io.bam import read_bam
    want = read_bam(str(out_bam))
    for rg, rw in zip(got.records, want.records):
        assert rg.name == rw.name
        assert (rg.quals() == rw.quals()).all()
        assert (rg.seq_codes() == rw.seq_codes()).all()

    # only the QUAL column differs between input and output SAM text
    src = [l.split("\t") for l in
           sam_path.read_text().splitlines() if not l.startswith("@")]
    dst = [l.split("\t") for l in
           out_sam.read_text().splitlines() if not l.startswith("@")]
    for a, b in zip(src, dst):
        assert a[:10] == b[:10]
        assert a[11:] == b[11:]
