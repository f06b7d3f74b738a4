"""BGZF + BAM codec tests and the BAM recalibration path.

No pysam/htslib exists in this environment (SURVEY.md H7), so validation
is: spec-conformant construction -> serialize -> reparse round-trips, plus
BAM-vs-FASTQ pipeline equivalence on identical machine-order reads.
"""

import numpy as np
import pytest

from kbbq_tpu.io import bgzf
from kbbq_tpu.io.bam import (
    BamFile,
    build_record,
    machine_order_read,
    parse_bam_bytes,
    read_bam,
    rewrite_quals,
    serialize_bam,
)
from kbbq_tpu.io.batcher import ReadArrays
from kbbq_tpu.pipeline import RecalConfig, recalibrate_arrays
from kbbq_tpu.pipeline.bam import recalibrate_bam
from kbbq_tpu.utils.synth import make_dataset

# ---------------------------------------------------------------- BGZF


def test_bgzf_roundtrip():
    rng = np.random.default_rng(0)
    for size in (0, 1, 100, 70000, 200001):
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        comp = bgzf.compress(data)
        assert comp.endswith(bgzf.BGZF_EOF)
        assert bgzf.decompress(comp) == data


def test_bgzf_detect():
    comp = bgzf.compress(b"hello world")
    assert bgzf.is_bgzf(comp[:18])
    import gzip
    assert not bgzf.is_bgzf(gzip.compress(b"hello")[:18])


def test_bgzf_rejects_garbage():
    with pytest.raises(bgzf.BGZFError):
        bgzf.decompress(b"not a bgzf stream at all....")


# ----------------------------------------------------------------- BAM


def _tiny_bam(tmp_path, with_rg=True, reverse_some=True):
    rng = np.random.default_rng(1)
    recs = []
    reads = []
    for i in range(6):
        codes = rng.integers(0, 4, 30).astype(np.int8)
        quals = rng.integers(10, 40, 30).astype(np.int8)
        flag = 0
        if reverse_some and i % 2:
            flag |= 0x10
        if i % 3 == 0:
            flag |= 0x1 | 0x80  # paired, read2
        rec = build_record(f"r{i}", codes, quals, flag=flag,
                           rg=("rg1" if with_rg and i < 3 else "rg2"
                               if with_rg else None))
        recs.append(rec)
        reads.append((codes, quals, flag))
    bf = BamFile("@HD\tVN:1.6\n", [("chr1", 1000)], recs)
    p = tmp_path / "tiny.bam"
    p.write_bytes(serialize_bam(bf))
    return p, reads


def test_bam_roundtrip(tmp_path):
    p, reads = _tiny_bam(tmp_path)
    bf = read_bam(str(p))
    assert bf.header_text == "@HD\tVN:1.6\n"
    assert bf.refs == [("chr1", 1000)]
    assert bf.num_records == 6
    for rec, (codes, quals, flag) in zip(bf.records, reads):
        assert rec.flag == flag
        assert (rec.seq_codes() == codes).all()
        assert (rec.quals() == quals).all()


def test_machine_order_reverse_complement(tmp_path):
    codes = np.array([0, 1, 2, 3, 4, 0], dtype=np.int8)  # ACGTNA
    quals = np.array([10, 20, 30, 40, 50, 60], dtype=np.int8)
    rec = build_record("r", codes, quals, flag=0x10)
    mc, mq = machine_order_read(rec)
    # revcomp of ACGTNA = TNACGT -> codes [3,4,0,1,2,3]... wait:
    # comp(A C G T N A) = T G C A N T; reversed = T N A C G T
    assert list(mc) == [3, 4, 0, 1, 2, 3]
    assert list(mq) == [60, 50, 40, 30, 20, 10]


def test_rewrite_quals_and_oq(tmp_path):
    codes = np.arange(8, dtype=np.int8) % 4
    quals = np.full(8, 25, dtype=np.int8)
    rec = build_record("r", codes, quals, flag=0x10, rg="g")
    new_q = np.arange(8, dtype=np.int8) + 10  # machine order
    rewrite_quals(rec, new_q, set_oq=True)
    # stored qual = machine reversed (alignment order)
    assert (rec.quals() == new_q[::-1]).all()
    oq = rec.get_zstr("OQ")
    assert oq == bytes((quals + 33).astype(np.uint8))
    assert rec.get_zstr("RG") == b"g"
    # use_oq read path returns original quals (machine order)
    mc, mq = machine_order_read(rec, use_oq=True)
    assert (mq == quals[::-1]).all()


def test_aux_tag_replace():
    rec = build_record("r", np.zeros(4, np.int8), np.zeros(4, np.int8),
                       rg="g1")
    rewrite_quals(rec, np.full(4, 7, np.int8), set_oq=True)
    rewrite_quals(rec, np.full(4, 9, np.int8), set_oq=True)
    tags = rec.aux_tags()
    assert tags["RG"] == ("Z", b"g1")
    # OQ replaced, not duplicated
    assert tags["OQ"] == ("Z", bytes(np.full(4, 7 + 33, np.uint8)))
    assert len([t for t in tags if t == "OQ"]) == 1


def test_recalibrate_bam_matches_fastq_path(tmp_path):
    """Machine-order reads fed via BAM == same reads via arrays."""
    ds = make_dataset(genome_len=1200, read_len=60, coverage=20.0,
                      error_rate=0.02, seed=41)
    recs = []
    for i, (codes, quals) in enumerate(zip(ds.codes, ds.quals)):
        flag = 0x10 if i % 2 else 0  # half reverse-strand
        c = codes
        q = quals.astype(np.int8)
        if flag & 0x10:
            # store alignment-orientation so machine order == codes
            c = np.where(codes < 4, 3 - codes, codes)[::-1].astype(np.int8)
            q = q[::-1]
        recs.append(build_record(f"r{i}", c, q, flag=flag, rg="rgA"))
    bf = BamFile("@HD\tVN:1.6\n", [("c", 10)], recs)
    p = tmp_path / "in.bam"
    p.write_bytes(serialize_bam(bf))

    out = tmp_path / "out.bam"
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    stats = recalibrate_bam(str(p), str(out), cfg, set_oq=True)
    assert stats["num_reads"] == len(ds.codes)
    assert stats["read_groups"] == 1

    arrays = ReadArrays.from_lists(
        ds.codes, ds.quals, [0] * len(ds.codes), [False] * len(ds.codes))
    want = recalibrate_arrays(arrays, cfg)

    got_bf = read_bam(str(out))
    for i, rec in enumerate(got_bf.records):
        mc, mq = machine_order_read(rec)
        L = len(ds.codes[i])
        assert (mc == ds.codes[i]).all()
        assert (mq == want[i][:L]).all(), f"read {i}"
        # OQ holds originals (alignment order)
        oq = np.frombuffer(rec.get_zstr("OQ"), np.uint8).astype(int) - 33
        orig = ds.quals[i] if not rec.is_reverse else ds.quals[i][::-1]
        assert (oq == orig).all()


def test_bgzf_member_index_and_range_iteration(tmp_path):
    """Virtual-offset sharding primitives (multi-host BAM): the member
    index is a pure compressed-header walk, and range iteration from a
    chunk's virtual offset reproduces the whole-file chunking exactly."""
    import numpy as np

    from kbbq_tpu.io.bam import BamFile, build_record, serialize_bam
    from kbbq_tpu.io.bam_stream import (
        bgzf_member_index,
        iter_bam_raw_chunks_offsets,
        iter_bam_raw_chunks_range,
        voffset_for,
    )

    rng = np.random.default_rng(0)
    recs = []
    for i in range(3000):
        L = int(rng.integers(30, 90))
        recs.append(build_record(
            f"r{i}", rng.integers(0, 4, L).astype(np.int8),
            rng.integers(0, 40, L).astype(np.uint8), flag=0x4))
    p = tmp_path / "t.bam"
    p.write_bytes(serialize_bam(BamFile("@HD\tVN:1.6\n", [], recs),
                                compress=True))

    _, _, chunks, offsets = iter_bam_raw_chunks_offsets(str(p), 450)
    all_chunks = list(chunks)
    assert len(offsets) == len(all_chunks)
    members, total = bgzf_member_index(str(p))
    assert members[0][0] == 0 and members[0][1] == 0
    assert all(a[0] < b[0] and a[1] <= b[1]
               for a, b in zip(members, members[1:]))

    for start in (0, 2, len(all_chunks) - 1):
        n_after = sum(c[1].size for c in all_chunks[start:])
        co, delta = voffset_for(members, total, offsets[start])
        got = list(iter_bam_raw_chunks_range(str(p), co, delta,
                                             n_after, 450))
        assert len(got) == len(all_chunks) - start
        for (b1, o1, s1), (b2, o2, s2) in zip(all_chunks[start:], got):
            assert np.array_equal(b1, b2)
            assert np.array_equal(o1, o2) and np.array_equal(s1, s2)


def test_output_format_routing_by_extension(tmp_path):
    """htslib-style format-polymorphic sink (SURVEY.md C7): the output
    EXTENSION picks the serializer — BAM in can write .sam/.cram, and
    the decoded quals agree across all three."""
    import numpy as np

    from kbbq_tpu.io.bam import BamFile, build_record, read_bam, \
        serialize_bam
    from kbbq_tpu.io.cram import read_cram
    from kbbq_tpu.io.sam import read_sam
    from kbbq_tpu.pipeline import RecalConfig
    from kbbq_tpu.pipeline.bam import recalibrate_bam

    rng = np.random.default_rng(15)
    recs = []
    for i in range(50):
        codes = rng.integers(0, 4, 60).astype(np.int8)
        quals = rng.integers(8, 40, 60).astype(np.int8)
        recs.append(build_record(f"r{i}", codes, quals,
                                 flag=0x10 if i % 2 else 0,
                                 rg="g0" if i % 3 else "g1"))
    src = tmp_path / "in.bam"
    src.write_bytes(serialize_bam(
        BamFile("@HD\tVN:1.6\n@RG\tID:g0\n@RG\tID:g1\n", [], recs)))
    cfg = RecalConfig(k=16, coverage=10.0, batch_size=32)

    out_bam = tmp_path / "o.bam"
    out_sam = tmp_path / "o.sam"
    out_cram = tmp_path / "o.cram"
    recalibrate_bam(str(src), str(out_bam), cfg)
    recalibrate_bam(str(src), str(out_sam), cfg)
    recalibrate_bam(str(src), str(out_cram), cfg)

    a = read_bam(str(out_bam))
    b = read_sam(str(out_sam))
    c, _ = read_cram(str(out_cram))
    assert out_sam.read_bytes().startswith(b"@HD")
    assert out_cram.read_bytes()[:4] == b"CRAM"
    assert len(a.records) == len(b.records) == len(c.records) == 50
    for ra, rb, rc in zip(a.records, b.records, c.records):
        assert ra.name == rb.name == rc.name
        assert (ra.quals() == rb.quals()).all()
        assert (ra.quals() == rc.quals()).all()
        assert rc.get_zstr("RG") == ra.get_zstr("RG")
