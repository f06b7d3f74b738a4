"""Streaming + vectorized CRAM (io/cram_vec.py, pipeline/cram_stream.py):
the fast-path decoder must match the general per-record decoder bit for
bit, and the streaming recalibrate must match the whole-file CRAM path
on decoded content while preserving every non-QS byte stream."""

import numpy as np
import pytest

from kbbq_tpu.io.cram import CramStream, parse_compression_header, \
    read_cram, split_slices
from kbbq_tpu.io.cram_codecs import read_itf8, write_itf8
from kbbq_tpu.io.cram_vec import decode_slice_vec, itf8_decode_stream, \
    scan_slice_vec
from kbbq_tpu.io.cram_write import write_cram
from kbbq_tpu.pipeline import RecalConfig
from kbbq_tpu.pipeline.cram_stream import (
    _slow_arrays,
    recalibrate_cram_stream_resident,
    scan_cram,
)

from test_cram import _mixed_records, _ref_records


def test_itf8_stream_vec_matches_scalar():
    rng = np.random.default_rng(3)
    vals = [int(v) for v in rng.integers(0, 2 ** 31, 500)]
    vals += [0, 1, 127, 128, 16383, 16384, 2 ** 20, 2 ** 27,
             2 ** 28 - 1, 2 ** 31 - 1, -1 & 0xFFFFFFFF]
    data = b"".join(write_itf8(v) for v in vals)
    got, end = itf8_decode_stream(data, len(vals))
    assert end == len(data)
    pos = 0
    for i, v in enumerate(vals):
        want, pos = read_itf8(data, pos)
        assert got[i] == want, i


def _containers(path):
    with CramStream(path) as cs:
        return (cs.rg_names, cs.ref_names,
                list(cs.containers()))


def _registry_and_lut(rg_names):
    registry = {nm: i for i, nm in enumerate(rg_names)}
    lut = np.zeros(len(rg_names) + 1, np.int32)
    lut[0] = registry.get("", 0)
    for i, nm in enumerate(rg_names):
        lut[i + 1] = registry.get(nm, 0)
    return registry, lut


@pytest.mark.parametrize("case", ["noref", "ref", "embref"])
def test_decode_slice_vec_matches_general(tmp_path, case):
    if case == "noref":
        bf = _mixed_records(seed=7, n=83)
        ref = None
        refs = None
    else:
        bf, ref_bytes = _ref_records(seed=13)
        ref = {"chr1": ref_bytes}
        refs = ref if case == "ref" else None
    p = tmp_path / "t.cram"
    write_cram(bf, str(p), records_per_container=17, ref=ref,
               embed_ref=(case == "embref"))
    rg_names, ref_names, conts = _containers(str(p))
    registry, lut = _registry_and_lut(rg_names)
    max_len = max(r.l_seq for r in bf.records)
    n_seen = 0
    for cont, blocks, _raw in conts:
        comp = parse_compression_header(blocks[0].data)
        for group in split_slices(blocks):
            fast = decode_slice_vec(comp, group, refs, ref_names,
                                    max_len, lut, use_oq=False)
            assert fast is not None, "expected the fast path"
            from kbbq_tpu.io.cram import decode_slice
            recs = decode_slice(comp, group, cont.ref_id, refs,
                                ref_names)
            slow = _slow_arrays(recs, max_len, registry, rg_names,
                                use_oq=False)
            for a, b, nm in zip(fast[:7], slow,
                                ("codes", "quals", "mask", "rgs",
                                 "seconds", "lens", "prim")):
                assert np.array_equal(np.asarray(a), np.asarray(b)), nm
            n_seen += fast[6].size
            # light scan agrees too
            light = scan_slice_vec(comp, group)
            assert light is not None
            bfv, rl, _rg = light
            pm = ((bfv & 0x900) == 0) & (rl > 0)
            assert pm.sum() == fast[6].size
    assert n_seen == len([r for r in bf.records
                          if not r.is_secondary_or_supp and r.l_seq > 0])


def test_decode_slice_vec_oq(tmp_path):
    bf = _mixed_records(seed=21, n=40)
    p = tmp_path / "t.cram"
    write_cram(bf, str(p), records_per_container=40)
    rg_names, ref_names, conts = _containers(str(p))
    registry, lut = _registry_and_lut(rg_names)
    max_len = max(r.l_seq for r in bf.records)
    cont, blocks, _ = conts[0]
    comp = parse_compression_header(blocks[0].data)
    group = split_slices(blocks)[0]
    fast = decode_slice_vec(comp, group, None, ref_names, max_len, lut,
                            use_oq=True)
    assert fast is not None
    from kbbq_tpu.io.cram import decode_slice
    recs = decode_slice(comp, group, cont.ref_id, None, ref_names)
    slow = _slow_arrays(recs, max_len, registry, rg_names, use_oq=True)
    for a, b in zip(fast[:7], slow):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_scan_cram_counts(tmp_path):
    bf = _mixed_records(seed=15, n=61)
    p = tmp_path / "t.cram"
    write_cram(bf, str(p), records_per_container=13)
    n, bases, tk, max_len, registry, rg_names, htext = scan_cram(
        str(p), 17, None)
    prim = [r for r in bf.records
            if not r.is_secondary_or_supp and r.l_seq > 0]
    assert n == len(prim)
    assert bases == sum(r.l_seq for r in prim)
    assert tk == sum(max(r.l_seq - 17 + 1, 0) for r in prim)
    assert max_len == max(r.l_seq for r in prim)
    assert set(registry) == {"g0", "g1"}
    assert "@RG" in htext


def _decode_all(path, fasta_ref=None):
    bf, _ = read_cram(path, fasta_ref=fasta_ref)
    return bf


@pytest.mark.parametrize("use_oq", [False, True])
def test_streaming_cram_matches_wholefile(tmp_path, use_oq):
    from kbbq_tpu.pipeline.bam import recalibrate_cram

    bf = _mixed_records(seed=31, n=400)
    src = tmp_path / "in.cram"
    write_cram(bf, str(src), records_per_container=64)
    cfg = RecalConfig(k=17, coverage=20.0, batch_size=64)

    whole = tmp_path / "whole.cram"
    recalibrate_cram(str(src), str(whole), cfg, use_oq=use_oq)
    stream = tmp_path / "stream.cram"
    stats = recalibrate_cram_stream_resident(
        str(src), str(stream), cfg, use_oq=use_oq, window_reads=96)
    assert stats["streamed"] and stats["format"] == "cram"

    a = _decode_all(str(whole))
    b = _decode_all(str(stream))
    assert len(a.records) == len(b.records) == len(bf.records)
    for ra, rb, orig in zip(a.records, b.records, bf.records):
        assert ra.name == rb.name == orig.name
        assert ra.flag == rb.flag == orig.flag
        assert (ra.seq_codes() == rb.seq_codes()).all()
        assert (ra.quals() == rb.quals()).all(), ra.name
        assert rb.get_zstr("OQ") == orig.get_zstr("OQ")
        assert rb.get_zstr("RG") == ra.get_zstr("RG")


def test_streaming_cram_surgery_preserves_nonqs_streams(tmp_path):
    """The pass-4 surgery must keep every non-QS block's compressed
    bytes verbatim: compare input and output containers block by
    block."""
    from kbbq_tpu.io.cram import CT_EXTERNAL

    bf = _mixed_records(seed=33, n=150)
    src = tmp_path / "in.cram"
    write_cram(bf, str(src), records_per_container=50)
    out = tmp_path / "out.cram"
    cfg = RecalConfig(k=17, coverage=20.0, batch_size=64)
    recalibrate_cram_stream_resident(str(src), str(out), cfg,
                                     window_reads=64)

    _, _, conts_in = _containers(str(src))
    _, _, conts_out = _containers(str(out))
    assert len(conts_in) == len(conts_out)
    qs_cid = None
    changed = kept = 0
    for (ci, bi, rawi), (co, bo, rawo) in zip(conts_in, conts_out):
        assert ci.n_records == co.n_records
        assert len(bi) == len(bo)
        for x, y in zip(bi, bo):
            assert (x.content_type, x.content_id) == \
                (y.content_type, y.content_id)
            raw_x = rawi[ci.body_pos:][x.span[0]:x.span[1]]
            raw_y = rawo[co.body_pos:][y.span[0]:y.span[1]]
            if x.content_type == CT_EXTERNAL and x.content_id == 14:
                qs_cid = x.content_id
                changed += int(x.data != y.data)
            else:
                assert raw_x == raw_y, (x.content_type, x.content_id)
                kept += 1
    assert qs_cid is not None and changed > 0 and kept > 0


def test_streaming_cram_cache_budget_invariance(tmp_path, monkeypatch):
    bf = _mixed_records(seed=35, n=200)
    src = tmp_path / "in.cram"
    write_cram(bf, str(src), records_per_container=32)
    cfg = RecalConfig(k=17, coverage=20.0, batch_size=64)
    out1 = tmp_path / "o1.cram"
    recalibrate_cram_stream_resident(str(src), str(out1), cfg,
                                     window_reads=64)
    monkeypatch.setenv("KBBQ_STREAM_HOST_CACHE_BYTES", "0")
    out2 = tmp_path / "o2.cram"
    recalibrate_cram_stream_resident(str(src), str(out2), cfg,
                                     window_reads=64)
    assert out1.read_bytes() == out2.read_bytes()


def test_streaming_cram_ref_based(tmp_path):
    """Reference-based input (external FASTA) through the streaming
    path: content matches the whole-file path."""
    from kbbq_tpu.pipeline.bam import recalibrate_cram

    bf, ref_bytes = _ref_records(seed=41)
    src = tmp_path / "in.cram"
    write_cram(bf, str(src), ref={"chr1": ref_bytes},
               records_per_container=16)
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1\n" + ref_bytes.decode() + "\n")
    cfg = RecalConfig(k=17, coverage=20.0, batch_size=64)
    whole = tmp_path / "whole.cram"
    recalibrate_cram(str(src), str(whole), cfg, fasta_ref=str(fa))
    stream = tmp_path / "stream.cram"
    recalibrate_cram_stream_resident(str(src), str(stream), cfg,
                                     fasta_ref=str(fa), window_reads=32)
    a = _decode_all(str(whole), fasta_ref=str(fa))
    b = _decode_all(str(stream), fasta_ref=str(fa))
    for ra, rb in zip(a.records, b.records):
        assert ra.name == rb.name
        assert (ra.seq_codes() == rb.seq_codes()).all()
        assert (ra.quals() == rb.quals()).all(), ra.name


def test_shared_content_id_forces_fallback(tmp_path):
    """CRAM allows two series to share one external block (values
    interleave per record); the wholesale decoder cannot follow that, so
    it must hand such slices to the per-record decoder (ADVICE round 4)."""
    from kbbq_tpu.io.cram_vec import _shared_cids

    bf = _mixed_records(seed=33, n=20)
    p = tmp_path / "t.cram"
    write_cram(bf, str(p), records_per_container=20)
    rg_names, ref_names, conts = _containers(str(p))
    _, lut = _registry_and_lut(rg_names)
    max_len = max(r.l_seq for r in bf.records)
    cont, blocks, _ = conts[0]
    comp = parse_compression_header(blocks[0].data)
    group = split_slices(blocks)[0]
    assert decode_slice_vec(comp, group, None, ref_names, max_len, lut,
                            use_oq=False) is not None
    # declare MQ to read from RL's block -> both decoders' RL stream
    # would be shared; the vectorized path must refuse
    comp.ds["MQ"] = comp.ds["RL"]
    assert len(_shared_cids(comp)) == 1
    assert decode_slice_vec(comp, group, None, ref_names, max_len, lut,
                            use_oq=False) is None
    assert scan_slice_vec(comp, group) is None


def test_overlong_secondary_record_falls_back(tmp_path):
    """scan_cram sizes max_len over primary records only; a longer
    secondary record must route the slice to the per-record decoder,
    not abort the run (ADVICE round 4)."""
    bf = _mixed_records(seed=9, n=12)
    p = tmp_path / "t.cram"
    write_cram(bf, str(p), records_per_container=12)
    rg_names, ref_names, conts = _containers(str(p))
    _, lut = _registry_and_lut(rg_names)
    max_len = max(r.l_seq for r in bf.records)
    cont, blocks, _ = conts[0]
    comp = parse_compression_header(blocks[0].data)
    group = split_slices(blocks)[0]
    assert decode_slice_vec(comp, group, None, ref_names, max_len - 1,
                            lut, use_oq=False) is None


def test_mixed_b_and_ref_fill_matches_general(tmp_path):
    """Regression for ADVICE round 4: a mapped record mixing partial 'b'
    spans (N runs) with ref-implied M positions and X substitutions must
    decode identically on the vectorized and per-record paths."""
    from kbbq_tpu.io.bam import BamFile, build_record
    from kbbq_tpu.io.cram import decode_slice

    rng = np.random.default_rng(77)
    ref_codes = rng.integers(0, 4, 400)
    ref_bytes = np.frombuffer(b"ACGT", np.uint8)[ref_codes].tobytes()
    recs = []
    for i in range(24):
        L = 50
        pos = int(rng.integers(0, 340))
        codes = ref_codes[pos:pos + L].astype(np.int8).copy()
        for j in rng.integers(0, L, 4):
            codes[j] = (codes[j] + 1) % 4
        # partial N runs: leading, middle, trailing, multiple
        if i % 4 == 0:
            codes[:int(rng.integers(1, 8))] = 4
        if i % 4 == 1:
            s = int(rng.integers(10, 30))
            codes[s:s + 6] = 4
        if i % 4 == 2:
            codes[-int(rng.integers(1, 8)):] = 4
        if i % 4 == 3:
            codes[3:6] = 4
            codes[20:22] = 4
            codes[-2:] = 4
        quals = rng.integers(0, 45, L).astype(np.uint8)
        rec = build_record(f"r{i}", codes, quals, flag=0, rg=None,
                           refid=0, pos=pos, cigar=[("M", L)])
        rec._rg_index = 0
        recs.append(rec)
    bf = BamFile("@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:400\n@RG\tID:g0\n",
                 [("chr1", 400)], recs)
    refs = {"chr1": ref_bytes}
    for case in ("ref", "embref"):
        p = tmp_path / f"{case}.cram"
        write_cram(bf, str(p), records_per_container=24, ref=refs,
                   embed_ref=(case == "embref"))
        rg_names, ref_names, conts = _containers(str(p))
        registry, lut = _registry_and_lut(rg_names)
        cont, blocks, _ = conts[0]
        comp = parse_compression_header(blocks[0].data)
        group = split_slices(blocks)[0]
        use_refs = refs if case == "ref" else None
        fast = decode_slice_vec(comp, group, use_refs, ref_names, 50,
                                lut, use_oq=False)
        assert fast is not None, "expected the fast path"
        slow = _slow_arrays(
            decode_slice(comp, group, cont.ref_id, use_refs, ref_names),
            50, registry, rg_names, use_oq=False)
        for a, b, nm in zip(fast[:7], slow,
                            ("codes", "quals", "mask", "rgs",
                             "seconds", "lens", "prim")):
            assert np.array_equal(np.asarray(a), np.asarray(b)), nm
        # and the decoded bases really mix b spans with ref fill
        codes0 = np.asarray(fast[0])
        assert (codes0 == 4).any() and (codes0 < 4).any()


def test_streaming_cram_multi_slice(tmp_path):
    """Streaming recalibrate on a MULTI-slice-per-container CRAM: the
    per-slice QS surgery and the vectorized decoder must agree with the
    whole-file path record-for-record."""
    from kbbq_tpu.pipeline.bam import recalibrate_cram

    bf = _mixed_records(seed=47, n=90)
    src = tmp_path / "ms.cram"
    write_cram(bf, str(src), records_per_container=45,
               records_per_slice=16)
    cfg = RecalConfig(k=16, coverage=14.0, batch_size=64)
    whole = tmp_path / "whole.cram"
    recalibrate_cram(str(src), str(whole), cfg)
    stream = tmp_path / "stream.cram"
    recalibrate_cram_stream_resident(str(src), str(stream), cfg,
                                     window_reads=32)
    a = _decode_all(str(whole))
    b = _decode_all(str(stream))
    assert len(a.records) == len(b.records) == len(bf.records)
    for ra, rb in zip(a.records, b.records):
        assert ra.name == rb.name
        assert (ra.seq_codes() == rb.seq_codes()).all()
        assert (ra.quals() == rb.quals()).all(), ra.name
