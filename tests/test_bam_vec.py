"""io/bam_vec.py: whole-chunk vectorized BAM decode vs the per-record
path (bit-for-bit).  Covers mixed read lengths, reverse-strand flips,
multi-RG registries, aux chains with fixed/Z/B tags in arbitrary order,
decoy "RGZ" bytes inside other Z values, OQ quals, and the pass-4 chunk
rewrite (with and without --set-oq)."""

import numpy as np
import pytest

from kbbq_tpu.io.bam import (
    BamFile,
    build_record,
    machine_order_read,
    read_bam,
    serialize_bam,
)
from kbbq_tpu.io.bam_stream import iter_bam_raw_chunks
from kbbq_tpu.io.bam_vec import (
    decode_machine_chunk,
    rewrite_quals_chunk,
    scan_chunk,
)


def _mixed_bam(tmp_path, with_oq=True, seed=3):
    """A BAM exercising every decode corner; returns (path, n_primary)."""
    rng = np.random.default_rng(seed)
    recs = []
    for i in range(60):
        L = int(rng.integers(20, 90))
        codes = rng.integers(0, 5, L).astype(np.int8)  # incl. N
        quals = rng.integers(0, 45, L).astype(np.uint8)
        flag = 0
        if i % 3 == 1:
            flag |= 0x10  # reverse strand
        if i % 2:
            flag |= 0x1 | 0x80  # paired, read2
        if i % 11 == 7:
            flag |= 0x100  # secondary: passes through undecoded
        rg = ["rgA", "rgB", None, "rg with spaces"][i % 4]
        aux = b""
        # fixed-width tags before RG/OQ (NM:i, AS:c)
        aux += b"NMi" + (i % 7).to_bytes(4, "little")
        aux += b"ASc" + bytes([i % 100])
        # decoy: a Z value CONTAINING the bytes "RGZ" and "OQZ"
        aux += b"XDZ" + b"deco_RGZfake_OQZfake" + b"\x00"
        # B array (c type) with bytes that look like tags
        aux += b"XBB" + b"c" + (4).to_bytes(4, "little") + b"RGZc"
        if with_oq:
            aux += b"OQZ" + bytes((quals + 33).tolist()) + b"\x00"
        # hex tag after OQ
        aux += b"XHH" + b"DEADBEEF" + b"\x00"
        rec = build_record(f"r{i}", codes, quals, flag=flag, rg=rg,
                           aux_extra=aux)
        recs.append(rec)
    bf = BamFile("@HD\tVN:1.6\n", [("chr1", 1000)], recs)
    p = tmp_path / "mixed.bam"
    p.write_bytes(serialize_bam(bf))
    n_prim = sum(1 for r in recs if not r.is_secondary_or_supp)
    return str(p), n_prim


def _reference_decode(path, registry, max_len, use_oq):
    """The per-record loop the vectorized decoder replaced."""
    bf = read_bam(path)
    prim = [r for r in bf.records
            if not r.is_secondary_or_supp and r.l_seq > 0]
    n = len(prim)
    codes = np.full((n, max_len), 4, np.int8)
    quals = np.zeros((n, max_len), np.int8)
    mask = np.zeros((n, max_len), bool)
    rgs = np.zeros(n, np.int32)
    seconds = np.zeros(n, bool)
    for i, rec in enumerate(prim):
        c, q = machine_order_read(rec, use_oq=use_oq)
        m = len(c)
        codes[i, :m] = c
        quals[i, :m] = np.clip(q, 0, 93)
        mask[i, :m] = True
        tag = rec.get_zstr("RG")
        rgs[i] = registry[tag.decode() if tag is not None else ""]
        seconds[i] = rec.is_read2
    return codes, quals, mask, rgs, seconds


@pytest.mark.parametrize("use_oq", [False, True])
def test_decode_matches_per_record(tmp_path, use_oq):
    path, n_prim = _mixed_bam(tmp_path)
    _, _, chunks = iter_bam_raw_chunks(path)
    buf, offs, sizes = next(chunks)
    cn, cb, ck, max_len, keys = scan_chunk(buf, offs, sizes, k=16)
    assert cn == n_prim
    registry = {key: i for i, key in enumerate(keys)}
    got = decode_machine_chunk(buf, offs, sizes, max_len, registry,
                               use_oq=use_oq)
    want = _reference_decode(path, registry, max_len, use_oq)
    for g, w, name in zip(got, want,
                          ("codes", "quals", "mask", "rgs", "seconds")):
        assert np.array_equal(g, w), name


def test_scan_chunk_matches_per_record(tmp_path):
    path, n_prim = _mixed_bam(tmp_path)
    _, _, chunks = iter_bam_raw_chunks(path)
    buf, offs, sizes = next(chunks)
    cn, cb, ck, ml, keys = scan_chunk(buf, offs, sizes, k=16)
    bf = read_bam(path)
    prim = [r for r in bf.records
            if not r.is_secondary_or_supp and r.l_seq > 0]
    assert cn == len(prim)
    assert cb == sum(r.l_seq for r in prim)
    assert ck == sum(max(0, r.l_seq - 16 + 1) for r in prim)
    assert ml == max(r.l_seq for r in prim)
    want_keys, seen = [], set()
    for r in prim:
        tag = r.get_zstr("RG")
        key = tag.decode() if tag is not None else ""
        if key not in seen:
            seen.add(key)
            want_keys.append(key)
    assert keys == want_keys


def test_registry_appearance_order_across_rg_mix(tmp_path):
    # untagged record first: "" must get id 0
    recs = [build_record("a", np.zeros(30, np.int8),
                         np.full(30, 20, np.uint8)),
            build_record("b", np.zeros(30, np.int8),
                          np.full(30, 20, np.uint8), rg="late")]
    bf = BamFile("@HD\tVN:1.6\n", [("c", 10)], recs)
    p = tmp_path / "o.bam"
    p.write_bytes(serialize_bam(bf))
    _, _, chunks = iter_bam_raw_chunks(str(p))
    buf, offs, sizes = next(chunks)
    *_, keys = scan_chunk(buf, offs, sizes, k=8)
    assert keys == ["", "late"]


@pytest.mark.parametrize("set_oq,with_oq", [(False, True), (True, True),
                                             (True, False)])
def test_rewrite_chunk_matches_per_record(tmp_path, set_oq, with_oq):
    """with_oq=True exercises the delete+append per-record path;
    with_oq=False the vectorized grown-record fast path."""
    from kbbq_tpu.io.bam import record_from_body, rewrite_quals
    path, _ = _mixed_bam(tmp_path, with_oq=with_oq)
    _, _, chunks = iter_bam_raw_chunks(path)
    buf, offs, sizes = next(chunks)
    cn, _, _, max_len, keys = scan_chunk(buf, offs, sizes, k=16)
    registry = {key: i for i, key in enumerate(keys)}
    codes, quals, mask, rgs, seconds, lens, prim = decode_machine_chunk(
        buf, offs, sizes, max_len, registry)
    rng = np.random.default_rng(9)
    new_q = rng.integers(2, 40, (cn, max_len)).astype(np.int8)

    got = bytes(rewrite_quals_chunk(buf, offs, sizes, prim, lens, new_q,
                                    set_oq=set_oq))

    # reference: per-record rewrite over freshly parsed records
    import struct
    want = bytearray()
    j = 0
    for i in range(offs.size):
        o, sz = int(offs[i]), int(sizes[i])
        rec = record_from_body(bytearray(bytes(buf[o:o + sz])))
        if not rec.is_secondary_or_supp and rec.l_seq > 0:
            rewrite_quals(rec, new_q[j][:int(lens[j])], set_oq=set_oq)
            j += 1
        want += struct.pack("<i", len(rec.data)) + bytes(rec.data)
    assert got == bytes(want)
