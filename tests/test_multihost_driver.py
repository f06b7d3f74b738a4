"""Multi-host streaming driver tests (round-1 VERDICT missing-item 2).

The driver runs with real `jax.distributed` across 2 CPU processes (4
virtual devices each -> one 8-device global mesh) and must produce
byte-identical outputs to the single-chip in-RAM pipeline.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from kbbq_tpu.parallel.multihost import (
    host_steps_per_pass,
    partition_inputs,
)
from kbbq_tpu.pipeline import RecalConfig, recalibrate_fastq
from kbbq_tpu.utils.synth import make_dataset, to_fastq_bytes


def _write_inputs(d):
    paths = []
    for i, (gl, rl, seed) in enumerate(
            [(900, 55, 61), (400, 48, 62), (1400, 60, 63)]):
        ds = make_dataset(genome_len=gl, read_len=rl, coverage=15.0,
                          error_rate=0.02, seed=seed)
        p = os.path.join(d, f"in{i}.fq")
        with open(p, "wb") as f:
            f.write(to_fastq_bytes(ds))
        paths.append(p)
    return paths


def test_partition_load_balance_skewed():
    """Greedy LPT keeps imbalance <= 10% on skewed file sizes (round-1
    VERDICT weak-item 6 'done' criterion)."""
    counts = [1000, 900, 500, 400, 300, 250, 240, 200, 120, 90]
    paths = [f"f{i}" for i in range(len(counts))]
    H = 4
    shards = [partition_inputs(paths, counts, h, H) for h in range(H)]
    # every file once, canonical ordinals
    seen = sorted(p for s in shards for p, _ in s.paths)
    assert seen == sorted(paths)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    lookup = {p: o for s in shards for p, o in s.paths}
    for p, c in zip(paths, cum):
        assert lookup[p] == c
    loads = [s.total_reads for s in shards]
    mean = sum(counts) / H
    assert max(loads) <= 1.10 * mean, loads
    # rg ids are original file indices
    for s in shards:
        for (p, _), rg in zip(s.paths, s.rg_ids):
            assert p == paths[rg]


def test_host_steps_per_pass():
    assert host_steps_per_pass([[100, 50], [120]], 64) == 3
    assert host_steps_per_pass([[], [64]], 64) == 1
    assert host_steps_per_pass([], 64) == 0


def test_two_process_cli_matches_single_chip(tmp_path):
    """The pod path is driven through THE CLI BINARY ITSELF (round-2
    VERDICT missing #1): every process runs the same
    `kbbq-tpu recalibrate --multihost` command, resolving its rank from
    the standard JAX_* env vars."""
    d = str(tmp_path)
    paths = _write_inputs(d)

    # ground truth: single-chip in-RAM pipeline, per-file outputs
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    want = [os.path.join(d, f"want{i}.fq") for i in range(3)]
    recalibrate_fastq(paths, want, cfg)

    outs_p = [os.path.join(d, f"out{i}.fq") for i in range(3)]
    coord = "127.0.0.1:29533"
    cmd = [sys.executable, "-m", "kbbq_tpu", "recalibrate", *paths,
           "-k", "16", "-c", "20.0", "--batch-size", "64",
           "--multihost"]
    for o in outs_p:
        cmd += ["-o", o]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["KBBQ_PLATFORM"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "")
            + " --xla_force_host_platform_device_count=4").strip()
        env["JAX_COORDINATOR"] = coord
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-3000:]
    stats = [json.loads(so.splitlines()[-1]) for so, _ in outs]
    assert sum(s["host_reads_written"] for s in stats) == \
        stats[0]["num_reads"]
    assert stats[0]["devices"] == 8

    for i in range(3):
        got = open(outs_p[i], "rb").read()
        exp = open(want[i], "rb").read()
        assert got == exp, f"file {i} differs"


def _write_test_bam(path, n=600, seed=17):
    from kbbq_tpu.io.bam import BamFile, build_record, serialize_bam
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 3000).astype(np.int8)
    recs = []
    for i in range(n):
        L = int(rng.integers(40, 70))
        s = int(rng.integers(0, 3000 - L))
        codes = genome[s:s + L].copy()
        err = rng.random(L) < 0.02
        codes[err] = (codes[err] + 1) % 4
        q = rng.integers(8, 40, L).astype(np.uint8)
        flag = 0
        if i % 3 == 1:
            flag |= 0x10          # reverse strand
        if i % 2:
            flag |= 0x1 | 0x80    # paired, read2
        if i % 11 == 7:
            flag |= 0x100         # secondary (passes through)
        recs.append(build_record(
            f"r{i}", codes, q, flag=flag, rg="g0" if i % 5 else "g1",
            refid=0, pos=s, cigar=[("M", L)]))
    bf = BamFile("@HD\tVN:1.6\n@RG\tID:g0\n@RG\tID:g1\n",
                 [("chr1", 3000)], recs)
    with open(path, "wb") as f:
        f.write(serialize_bam(bf, compress=True))


def test_partition_bam_chunks_contiguous_balanced():
    from kbbq_tpu.parallel.multihost import partition_bam_chunks
    metas = [{"n_primary": c} for c in (100, 100, 50, 200, 80, 70, 90)]
    r = partition_bam_chunks(metas, 3)
    assert r[0][0] == 0 and r[-1][1] == len(metas)
    for (a, b), (c, d) in zip(r, r[1:]):
        assert b == c
    loads = [sum(m["n_primary"] for m in metas[a:b]) for a, b in r]
    assert max(loads) <= 0.5 * sum(loads)   # no host owns everything


def test_two_process_cli_bam_matches_single_host(tmp_path):
    """Multi-host BAM through THE CLI BINARY: 2 processes, virtual-
    offset sharded input, `cat` of the part files is a valid BAM whose
    records are byte-identical to the single-host streaming output."""
    from kbbq_tpu.io.bam import read_bam
    from kbbq_tpu.pipeline import RecalConfig
    from kbbq_tpu.pipeline.bam import recalibrate_bam_streaming

    d = str(tmp_path)
    bam = os.path.join(d, "in.bam")
    _write_test_bam(bam)

    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    want_path = os.path.join(d, "want.bam")
    recalibrate_bam_streaming(bam, want_path, cfg, devices=2,
                              chunk_records=150)
    # ground truth from the plain single-host streaming engine too
    want1 = os.path.join(d, "want1.bam")
    recalibrate_bam_streaming(bam, want1, cfg, chunk_records=150)

    out = os.path.join(d, "out.bam")
    coord = "127.0.0.1:29537"
    cmd = [sys.executable, "-m", "kbbq_tpu", "recalibrate", bam,
           "-o", out, "-k", "16", "-c", "20.0", "--batch-size", "64",
           "--chunk-reads", "150", "--multihost"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["KBBQ_PLATFORM"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "")
            + " --xla_force_host_platform_device_count=4").strip()
        env["JAX_COORDINATOR"] = coord
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env))
    results = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, se.decode()[-3000:]
    stats = [json.loads(so.splitlines()[-1]) for so, _ in results]
    assert stats[0]["devices"] == 8

    parts = sorted(
        p for p in os.listdir(d) if p.startswith("out.bam.part-"))
    assert len(parts) == 2
    with open(out, "wb") as f:
        for p in parts:
            f.write(open(os.path.join(d, p), "rb").read())

    got = read_bam(out)
    want = read_bam(want1)
    assert len(got.records) == len(want.records)
    n_prim = 0
    for a, b in zip(want.records, got.records):
        assert bytes(a.data) == bytes(b.data), a.name
        n_prim += not a.is_secondary_or_supp
    assert sum(s["host_reads_written"] for s in stats) == n_prim
    # and the multi-DEVICE single-host answer agrees record-for-record
    want2 = read_bam(want_path)
    for a, b in zip(want.records, want2.records):
        assert bytes(a.data) == bytes(b.data)


def _mh_env(pid, coord, extra=None):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["KBBQ_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=4").strip()
    env["JAX_COORDINATOR"] = coord
    env["JAX_NUM_PROCESSES"] = "2"
    env["JAX_PROCESS_ID"] = str(pid)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    if extra:
        env.update(extra)
    return env


def _launch2(cmd, coord, extra_env=None):
    return [subprocess.Popen(cmd, stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE,
                             env=_mh_env(pid, coord, extra_env))
            for pid in range(2)]


def test_two_process_checkpoint_resume_after_kill_fastq(tmp_path):
    """Multi-host failure/recovery (round-4 VERDICT missing #5): host 1
    is hard-killed mid-pass-2 (after the pass-1 checkpoint), the whole
    job restarts, resumes from the saved pass, and the output is
    byte-identical to the single-host run — with pass 1 NOT recomputed."""
    import time

    d = str(tmp_path)
    paths = _write_inputs(d)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    want = [os.path.join(d, f"want{i}.fq") for i in range(3)]
    recalibrate_fastq(paths, want, cfg)

    outs_p = [os.path.join(d, f"out{i}.fq") for i in range(3)]
    ck = os.path.join(d, "ck")
    cmd = [sys.executable, "-m", "kbbq_tpu", "recalibrate", *paths,
           "-k", "16", "-c", "20.0", "--batch-size", "64",
           "--multihost", "--checkpoint-dir", ck]
    for o in outs_p:
        cmd += ["-o", o]

    # run 1: host 1 dies right after the pass-1 checkpoint lands
    procs = _launch2(cmd, "127.0.0.1:29541",
                     {"KBBQ_CRASH_POINT": "pass2:1"})
    assert procs[1].wait(timeout=900) == 41        # injected crash
    # host 0 is now stuck in a pass-2 collective against a dead peer;
    # wait for its pass-1 checkpoint to land, then the "scheduler"
    # kills it (the real failure model: restart all processes)
    rows_a = os.path.join(ck, "mh_rows_a.npy")
    deadline = time.time() + 120
    while not os.path.exists(rows_a) and time.time() < deadline:
        time.sleep(0.2)
    procs[0].kill()
    procs[0].communicate()
    assert os.path.exists(rows_a), "pass-1 checkpoint missing"
    mtime = os.path.getmtime(rows_a)

    # run 2: full restart, fresh coordinator port
    procs = _launch2(cmd, "127.0.0.1:29542")
    results = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, se.decode()[-3000:]

    for i in range(3):
        assert open(outs_p[i], "rb").read() == \
            open(want[i], "rb").read(), f"file {i} differs"
    assert os.path.getmtime(rows_a) == mtime, \
        "pass 1 was recomputed despite the checkpoint"


def test_two_process_checkpoint_resume_after_kill_bam(tmp_path):
    """The BAM twin of the kill/restart recovery test."""
    import time

    from kbbq_tpu.io.bam import read_bam
    from kbbq_tpu.pipeline.bam import recalibrate_bam_streaming

    d = str(tmp_path)
    bam = os.path.join(d, "in.bam")
    _write_test_bam(bam)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    want_path = os.path.join(d, "want.bam")
    recalibrate_bam_streaming(bam, want_path, cfg, chunk_records=150)

    out = os.path.join(d, "out.bam")
    ck = os.path.join(d, "ck")
    cmd = [sys.executable, "-m", "kbbq_tpu", "recalibrate", bam,
           "-o", out, "-k", "16", "-c", "20.0", "--batch-size", "64",
           "--chunk-reads", "150", "--multihost",
           "--checkpoint-dir", ck]

    procs = _launch2(cmd, "127.0.0.1:29543",
                     {"KBBQ_CRASH_POINT": "pass2:1"})
    assert procs[1].wait(timeout=900) == 41
    rows_a = os.path.join(ck, "mh_rows_a.npy")
    deadline = time.time() + 120
    while not os.path.exists(rows_a) and time.time() < deadline:
        time.sleep(0.2)
    procs[0].kill()
    procs[0].communicate()
    assert os.path.exists(rows_a)
    mtime = os.path.getmtime(rows_a)

    procs = _launch2(cmd, "127.0.0.1:29544")
    results = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, se.decode()[-3000:]

    parts = sorted(
        p for p in os.listdir(d) if p.startswith("out.bam.part-"))
    assert len(parts) == 2
    with open(out, "wb") as f:
        for p in parts:
            f.write(open(os.path.join(d, p), "rb").read())
    got, wantb = read_bam(out), read_bam(want_path)
    assert len(got.records) == len(wantb.records)
    for a, b in zip(wantb.records, got.records):
        assert bytes(a.data) == bytes(b.data), a.name
    assert os.path.getmtime(rows_a) == mtime


def test_two_process_cli_cram_matches_single_host(tmp_path):
    """Multi-host CRAM through THE CLI BINARY (round-4 VERDICT missing
    #4): 2 processes, container-range sharded input, `cat` of the part
    files is byte-identical to the single-host streaming output (the
    QS surgery preserves every non-QS byte on both paths)."""
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cram import _mixed_records

    from kbbq_tpu.io.cram_write import write_cram
    from kbbq_tpu.pipeline.cram_stream import \
        recalibrate_cram_stream_resident

    d = str(tmp_path)
    cram = os.path.join(d, "in.cram")
    bf = _mixed_records(seed=29, n=240)
    write_cram(bf, cram, records_per_container=32)

    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    want_path = os.path.join(d, "want.cram")
    recalibrate_cram_stream_resident(cram, want_path, cfg,
                                     window_reads=64)

    out = os.path.join(d, "out.cram")
    cmd = [sys.executable, "-m", "kbbq_tpu", "recalibrate", cram,
           "-o", out, "-k", "16", "-c", "20.0", "--batch-size", "64",
           "--multihost"]
    procs = _launch2(cmd, "127.0.0.1:29545")
    results = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, se.decode()[-3000:]
    stats = [json.loads(so.splitlines()[-1]) for so, _ in results]
    assert stats[0]["devices"] == 8

    parts = sorted(
        p for p in os.listdir(d) if p.startswith("out.cram.part-"))
    assert len(parts) == 2
    cat = b"".join(open(os.path.join(d, p), "rb").read()
                   for p in parts)
    assert cat == open(want_path, "rb").read()
    n_prim = len([r for r in bf.records
                  if not r.is_secondary_or_supp and r.l_seq > 0])
    assert sum(s["host_reads_written"] for s in stats) == n_prim


def test_two_process_sharded_bloom_matches_single_chip(tmp_path):
    """Multi-host with the hash-space SHARDED Bloom layout (BASELINE
    config 5 at WGS sizing): 2 processes, filters sharded over the
    8-device global mesh, output byte-identical to the single-chip
    in-RAM pipeline."""
    d = str(tmp_path)
    paths = _write_inputs(d)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    want = [os.path.join(d, f"want{i}.fq") for i in range(3)]
    recalibrate_fastq(paths, want, cfg)

    outs_p = [os.path.join(d, f"out{i}.fq") for i in range(3)]
    cmd = [sys.executable, "-m", "kbbq_tpu", "recalibrate", *paths,
           "-k", "16", "-c", "20.0", "--batch-size", "64",
           "--multihost", "--bloom-layout", "sharded"]
    for o in outs_p:
        cmd += ["-o", o]
    procs = _launch2(cmd, "127.0.0.1:29547")
    results = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, se.decode()[-3000:]
    for i in range(3):
        assert open(outs_p[i], "rb").read() == \
            open(want[i], "rb").read(), f"file {i} differs"


def test_two_process_sharded_checkpoint_resume_after_kill(tmp_path):
    """Recovery on the SHARDED layout: per-host shard saves + barrier +
    marker protocol — host 1 killed after the pass-1 marker, full
    restart resumes without recomputing pass 1, output byte-identical."""
    import json as _json
    import time

    d = str(tmp_path)
    paths = _write_inputs(d)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    want = [os.path.join(d, f"want{i}.fq") for i in range(3)]
    recalibrate_fastq(paths, want, cfg)

    outs_p = [os.path.join(d, f"out{i}.fq") for i in range(3)]
    ck = os.path.join(d, "ck")
    cmd = [sys.executable, "-m", "kbbq_tpu", "recalibrate", *paths,
           "-k", "16", "-c", "20.0", "--batch-size", "64",
           "--multihost", "--bloom-layout", "sharded",
           "--checkpoint-dir", ck]
    for o in outs_p:
        cmd += ["-o", o]

    procs = _launch2(cmd, "127.0.0.1:29549",
                     {"KBBQ_CRASH_POINT": "pass2:1"})
    assert procs[1].wait(timeout=900) == 41
    meta = os.path.join(ck, "meta.json")
    deadline = time.time() + 120

    def _marked():
        try:
            return "mh_sh_rows_a" in _json.load(
                open(meta))["passes_done"]
        except Exception:
            return False

    while not _marked() and time.time() < deadline:
        time.sleep(0.2)
    procs[0].kill()
    procs[0].communicate()
    assert _marked(), "pass-1 marker missing"
    shard0 = os.path.join(ck, "mh_sh_rows_a_host0.npy")
    shard1 = os.path.join(ck, "mh_sh_rows_a_host1.npy")
    assert os.path.exists(shard0) and os.path.exists(shard1)
    mt = (os.path.getmtime(shard0), os.path.getmtime(shard1))

    procs = _launch2(cmd, "127.0.0.1:29550")
    results = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, se.decode()[-3000:]
    for i in range(3):
        assert open(outs_p[i], "rb").read() == \
            open(want[i], "rb").read(), f"file {i} differs"
    assert (os.path.getmtime(shard0), os.path.getmtime(shard1)) == mt, \
        "pass-1 shards were recomputed despite the checkpoint"


def test_two_process_cli_cram_multi_slice(tmp_path):
    """Multi-host CRAM with MULTI-slice containers: the per-SLICE step
    budget must keep the pod's collectives in lockstep (a per-container
    budget under-counts and deadlocks — round-5 self-review #1)."""
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cram import _mixed_records

    from kbbq_tpu.io.cram_write import write_cram
    from kbbq_tpu.pipeline.cram_stream import \
        recalibrate_cram_stream_resident

    d = str(tmp_path)
    cram = os.path.join(d, "in.cram")
    bf = _mixed_records(seed=31, n=200)
    # slices of 24 records with local_batch 32: slice batches (1 each)
    # disagree with per-container ceils (96/32=3 vs 4 slices) — the
    # budget must count 4
    write_cram(bf, cram, records_per_container=96, records_per_slice=24)

    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    want_path = os.path.join(d, "want.cram")
    recalibrate_cram_stream_resident(cram, want_path, cfg,
                                     window_reads=64)

    out = os.path.join(d, "out.cram")
    cmd = [sys.executable, "-m", "kbbq_tpu", "recalibrate", cram,
           "-o", out, "-k", "16", "-c", "20.0", "--batch-size", "64",
           "--multihost"]
    procs = _launch2(cmd, "127.0.0.1:29551")
    results = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, se.decode()[-3000:]
    parts = sorted(
        p for p in os.listdir(d) if p.startswith("out.cram.part-"))
    cat = b"".join(open(os.path.join(d, p), "rb").read()
                   for p in parts)
    assert cat == open(want_path, "rb").read()


def test_two_process_report_roundtrip(tmp_path):
    """Report interop across topologies: a single-host --report-out
    applied by a 2-process pod (applybqsr --multihost) reproduces the
    single-host direct run byte-for-byte; and a pod --report-out equals
    the single-host report."""
    d = str(tmp_path)
    paths = _write_inputs(d)
    cfg = RecalConfig(k=16, coverage=20.0, batch_size=64)
    want = [os.path.join(d, f"want{i}.fq") for i in range(3)]
    from kbbq_tpu.pipeline.recalibrate import recalibrate_fastq as _rf
    rpt = os.path.join(d, "recal.txt")
    _rf(paths, want, cfg, report_out=rpt)

    # pod APPLY from the single-host report
    outs_p = [os.path.join(d, f"out{i}.fq") for i in range(3)]
    cmd = [sys.executable, "-m", "kbbq_tpu", "applybqsr", "-r", rpt,
           *paths, "-k", "16", "-c", "20.0", "--batch-size", "64",
           "--multihost"]
    for o in outs_p:
        cmd += ["-o", o]
    procs = _launch2(cmd, "127.0.0.1:29553")
    results = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, se.decode()[-3000:]
    for i in range(3):
        assert open(outs_p[i], "rb").read() == \
            open(want[i], "rb").read(), f"file {i} differs"

    # pod --report-out == the single-host report
    rpt2 = os.path.join(d, "recal2.txt")
    outs2 = [os.path.join(d, f"o2_{i}.fq") for i in range(3)]
    cmd2 = [sys.executable, "-m", "kbbq_tpu", "recalibrate", *paths,
            "-k", "16", "-c", "20.0", "--batch-size", "64",
            "--multihost", "--report-out", rpt2]
    for o in outs2:
        cmd2 += ["-o", o]
    procs = _launch2(cmd2, "127.0.0.1:29554")
    results = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, results):
        assert p.returncode == 0, se.decode()[-3000:]
    assert open(rpt2).read() == open(rpt).read()
