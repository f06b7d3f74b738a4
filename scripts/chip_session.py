"""Round-4 consolidated chip session: ALL on-chip measurements in one
long-lived process (KNOWN_ISSUES #0: process churn poisons the axon
claim queue).  Stages:

  1. 400k bench: resident + streamed + BAM (bench.py functions in-proc)
  2. ns/probe vs filter size (2^26..2^33 bits)
  3. 1.5M-record BAM (round-3 VERDICT #5 target: >= 65k reads/s/chip)
  4. 400k-record CRAM streaming (VERDICT #6: within 2x of BAM wall)
  5. chr20-class 13M-read streamed run + parity (VERDICT #2)

Each stage appends a JSON line to /tmp/chip_session.jsonl as it lands,
so a mid-session death still records everything before it.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = open("/tmp/chip_session.jsonl", "a")


def log(msg):
    print(f"[chip {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def emit(stage, obj):
    OUT.write(json.dumps({"stage": stage, **obj}) + "\n")
    OUT.flush()
    log(f"{stage}: {json.dumps(obj)[:300]}")


sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

stages = sys.argv[1:] or ["bench", "probes", "bam15", "cram", "chr20"]

if "bench" in stages:
    host_env = bench._host_env()
    r = bench.run(400_000, 150, 32, 8192, parity=True, resident=True)
    r["detail"]["host_env"] = host_env
    emit("bench_resident", {"value": r["value"], "parity": r["parity"],
                            "detail": r["detail"]})
    s = bench.run_stream(400_000, 150, 32, 8192, parity=True)
    emit("bench_streamed", {"value": s["value"], "parity": s["parity"],
                            "detail": s["detail"],
                            "x_resident": round(
                                r["detail"]["wall_s"] and
                                s["detail"]["wall_s"]
                                / r["detail"]["wall_s"], 3)})
    b = bench.run_bam(400_000, 150, 32, 8192, parity=True)
    emit("bench_bam", {"value": b["value"], "parity": b["parity"],
                       "detail": b["detail"]})

if "probes" in stages:
    import numpy as np
    import jax.numpy as jnp
    N = 48_000_000
    res = {}
    for log2_m in (26, 28, 31, 33):
        M = 1 << (log2_m - 5)
        packed = jnp.ones((M,), jnp.uint32)
        rng = np.random.default_rng(log2_m)
        blocks = jnp.asarray(rng.integers(0, M, N, dtype=np.int64)
                             .astype(np.int32))

        @jax.jit
        def q(p, b):
            return jnp.sum(p[b], dtype=jnp.uint32)

        np.asarray(q(packed, blocks))
        best = 9e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(q(packed, blocks))
            best = min(best, time.time() - t0)
        res[f"log2m{log2_m}_MB{(M * 4) >> 20}"] = round(best / N * 1e9, 2)
        log(f"probe sweep log2_m={log2_m}: {best / N * 1e9:.2f} ns")
        del packed, blocks
    emit("probe_ns_vs_filter_size", res)

if "bam15" in stages:
    b = bench.run_bam(1_500_000, 150, 32, 8192, parity=True)
    emit("bam_1p5M", {"value": b["value"], "parity": b["parity"],
                      "detail": b["detail"]})

if "cram" in stages:
    # 400k-record CRAM disk->disk via the streaming engine; same
    # dataset family as the BAM bench so walls are comparable
    import numpy as np
    from kbbq_tpu.io.bam import BamFile, build_record
    from kbbq_tpu.io.cram_write import write_cram
    from kbbq_tpu.pipeline import RecalConfig
    from kbbq_tpu.pipeline.cram_stream import \
        recalibrate_cram_stream_resident
    from kbbq_tpu.utils.synth import make_arrays_fast

    N = 400_000
    arrays, _ = make_arrays_fast(genome_len=max(1000, N * 150 // 50),
                                 read_len=150, num_reads=N,
                                 error_rate=0.005, seed=0)
    recs = []
    for i in range(N):
        flag = 0x4 | (0x1 | 0x80 if arrays.seconds[i] else 0)
        r = build_record(f"r{i}", arrays.codes[i],
                         arrays.quals[i].astype(np.uint8), flag=flag)
        r._rg_index = 0
        recs.append(r)
    bf = BamFile("@HD\tVN:1.6\n@RG\tID:rg0\n", [], recs)
    in_cram = "/tmp/bench_in.cram"
    t0 = time.time()
    write_cram(bf, in_cram, records_per_container=65536)
    log(f"CRAM staged in {time.time() - t0:.1f}s "
        f"({os.path.getsize(in_cram) >> 20} MB)")
    del recs, bf
    cfg = RecalConfig(k=32, coverage=50.0, batch_size=8192)
    tm = {}
    recalibrate_cram_stream_resident(in_cram, "/tmp/bench_out.cram",
                                     cfg, timings=tm)
    log(f"warm-up done {tm}")
    best, bt = None, None
    for _ in range(2):
        tm = {}
        t0 = time.time()
        recalibrate_cram_stream_resident(in_cram, "/tmp/bench_out.cram",
                                         cfg, timings=tm)
        dt = time.time() - t0
        if best is None or dt < best:
            best, bt = dt, tm
    # parity: decoded output quals vs the resident golden
    want = bench.golden_quals(N, 150, 32, 8192, None)
    parity = None
    if want is not None:
        from kbbq_tpu.io.cram import read_cram
        out_bf, _ = read_cram("/tmp/bench_out.cram")
        got = np.zeros_like(want)
        for i, rec in enumerate(out_bf.records):
            q = rec.quals()
            # machine order == stored order for these unmapped records
            got[i, :q.size] = q
        parity = bool((got == want).all())
    emit("cram_400k", {"value": round(N / best, 1), "parity": parity,
                       "wall_s": round(best, 3), "pass_times": bt})

if "chr20" in stages:
    import runpy
    sys.argv = ["chr20.py", "tpu"]
    runpy.run_path("/root/repo/scripts/chr20.py", run_name="__main__")

log("session done")
