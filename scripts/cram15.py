"""1.5M-record CRAM streaming measurement (round-3 VERDICT #6 'done'
bar: within 2x of BAM-mode wall at 1.5M records)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from kbbq_tpu.io.bam import BamFile, build_record
from kbbq_tpu.io.cram_write import write_cram
from kbbq_tpu.pipeline import RecalConfig
from kbbq_tpu.pipeline.cram_stream import recalibrate_cram_stream_resident
from kbbq_tpu.utils.synth import make_arrays_fast
import bench


def log(m):
    print(f"[cram15 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


N = 1_500_000
in_cram = "/root/chr20_data/bench15.cram"
if not os.path.exists(in_cram):
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
    t0 = time.time()
    write_cram(bf, in_cram, records_per_container=131072)
    log(f"staged {os.path.getsize(in_cram) >> 20} MB in "
        f"{time.time() - t0:.0f}s")
    del recs, bf, arrays

cfg = RecalConfig(k=32, coverage=50.0, batch_size=8192)
tm = {}
recalibrate_cram_stream_resident(in_cram, "/tmp/out15.cram", cfg,
                                 timings=tm)
log(f"warm-up {tm}")
best, bt = None, None
for _ in range(2):
    tm = {}
    t0 = time.time()
    recalibrate_cram_stream_resident(in_cram, "/tmp/out15.cram", cfg,
                                     timings=tm)
    dt = time.time() - t0
    if best is None or dt < best:
        best, bt = dt, tm
want = bench.golden_quals(N, 150, 32, 8192, None)
parity = None
if want is not None:
    from kbbq_tpu.io.cram import read_cram
    out_bf, _ = read_cram("/tmp/out15.cram")
    got = np.zeros_like(want)
    for i, rec in enumerate(out_bf.records):
        q = rec.quals()
        got[i, :q.size] = q
    parity = bool((got == want).all())
print(json.dumps({"stage": "cram_1p5M", "value": round(N / best, 1),
                  "parity": parity, "wall_s": round(best, 3),
                  "pass_times": bt}))
