"""Round-4 clean chip session (idle host, run AFTER the chr20 golden
finishes): hash-cache A/B + official re-measurements + chr20 TPU run.
Appends JSON lines to /tmp/chip_session2.jsonl."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = open("/tmp/chip_session2.jsonl", "a")


def log(msg):
    print(f"[chip2 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def emit(stage, obj):
    OUT.write(json.dumps({"stage": stage, **obj}) + "\n")
    OUT.flush()
    log(f"{stage}: {json.dumps(obj)[:300]}")


import bench  # noqa: E402

stages = sys.argv[1:] or ["ab", "official", "bam15", "chr20"]

if "ab" in stages:
    # hash-cache A/B inside one process (the driver reads the env var
    # at call time); 3 timed runs each, report best + pass walls
    from kbbq_tpu.pipeline import RecalConfig
    from kbbq_tpu.pipeline.resident import recalibrate_arrays_resident
    from kbbq_tpu.utils.synth import make_arrays_fast

    arrays, _ = make_arrays_fast(genome_len=1_200_000, read_len=150,
                                 num_reads=400_000, error_rate=0.005,
                                 seed=0)
    cfg = RecalConfig(k=32, coverage=50.0, batch_size=8192)
    for label, v in (("cache1", "1"), ("cache0", "0"), ("cache1b", "1")):
        os.environ["KBBQ_HASH_CACHE"] = v
        recalibrate_arrays_resident(arrays, cfg)     # compile/warm
        best, bt = None, None
        for _ in range(3):
            tm = {}
            t0 = time.time()
            recalibrate_arrays_resident(arrays, cfg, timings=tm)
            dt = time.time() - t0
            if best is None or dt < best:
                best, bt = dt, tm
        emit(f"ab_{label}", {"wall_s": round(best, 3),
                             "pass_times": {k2: v2 for k2, v2 in
                                            bt.items()
                                            if k2 != "h2d_slices"}})
    os.environ["KBBQ_HASH_CACHE"] = "1"

if "official" in stages:
    host_env = bench._host_env()
    r = bench.run(400_000, 150, 32, 8192, parity=True, resident=True)
    r["detail"]["host_env"] = host_env
    emit("bench_resident", {"value": r["value"], "parity": r["parity"],
                            "detail": r["detail"]})
    s = bench.run_stream(400_000, 150, 32, 8192, parity=True)
    emit("bench_streamed", {"value": s["value"], "parity": s["parity"],
                            "wall_s": s["detail"]["wall_s"],
                            "x_resident": round(
                                s["detail"]["wall_s"]
                                / r["detail"]["wall_s"], 3)})
    b = bench.run_bam(400_000, 150, 32, 8192, parity=True)
    emit("bench_bam", {"value": b["value"], "parity": b["parity"],
                       "detail": b["detail"]})

if "bam15" in stages:
    b = bench.run_bam(1_500_000, 150, 32, 8192, parity=True)
    emit("bam_1p5M", {"value": b["value"], "parity": b["parity"],
                      "detail": b["detail"]})

if "cram" in stages:
    pass  # measured in session 1; rerun by hand if needed

if "chr20" in stages:
    import runpy
    sys.argv = ["chr20.py", "tpu"]
    runpy.run_path("/root/repo/scripts/chr20.py", run_name="__main__")

log("session done")
