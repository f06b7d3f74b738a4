"""A/B the staged candidate query + walk-width sweep on the real chip,
one long-lived process (claim-queue discipline, KNOWN_ISSUES #0)."""
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbbq_tpu.pipeline import RecalConfig
from kbbq_tpu.pipeline.resident import recalibrate_arrays_resident
from kbbq_tpu.utils.synth import make_arrays_fast
import kbbq_tpu.ops.inference as inf

arrays, _ = make_arrays_fast(genome_len=1_200_000, read_len=150,
                             num_reads=400_000, error_rate=0.005, seed=0)
print("data ready", flush=True)

results = {}
for label, staged, wc in (("staged_wc512", True, 512),
                          ("mono_wc512", False, 512),
                          ("staged_wc1024", True, 1024),
                          ("staged_wc2048", True, 2048),
                          ("staged_wc256", True, 256)):
    inf.STAGED_QUERY = staged
    jax.clear_caches()
    cfg = RecalConfig(k=32, coverage=50.0, batch_size=8192,
                      walk_chunk=wc)
    t0 = time.time()
    recalibrate_arrays_resident(arrays, cfg)          # compile
    print(f"{label}: compile+run {time.time()-t0:.1f}s", flush=True)
    best, bt = None, None
    for _ in range(3):
        pt = {}
        t0 = time.time()
        recalibrate_arrays_resident(arrays, cfg, timings=pt)
        dt = time.time() - t0
        if best is None or dt < best:
            best, bt = dt, pt
    results[label] = {"wall": round(best, 3),
                      "pass3": bt.get("pass3"),
                      "pass1": bt.get("pass1"), "pass2": bt.get("pass2"),
                      "pass4": bt.get("pass4")}
    print(label, results[label], flush=True)
print(json.dumps(results))
