"""Op-level device trace of the pass-3 walk rounds.

Captures a jax.profiler trace of _pass3_walks on a bench-scale shard and
aggregates device op durations with jax.profiler.ProfileData — no
tensorboard needed.  Prints the top fusions by total self time and the
share spent inside the two walk while-loops, to tell per-op launch
overhead from real compute (docs/PERF.md round-2 continuation).
"""
import collections
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbbq_tpu.ops.inference import WALK_CHUNK
from kbbq_tpu.pipeline.recalibrate import RecalConfig
from kbbq_tpu.pipeline.resident import (_dense_finish, _pass1_kmers_slice,
                                        _pass2_dense, _pass3_walks)
from kbbq_tpu.oracle.bloom import BloomParams
from kbbq_tpu.oracle.kmers import alpha_threshold
from kbbq_tpu.oracle.lighter import coverage_thresholds
from kbbq_tpu.oracle.pipeline import expected_bloom_keys
from kbbq_tpu.utils.synth import make_arrays_fast

B, K, H, NB, L = 8192, 32, 7, 12, 150
N = NB * B
arrays, _ = make_arrays_fast(genome_len=int(N * L / 50.0), read_len=L,
                             num_reads=N, error_rate=0.005, seed=0)
codes = jnp.asarray(arrays.codes[:N])
ids = jnp.arange(N, dtype=jnp.uint32)
cfg = RecalConfig(k=K, coverage=50.0, batch_size=B)
alpha, cov = cfg.resolve_alpha(N * L)
thr = jnp.uint32(alpha_threshold(alpha))
t_table = jnp.asarray(coverage_thresholds(alpha, K), dtype=jnp.int32)
n_a, n_b = expected_bloom_keys(N * (L - K + 1), alpha, cov)
pa = BloomParams.for_keys(n_a, cfg.sampled_bits_per_key, H)
pb = BloomParams.for_keys(n_b, cfg.trusted_bits_per_key, H)
p = _pass1_kmers_slice(codes, ids, thr, k=K, num_hashes=H,
                       B=B)
rows_a = _dense_finish((p[0],), (p[1],), (p[2],), log2_m=pa.log2_m)
rows_b = _pass2_dense(rows_a, codes, t_table, k=K, num_hashes=H,
                      trust_threshold=cfg.trust_threshold,
                      log2_m=pb.log2_m, B=B)

run = lambda: _pass3_walks(rows_b, codes, k=K, num_hashes=H, ext_cap=None,
                           use_pallas=False, B=B, walk_chunk=WALK_CHUNK)
jax.block_until_ready(run())                      # compile
t0 = time.time()
jax.block_until_ready(run())
print(f"walks wall: {time.time()-t0:.3f}s for {N} reads", file=sys.stderr)

tdir = "/tmp/round_trace"
with jax.profiler.trace(tdir):
    jax.block_until_ready(run())

# aggregate device-side events from the xplane
import glob
import os
pb = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True))[-1]
pd = jax.profiler.ProfileData.from_file(pb)
tot = collections.Counter()
cnt = collections.Counter()
for plane in pd.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    for line in plane.lines:
        for ev in line.events:
            name = ev.name
            dur = ev.duration_ns
            tot[name] += dur
            cnt[name] += 1
grand = sum(tot.values())
print(json.dumps({"plane_total_ms": round(grand / 1e6, 1)}))
for name, ns in tot.most_common(30):
    print(json.dumps({"op": name[:110], "ms": round(ns / 1e6, 2),
                      "n": cnt[name],
                      "us_each": round(ns / cnt[name] / 1e3, 1)}))
