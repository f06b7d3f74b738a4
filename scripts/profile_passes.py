"""Module-level on-chip timing of the resident passes (one process).

Isolates: (a) whether in-scan queries are cheap (VMEM hoisting of the
loop-invariant filter), (b) what pass 3's walk dispatch really costs at
each walk_chunk, (c) a query-only scan floor.
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbbq_tpu.ops.bloom import bloom_query_rows, bloom_rows
from kbbq_tpu.ops.kmers import canonical_kmers_batch
from kbbq_tpu.pipeline.resident import (_pass1_all, _pass2_all,
                                        _pass3_accum, _pass3_walks)
from kbbq_tpu.utils.synth import make_arrays_fast

B, K, H = 8192, 32, 7
NUM = 49 * B            # 49 batches, bench-like
READ_LEN = 150
coverage = 50.0
arrays, _ = make_arrays_fast(genome_len=max(1000, int(NUM * READ_LEN / coverage)),
                             read_len=READ_LEN, num_reads=NUM,
                             error_rate=0.005, seed=0)
codes = jnp.asarray(arrays.codes)
quals = jnp.asarray(arrays.quals)
mask = jnp.asarray(arrays.mask)
rgs = jnp.asarray(arrays.rgs)
seconds = jnp.asarray(arrays.seconds)
ids = jnp.arange(NUM, dtype=jnp.uint32)
float(jnp.sum(codes.astype(jnp.float32)))  # force h2d before timing
print("data on device", file=sys.stderr)

from kbbq_tpu.oracle.bloom import BloomParams
from kbbq_tpu.oracle.kmers import alpha_threshold
from kbbq_tpu.oracle.lighter import coverage_thresholds
from kbbq_tpu.oracle.pipeline import expected_bloom_keys
from kbbq_tpu.pipeline.recalibrate import RecalConfig

cfg = RecalConfig(k=K, coverage=coverage, batch_size=B)
alpha, cov = cfg.resolve_alpha(NUM * READ_LEN)
lens = arrays.mask.sum(axis=1)
total_kmers = int(np.maximum(lens - K + 1, 0).sum())
n_a, n_b = expected_bloom_keys(total_kmers, alpha, cov)
pa = BloomParams.for_keys(n_a, cfg.sampled_bits_per_key, H)
pb = BloomParams.for_keys(n_b, cfg.trusted_bits_per_key, H)
threshold = jnp.uint32(alpha_threshold(alpha))
t_table = jnp.asarray(coverage_thresholds(alpha, K), dtype=jnp.int32)


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(name, fn, iters=3):
    sync(fn())
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    sync(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({"stage": name, "s": round(dt, 3)}), flush=True)
    return dt


timeit("pass1", lambda: _pass1_all(jnp.zeros(pa.m, jnp.uint8), codes, ids,
                                   threshold, k=K, num_hashes=H, B=B))
rows_a = _pass1_all(jnp.zeros(pa.m, jnp.uint8), codes, ids, threshold,
                    k=K, num_hashes=H, B=B)
timeit("pass2", lambda: _pass2_all(rows_a, jnp.zeros(pb.m, jnp.uint8),
                                   codes, t_table, k=K, num_hashes=H,
                                   trust_threshold=None, B=B))
rows_b = _pass2_all(rows_a, jnp.zeros(pb.m, jnp.uint8), codes, t_table,
                    k=K, num_hashes=H, trust_threshold=None, B=B)


# query-only scan floor: same shape as pass 2/3's full-dataset query
@functools.partial(jax.jit, static_argnames=("k", "num_hashes", "B"))
def _query_only(rows, codes, *, k, num_hashes, B):
    nb = codes.shape[0] // B

    def body(acc, i):
        c = jax.lax.dynamic_slice_in_dim(codes, i * B, B, 0)
        hi, lo, valid = canonical_kmers_batch(c, k)
        tr = bloom_query_rows(rows, hi, lo, num_hashes) & valid
        return acc + jnp.sum(tr.astype(jnp.int32)), None

    acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(nb))
    return acc


timeit("query_only_scan", lambda: _query_only(rows_b, codes, k=K,
                                              num_hashes=H, B=B))

for wc in (256, 512):
    timeit(f"pass3_walks_wc{wc}",
           lambda wc=wc: _pass3_walks(rows_b, codes, k=K, num_hashes=H,
                                      ext_cap=None, use_pallas=False,
                                      B=B, walk_chunk=wc), iters=2)
errors = _pass3_walks(rows_b, codes, k=K, num_hashes=H, ext_cap=None,
                      use_pallas=False, B=B, walk_chunk=256)
timeit("pass3_accum", lambda: _pass3_accum(errors, codes, quals, mask,
                                           rgs, seconds, B=B, num_rg=1,
                                           max_len=READ_LEN))
print("done", file=sys.stderr)
