"""Decompose infer_errors_scheduled: prologue (query + anchors +
permutes + lane pack) vs while-loop rounds.  The prologue is isolated
by running on all-trusted data (alpha=1, zero errors): no lane is
active, the fori never executes a round."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbbq_tpu.ops.inference import infer_errors_scheduled
from kbbq_tpu.pipeline.resident import _pass3_walks
from kbbq_tpu.utils.synth import make_arrays_fast
from kbbq_tpu.oracle.bloom import BloomParams
from kbbq_tpu.oracle.lighter import coverage_thresholds
from kbbq_tpu.oracle.kmers import alpha_threshold
from kbbq_tpu.oracle.pipeline import expected_bloom_keys
from kbbq_tpu.pipeline.recalibrate import RecalConfig
from kbbq_tpu.pipeline.resident import _pass1_kmers_slice, _dense_finish, \
    _pass2_dense

B, K, H, NB, L = 8192, 32, 7, 49, 150
N = NB * B


def timeit(name, fn, iters=3):
    r = fn()
    leaf = jax.tree.leaves(r)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    print(json.dumps({"op": name, "ms": round(dt * 1e3, 1)}), flush=True)


def build(error_rate, alpha_cov):
    arrays, _ = make_arrays_fast(genome_len=int(N * L / 50.0), read_len=L,
                                 num_reads=N, error_rate=error_rate,
                                 seed=0)
    codes = jnp.asarray(arrays.codes[:N])
    ids = jnp.arange(N, dtype=jnp.uint32)
    cfg = RecalConfig(k=K, coverage=50.0, batch_size=B, alpha=alpha_cov)
    alpha, cov = cfg.resolve_alpha(N * L)
    thr = jnp.uint32(alpha_threshold(alpha))
    t_table = jnp.asarray(coverage_thresholds(alpha, K), dtype=jnp.int32)
    n_a, n_b = expected_bloom_keys(N * (L - K + 1), alpha, cov)
    pa = BloomParams.for_keys(n_a, cfg.sampled_bits_per_key, H)
    pb = BloomParams.for_keys(n_b, cfg.trusted_bits_per_key, H)
    la, lb = pa.log2_m, pb.log2_m
    p = _pass1_kmers_slice(codes, ids, thr, k=K, num_hashes=H,
                           log2_m=la, B=B)
    rows_a = _dense_finish((p[0],), (p[1],), (p[2],), log2_m=la)
    rows_b = _pass2_dense(rows_a, codes, t_table, k=K, num_hashes=H,
                          trust_threshold=cfg.trust_threshold,
                          log2_m=lb, B=B)
    return rows_b, codes


# all-trusted: alpha=1 + no errors -> zero active lanes -> prologue only
rows0, codes0 = build(0.0, 1.0)
timeit("scheduled_prologue_only(49 batches)",
       lambda: _pass3_walks(rows0, codes0, k=K, num_hashes=H,
                            ext_cap=None, use_pallas=False, B=B), iters=3)

# bench-like: rounds dominate the difference
rows1, codes1 = build(0.005, None)
timeit("scheduled_full(49 batches)",
       lambda: _pass3_walks(rows1, codes1, k=K, num_hashes=H,
                            ext_cap=None, use_pallas=False, B=B), iters=3)
print("done", file=sys.stderr)
