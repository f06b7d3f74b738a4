"""Bench-scale decomposition of pass-1/2 time (one process, async
dispatch + one d2h sync per timing, profile_components.py pattern)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbbq_tpu.ops.bloom import bloom_rows_dense, probe_words
from kbbq_tpu.ops.kmers import canonical_kmers_batch, sample_keep_mask
from kbbq_tpu.oracle.bloom import BloomParams
from kbbq_tpu.oracle.kmers import alpha_threshold
from kbbq_tpu.oracle.lighter import coverage_thresholds
from kbbq_tpu.oracle.pipeline import expected_bloom_keys
from kbbq_tpu.pipeline.recalibrate import RecalConfig
from kbbq_tpu.pipeline.resident import (_pass1_kmers_slice, _pass2_dense,
                                        _pass3_walks, _dense_finish)

B, K, H, NB = 8192, 32, 7, 49
L = 150
N = NB * B
rng = np.random.default_rng(0)

# real-ish data: reads drawn from a genome so filters behave like bench
from kbbq_tpu.utils.synth import make_arrays_fast
arrays, _ = make_arrays_fast(genome_len=int(N * L / 50.0), read_len=L,
                             num_reads=N, error_rate=0.005, seed=0)
codes_h = np.concatenate(
    [arrays.codes, np.full((N - arrays.codes.shape[0], L), 4, np.int8)]) \
    if arrays.codes.shape[0] < N else arrays.codes[:N]
codes = jnp.asarray(codes_h)
ids = jnp.arange(N, dtype=jnp.uint32)
float(jnp.sum(codes.astype(jnp.float32)))
print("data on device", file=sys.stderr)

cfg = RecalConfig(k=K, coverage=50.0, batch_size=B)
alpha, cov = cfg.resolve_alpha(N * L)
threshold = jnp.uint32(alpha_threshold(alpha))
t_table = jnp.asarray(coverage_thresholds(alpha, K), dtype=jnp.int32)
n_a, n_b = expected_bloom_keys(N * (L - K + 1), alpha, cov)
pa = BloomParams.for_keys(n_a, cfg.sampled_bits_per_key, H)
pb = BloomParams.for_keys(n_b, cfg.trusted_bits_per_key, H)
la = int(pa.m).bit_length() - 1
lb = int(pb.m).bit_length() - 1
print(f"filters: A 2^{la} bits, B 2^{lb} bits", file=sys.stderr)


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
    return out


# ---- pass 1 pieces
kp = timeit("p1_kmers_all_slices(pack+hash+probe_words, 49 batches)",
            lambda: _pass1_kmers_slice(codes, ids, threshold, k=K,
                                       num_hashes=H, log2_m=la, B=B))
blks, ws, keeps = kp
timeit("p1_dense_finish(sort+scan+extract 49M)",
       lambda: _dense_finish((blks,), (ws,), (keeps,), log2_m=la))


# components inside the slice compute, one batch x49 estimate
c1 = codes[:B]
timeit("canonical_kmers_batch x1 (of 49)",
       lambda: canonical_kmers_batch(c1, K), iters=10)
hi1, lo1, v1 = canonical_kmers_batch(c1, K)
timeit("probe_words x1 (of 49)",
       lambda: probe_words(hi1, lo1, H, la), iters=10)
timeit("sample_keep x1 (of 49)",
       lambda: sample_keep_mask(ids[:B], hi1.shape[1], threshold),
       iters=10)

# dense-build internals at 49M
blk_s = jnp.where(keeps, blks, jnp.uint32(1 << (la - 5)))
w_s = jnp.where(keeps, ws, jnp.uint32(0))
timeit("sort49M(2-arr num_keys=1)",
       lambda: jax.lax.sort((blk_s, w_s), num_keys=1))
rows_a = _dense_finish((blks,), (ws,), (keeps,), log2_m=la)

# ---- pass 2
timeit("p2_dense(total)",
       lambda: _pass2_dense(rows_a, codes, t_table, k=K, num_hashes=H,
                            trust_threshold=cfg.trust_threshold,
                            log2_m=lb, B=B))

# ---- pass 3 walks for reference
rows_b = _pass2_dense(rows_a, codes, t_table, k=K, num_hashes=H,
                      trust_threshold=cfg.trust_threshold, log2_m=lb, B=B)
timeit("p3_walks(total)",
       lambda: _pass3_walks(rows_b, codes, k=K, num_hashes=H,
                            ext_cap=None, use_pallas=False, B=B),
       iters=2)
print("done", file=sys.stderr)
