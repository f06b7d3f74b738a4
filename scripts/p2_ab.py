"""A/B pass-2 variants on chip: recompute-from-codes vs hash-cache."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbbq_tpu.pipeline import RecalConfig
from kbbq_tpu.pipeline.resident import (_pass1_kmers_slice, _dense_finish,
                                        _pass2_dense, _pass2_dense_cached)
from kbbq_tpu.oracle.kmers import alpha_threshold
from kbbq_tpu.oracle.lighter import coverage_thresholds
from kbbq_tpu.oracle.pipeline import bloom_params_for
from kbbq_tpu.utils.synth import make_arrays_fast

K, H, B = 32, 7, 8192
arrays, _ = make_arrays_fast(genome_len=1_200_000, read_len=150,
                             num_reads=400_000, error_rate=0.005, seed=0)
cfg = RecalConfig(k=32, coverage=50.0, batch_size=B)
nb = arrays.num_reads // B
N = nb * B
codes = jnp.asarray(arrays.codes[:N])
lens = arrays.mask[:N].sum(axis=1)
alpha, coverage = cfg.resolve_alpha(int(lens.sum()))
threshold = jnp.uint32(alpha_threshold(alpha))
t_table = jnp.asarray(coverage_thresholds(alpha, K), dtype=jnp.int32)
pa, pb = bloom_params_for(cfg, int(np.maximum(lens - K + 1, 0).sum()),
                          alpha, coverage)
la = int(pa.m).bit_length() - 1
lb = int(pb.m).bit_length() - 1
ids = jnp.arange(N, dtype=jnp.uint32)
h1, w, keeps = _pass1_kmers_slice(codes, ids, threshold, k=K,
                                  num_hashes=H, B=B)
rows_a = _dense_finish((h1,), (w,), (keeps,), log2_m=la)
np.asarray(rows_a[:1])
print("rows_a built", flush=True)


def run(tag, fn):
    np.asarray(fn()[:1])
    best = 9e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(fn()[:1])
        best = min(best, time.time() - t0)
    print(f"{tag}: {best:.3f}s", flush=True)


ref = None
run("old  recompute codes ", lambda: _pass2_dense(
    rows_a, codes, t_table, k=K, num_hashes=H,
    trust_threshold=cfg.trust_threshold, log2_m=lb, B=B))
run("new  hash cache      ", lambda: _pass2_dense_cached(
    rows_a, (h1,), (w,), t_table, k=K,
    trust_threshold=cfg.trust_threshold, log2_m_a=la, log2_m_b=lb, B=B))
a = _pass2_dense(rows_a, codes, t_table, k=K, num_hashes=H,
                 trust_threshold=cfg.trust_threshold, log2_m=lb, B=B)
b = _pass2_dense_cached(rows_a, (h1,), (w,), t_table, k=K,
                        trust_threshold=cfg.trust_threshold,
                        log2_m_a=la, log2_m_b=lb, B=B)
print("identical:", bool((np.asarray(a) == np.asarray(b)).all()),
      flush=True)
