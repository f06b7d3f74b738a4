"""Device-trace pass-3 walks for a few batches; dump the trace for
offline aggregation."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import kbbq_tpu.ops.inference as inf
from kbbq_tpu.pipeline import RecalConfig
from kbbq_tpu.pipeline.resident import (_pass1_kmers_slice, _dense_finish,
                                        _pass2_dense)
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
params_a, params_b = bloom_params_for(
    cfg, int(np.maximum(lens - K + 1, 0).sum()), alpha, coverage)
la = int(params_a.m).bit_length() - 1
lb = int(params_b.m).bit_length() - 1
ids = jnp.arange(N, dtype=jnp.uint32)
blks, ws, keeps = _pass1_kmers_slice(codes, ids, threshold, k=K,
                                     num_hashes=H, log2_m=la, B=B)
rows_a = _dense_finish((blks,), (ws,), (keeps,), log2_m=la)
rows_b = _pass2_dense(rows_a, codes, t_table, k=K, num_hashes=H,
                      trust_threshold=cfg.trust_threshold, log2_m=lb, B=B)
np.asarray(rows_b[:1])
print("filter B built", flush=True)

# warm up / compile
o = inf.infer_errors_scheduled(rows_b, codes[:B], K, H, chunk=512)
np.asarray(o[:1, :1])

with jax.profiler.trace("/tmp/p3trace"):
    outs = [inf.infer_errors_scheduled(rows_b, codes[i * B:(i + 1) * B],
                                       K, H, chunk=512)
            for i in range(6)]
    np.asarray(outs[-1][:1, :1])
print("trace done", flush=True)
