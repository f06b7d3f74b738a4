"""Split pass-3 wall into (initial query + schedule prologue/epilogue)
vs (walk rounds) on the real chip: run infer_errors_scheduled against
the REAL trusted filter and against an ALL-ONES filter (every window
trusted -> zero active lanes -> the chunk fori never executes).
The all-ones run prices everything except the rounds themselves.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbbq_tpu.pipeline import RecalConfig
from kbbq_tpu.pipeline.resident import (_pass1_kmers_slice, _dense_finish,
                                        _pass2_dense)
from kbbq_tpu.ops.inference import infer_errors_scheduled, WALK_CHUNK
from kbbq_tpu.ops.kmers import canonical_kmers_batch
from kbbq_tpu.ops.bloom import bloom_query_rows
from kbbq_tpu.oracle.kmers import alpha_threshold
from kbbq_tpu.oracle.lighter import coverage_thresholds
from kbbq_tpu.oracle.pipeline import bloom_params_for
from kbbq_tpu.utils.synth import make_arrays_fast

K, H, B = 32, 7, 8192

arrays, _ = make_arrays_fast(genome_len=1_200_000, read_len=150,
                             num_reads=400_000, error_rate=0.005, seed=0)
print("data ready", flush=True)

cfg = RecalConfig(k=32, coverage=50.0, batch_size=B)
nb = arrays.num_reads // B
N = nb * B
codes_np = arrays.codes[:N]
lens = arrays.mask[:N].sum(axis=1)
total_bases = int(lens.sum())
total_kmers = int(np.maximum(lens - K + 1, 0).sum())
alpha, coverage = cfg.resolve_alpha(total_bases)
threshold = jnp.uint32(alpha_threshold(alpha))
t_table = jnp.asarray(coverage_thresholds(alpha, K), dtype=jnp.int32)
params_a, params_b = bloom_params_for(cfg, total_kmers, alpha, coverage)
la = int(params_a.m).bit_length() - 1
lb = int(params_b.m).bit_length() - 1

codes = jnp.asarray(codes_np)
ids = jnp.arange(N, dtype=jnp.uint32)
blks, ws, keeps = _pass1_kmers_slice(codes, ids, threshold, k=K,
                                     num_hashes=H, B=B)
rows_a = _dense_finish((blks,), (ws,), (keeps,), log2_m=la)
rows_b = _pass2_dense(rows_a, codes, t_table, k=K, num_hashes=H,
                      trust_threshold=cfg.trust_threshold, log2_m=lb, B=B)
rows_b.block_until_ready()
print("filter B built:", rows_b.shape, flush=True)

ones = jnp.full_like(rows_b, jnp.uint32(0xFFFFFFFF))


def run(rows, tag):
    outs = []
    t0 = time.time()
    for i in range(nb):
        outs.append(infer_errors_scheduled(rows, codes[i * B:(i + 1) * B],
                                           K, H, chunk=WALK_CHUNK))
    np.asarray(outs[-1][:1, :1])   # real d2h: tunnel b_u_r is a no-op
    dt = time.time() - t0
    print(f"{tag}: {dt:.3f}s total, {dt / nb * 1e3:.2f} ms/batch",
          flush=True)
    return dt


# also price the initial all-window query alone
@jax.jit
def q_only(rows, c):
    hi, lo, valid = canonical_kmers_batch(c, K)
    return bloom_query_rows(rows, hi, lo, H) & valid


def run_q(rows, tag):
    outs = []
    t0 = time.time()
    for i in range(nb):
        outs.append(q_only(rows, codes[i * B:(i + 1) * B]))
    np.asarray(outs[-1][:1, :1])
    dt = time.time() - t0
    print(f"{tag}: {dt:.3f}s total, {dt / nb * 1e3:.2f} ms/batch",
          flush=True)
    return dt


run(rows_b, "compile real")
run(ones, "compile ones")
run_q(rows_b, "compile qonly")
for _ in range(2):
    t_real = run(rows_b, "real filter  (query+sched+rounds)")
    t_ones = run(ones, "all-ones     (query+sched only)  ")
    t_q = run_q(rows_b, "query only   (all-window gather) ")
print(f"rounds-only estimate: {t_real - t_ones:.3f}s; "
      f"sched-only estimate: {t_ones - t_q:.3f}s", flush=True)
