"""Price the per-batch k-mer hash + probe_words compute vs the query
gather on the real chip, to size the (blk, w) reuse win."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbbq_tpu.ops.kmers import canonical_kmers_batch
from kbbq_tpu.ops.bloom import probe_words, bloom_query_rows
from kbbq_tpu.utils.synth import make_arrays_fast

K, H, B, LOG2M = 32, 7, 8192, 26

arrays, _ = make_arrays_fast(genome_len=1_200_000, read_len=150,
                             num_reads=400_000, error_rate=0.005, seed=0)
nb = arrays.num_reads // B
codes = jnp.asarray(arrays.codes[:nb * B])
rows = jnp.zeros((1 << LOG2M) // 32, jnp.uint32)
print("data ready", flush=True)


@jax.jit
def f_kmers(c):
    hi, lo, valid = canonical_kmers_batch(c, K)
    return hi ^ lo ^ valid.astype(jnp.uint32)      # force materialize


@jax.jit
def f_pw(c):
    hi, lo, valid = canonical_kmers_batch(c, K)
    blk, w = probe_words(hi, lo, H, LOG2M)
    return blk ^ w.astype(jnp.int32)


@jax.jit
def f_query(c):
    hi, lo, valid = canonical_kmers_batch(c, K)
    return bloom_query_rows(rows, hi, lo, H) & valid


@jax.jit
def f_query_cached(blk, w):
    return (rows[blk] & w) == w


@jax.jit
def f_pw_out(c):
    hi, lo, valid = canonical_kmers_batch(c, K)
    blk, w = probe_words(hi, lo, H, LOG2M)
    return blk, jnp.where(valid, w, ~jnp.uint32(0))


def run(fn, args_of, tag):
    outs = [fn(*args_of(i)) for i in range(nb)]
    o = outs[-1]
    o = o[0] if isinstance(o, tuple) else o
    np.asarray(o[:1, :1])
    t0 = time.time()
    outs = [fn(*args_of(i)) for i in range(nb)]
    o = outs[-1]
    o = o[0] if isinstance(o, tuple) else o
    np.asarray(o[:1, :1])
    dt = time.time() - t0
    print(f"{tag}: {dt:.3f}s total, {dt / nb * 1e3:.2f} ms/batch",
          flush=True)
    return outs


sl = lambda i: (codes[i * B:(i + 1) * B],)
run(f_kmers, sl, "canonical_kmers only     ")
run(f_pw, sl, "kmers + probe_words      ")
run(f_query, sl, "kmers + query gather     ")
pw = run(f_pw_out, sl, "kmers + pw (materialized)")
blks = [p[0] for p in pw]
wss = [p[1] for p in pw]
run(f_query_cached, lambda i: (blks[i], wss[i]),
    "cached (blk,w) query     ")
