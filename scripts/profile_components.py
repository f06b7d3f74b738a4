"""Direct on-chip timing of pass components (one process, async-dispatch
timing: n dispatches then one scalar d2h sync — block_until_ready is
unreliable through the axon tunnel, a d2h read is not)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbbq_tpu.ops.bloom import bloom_insert_rows, bloom_query_rows, bloom_rows
from kbbq_tpu.ops.covariate import accumulate_covariates, new_covariate_state
from kbbq_tpu.ops.inference import (_permute_rows_mxu, infer_errors_batch,
                                    infer_errors_scheduled)
from kbbq_tpu.ops.kmers import canonical_kmers_batch, kmer_lanes_batch
from kbbq_tpu.ops.trusted import trusted_mask_batch
from kbbq_tpu.oracle.lighter import coverage_thresholds

B, L, K, H = 8192, 150, 32, 7
M_BITS = 1 << 26          # bench-scale filter (2^26 bits)
rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, (B, L)), dtype=jnp.int8)
quals = jnp.asarray(rng.integers(2, 40, (B, L)), dtype=jnp.int8)
mask = jnp.ones((B, L), bool)
rgs = jnp.zeros(B, jnp.int32)
seconds = jnp.zeros(B, bool)
# realistic bit density: ~25% ones
slots = jnp.asarray(rng.random(M_BITS) < 0.25, dtype=jnp.uint8)
rows = bloom_rows(slots)
n = L - K + 1
t_table = jnp.asarray(coverage_thresholds(7.0 / 50.0, K), dtype=jnp.int32)


def timeit(name, fn, iters=20):
    r = fn()
    jax.tree.map(lambda a: np.asarray(jax.device_get(
        jnp.sum(a.astype(jnp.float32)) if hasattr(a, 'astype') else a)), r)
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    # one sync at the end: total = iters x device time (pipelined)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.time() - t0) / iters
    print(json.dumps({"op": name, "ms": round(dt * 1e3, 2)}), flush=True)
    return dt


hi, lo, valid = canonical_kmers_batch(codes, K)
timeit("canonical_kmers_batch", lambda: canonical_kmers_batch(codes, K))
timeit("kmer_lanes_batch", lambda: kmer_lanes_batch(codes, K))
timeit("bloom_query_rows_975k", lambda: bloom_query_rows(rows, hi, lo, H))
tr = bloom_query_rows(rows, hi, lo, H) & valid

nb = jnp.sum(valid & ~tr, axis=1)


@jax.jit
def permute3():
    order = jnp.argsort(nb)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    onehot = (col == order[:, None]).astype(jnp.bfloat16)
    sc = _permute_rows_mxu(onehot, codes)
    st = _permute_rows_mxu(onehot, tr)
    back = _permute_rows_mxu(onehot.T, st)
    return sc, back


timeit("argsort+onehot+3xpermute", permute3)


@jax.jit
def gather_permute():
    order = jnp.argsort(nb)
    sc = codes[order]
    st = tr[order]
    back = jnp.zeros_like(st).at[order].set(st)
    return sc, back


timeit("argsort+gather_permute(old)", gather_permute)

timeit("trusted_mask_batch", lambda: trusted_mask_batch(
    tr, valid, t_table, K, None))
timeit("bloom_insert_rows",
       lambda: bloom_insert_rows(jnp.zeros(M_BITS, jnp.uint8), hi, lo,
                                 valid, H), iters=5)
cov0 = new_covariate_state(1, L)
err0 = jnp.zeros((B, L), bool)
timeit("accumulate_covariates", lambda: accumulate_covariates(
    cov0, codes, quals, mask, rgs, seconds, err0))
timeit("walk_scheduled_full", lambda: infer_errors_scheduled(
    rows, codes, K, H, chunk=256), iters=5)
timeit("walk_batch_256", lambda: infer_errors_batch(
    rows, codes[:256], K, H), iters=5)
print("done", file=sys.stderr)
