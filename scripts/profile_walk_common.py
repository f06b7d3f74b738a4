"""Shared filter/dataset builder for walk profiling scripts."""
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from kbbq_tpu.oracle.bloom import BloomParams
from kbbq_tpu.oracle.kmers import alpha_threshold
from kbbq_tpu.oracle.lighter import coverage_thresholds
from kbbq_tpu.oracle.pipeline import expected_bloom_keys
from kbbq_tpu.pipeline.recalibrate import RecalConfig
from kbbq_tpu.pipeline.resident import (_dense_finish, _pass1_kmers_slice,
                                        _pass2_dense)
from kbbq_tpu.utils.synth import make_arrays_fast


def build(error_rate, alpha_cov, N, L, K, H, B):
    arrays, _ = make_arrays_fast(genome_len=int(N * L / 50.0),
                                 read_len=L, num_reads=N,
                                 error_rate=error_rate, seed=0)
    codes = jnp.asarray(arrays.codes[:N])
    ids = jnp.arange(N, dtype=jnp.uint32)
    cfg = RecalConfig(k=K, coverage=50.0, batch_size=B, alpha=alpha_cov)
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
    return rows_b, codes
