"""Decompose the scheduled-walk PROLOGUE (profile_walk.py showed it at
~842ms/49 batches vs ~760ms of rounds): initial query, scheduling
(argsort + one-hot permutes), lane pack, stack + pre-roll, epilogue."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import functools
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kbbq_tpu.ops.bloom import bloom_query_rows
from kbbq_tpu.ops.inference import (_complement, _longest_run_anchors,
                                    _next_break, _permute_rows_mxu,
                                    _stack_walk_state, _i32, _u32)
from kbbq_tpu.ops.kmers import canonical_kmers_batch, kmer_lanes_batch
from scripts.profile_walk_common import build  # noqa

B, K, H, NB, L = 8192, 32, 7, 49, 150
N = NB * B


def timeit(name, fn, iters=3):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(json.dumps({"op": name, "ms_per_batch": round(dt * 1e3, 2),
                      "ms_49_batches": round(dt * 1e3 * NB, 0)}),
          flush=True)
    return out


rows, codes_all = build(0.005, None, N, L, K, H, B)
codes = codes_all[:B]
n = L - K + 1
nk = n + K

@jax.jit
def step1(codes):
    hi, lo, valid = canonical_kmers_batch(codes, K)
    tr = bloom_query_rows(rows, hi, lo, H) & valid
    return tr, valid

@jax.jit
def step2(codes, tr, valid):
    a, b, has_anchor = _longest_run_anchors(tr)
    active = valid.any(1) & ~jnp.all(tr | ~valid, 1) & has_anchor
    rc_codes = _complement(codes)[:, ::-1]
    tr_rc = tr[:, ::-1]
    valid_rc = valid[:, ::-1]
    j0_f = _next_break(tr, valid, jnp.where(active, b + 1, n), n)
    j0_r = _next_break(tr_rc, valid_rc, jnp.where(active, n - a, n), n)
    work2 = jnp.concatenate([codes, rc_codes], 0)
    teff2 = jnp.concatenate([tr, tr_rc], 0)
    j02 = jnp.concatenate([j0_f, j0_r], 0)
    iota_n = jax.lax.broadcasted_iota(_i32, (2 * B, n), 1)
    nb2 = jnp.sum(jnp.concatenate([valid, valid_rc], 0) & ~teff2
                  & (iota_n >= j02[:, None]), 1)
    key = jnp.where(j02 < n, nb2 + 1, 0)
    return work2, teff2, j02, key

@jax.jit
def step3_sortonehot(key):
    order = jnp.argsort(key)
    col = jax.lax.broadcasted_iota(jnp.int32, (2 * B, 2 * B), 1)
    return (col == order[:, None]).astype(jnp.bfloat16), order

@jax.jit
def step4_permutes(onehot, work2, teff2, j02, order):
    sw = _permute_rows_mxu(onehot, work2)
    st2 = _permute_rows_mxu(onehot, teff2)
    sj = jnp.take(j02, order)
    return sw, st2, sj

@jax.jit
def step5_lanes(sw):
    return kmer_lanes_batch(sw, K)

@jax.jit
def step6_stackroll(sw, lanes_s, st2, sj):
    zpadB = jnp.zeros((2 * B, K), dtype=_u32)
    fhi_s, flo_s, rhi_s, rlo_s, vv_s = lanes_s
    lanes_p = (jnp.concatenate([fhi_s, zpadB], 1),
               jnp.concatenate([flo_s, zpadB], 1),
               jnp.concatenate([rhi_s, zpadB], 1),
               jnp.concatenate([rlo_s, zpadB], 1),
               jnp.concatenate([vv_s, zpadB.astype(bool)], 1))
    return _stack_walk_state(sw, lanes_p, st2,
                             jnp.zeros((2 * B, L), bool), sj, K, n,
                             L).reshape(5, 2 * B, nk)

@jax.jit
def step7_epilogue(err_rolled, onehot):
    err_sorted = jnp.roll(err_rolled, n - 1, axis=1)[:, :L] > 0
    err2 = _permute_rows_mxu(onehot.T, err_sorted)
    return err2[:B] | err2[B:, ::-1]

tr, valid = timeit("1 query+canon", lambda: step1(codes))
work2, teff2, j02, key = timeit("2 anchors/j0/key",
                                lambda: step2(codes, tr, valid))
onehot, order = timeit("3 argsort+onehot", lambda: step3_sortonehot(key))
sw, st2, sj = timeit("4 mxu permutes",
                     lambda: step4_permutes(onehot, work2, teff2, j02,
                                            order))
lanes_s = timeit("5 lane pack", lambda: step5_lanes(sw))
st3 = timeit("6 stack+preroll",
             lambda: step6_stackroll(sw, lanes_s, st2, sj))
err_rolled = jnp.zeros((2 * B, nk), _u32)
timeit("7 epilogue", lambda: step7_epilogue(err_rolled, onehot))
