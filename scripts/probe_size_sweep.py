"""ns/probe of the serialized XLA word gather vs FILTER SIZE (round-3
VERDICT #2): the 9.56 ns floor was measured on an 8 MB filter; chr20/WGS
filters are 256 MB - 2 GB where HBM row locality collapses.  One
long-lived process, one >=48M-probe call per size."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 48_000_000
results = {}
for log2_m in (26, 28, 31, 33):
    M = 1 << (log2_m - 5)                 # u32 words
    packed = jnp.ones((M,), jnp.uint32)
    rng = np.random.default_rng(log2_m)
    blocks = jnp.asarray(rng.integers(0, M, N, dtype=np.int64)
                         .astype(np.int32))

    @jax.jit
    def q(p, b):
        return jnp.sum(p[b], dtype=jnp.uint32)

    np.asarray(q(packed, blocks))          # compile + warm
    best = 9e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(q(packed, blocks))
        best = min(best, time.time() - t0)
    ns = best / N * 1e9
    results[f"2^{log2_m} bits ({M * 4 >> 20} MB)"] = round(ns, 2)
    print(f"log2_m={log2_m} ({M * 4 >> 20:5d} MB packed): "
          f"{ns:.2f} ns/probe", flush=True)
    del packed, blocks
print(json.dumps(results))
