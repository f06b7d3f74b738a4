"""On-chip microbench: TPU sort + scatter costs, to size the pass-1/2
insert-dedup design (VERDICT round-1 item 6).

Question: a global sort-dedup of all k-mers cuts insert scatter indices
~coverage-fold — but only pays if lax.sort at ~48M elements costs less
than the scatter time it saves (~14 ns/index serialized).

Timing: d2h scalar reads as sync (block_until_ready unreliable through
the axon relay, docs/KNOWN_ISSUES.md #2).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][:1].astype(
        jnp.float32)))


def timeit(label, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    sync(fn_j(*args))  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        sync(fn_j(*args))
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return best


rng = np.random.default_rng(0)
N = 48_000_000

hi = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
lo = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
print("data staged", flush=True)

timeit("sort u32 48M (1 key)", lambda a: jnp.sort(a), hi)
timeit("lax.sort 2xu32 48M (hi,lo keys)",
       lambda a, b: jax.lax.sort((a, b), num_keys=2), hi, lo)

# argsort (needed to carry a payload / original position)
timeit("argsort u32 48M", lambda a: jnp.argsort(a), hi)

# scatter cost vs index count: u8 row-scatter like bloom_insert_rows
M = 1 << 26
slots = jnp.zeros(M // 128 * 128, jnp.uint8).reshape(-1, 128)
row = jnp.ones((1, 128), jnp.uint8)
for cnt in (2_000_000, 8_000_000, 48_000_000):
    idx = jnp.asarray(rng.integers(0, M // 128, cnt, dtype=np.int32))
    rows = jnp.broadcast_to(row, (cnt, 128))
    timeit(f"row scatter-max {cnt//1_000_000}M idx",
           lambda s, i, r: s.at[i].max(r, mode="drop"),
           slots, idx, rows, reps=2)

# segment-OR alternative: sorted indices + manual OR-merge cost
timeit("cumsum u32 48M", lambda a: jnp.cumsum(a), hi)
print("done", flush=True)
