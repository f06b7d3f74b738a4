"""On-chip prototype + microbench: SORT-based dense Bloom build vs the
scatter insert path (pass-1/2 cost, ~0.75s each at the 400k bench).

Plan under test (bit-exact by construction — OR is OR):
  1. per-kmer block word index b [N] (u32 <= m/32) and 32-bit probe
     mask w [N]; dropped kmers get sentinel block m/32 (sorts last)
  2. sort by b (1 key) carrying w
  3. segmented OR along the sorted order (associative_scan on (b, w):
     (b1,w1)+(b2,w2) = (b2, b1==b2 ? w1|w2 : w2))
  4. dense extract: for each block q in [0, m/32): p = searchsorted(
     b_sorted, q, 'right')-1; word[q] = b_sorted[p]==q ? w_scan[p] : 0

Compares output bits against the scatter path and times each stage.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].reshape(-1)[:1].astype(jnp.float32)))


def timeit(label, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    sync(fn_j(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        sync(fn_j(*args))
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)
    return best


rng = np.random.default_rng(0)
N = 48_000_000
M_WORDS = 524_288                     # m/32 (m = 2^24 bits)

blocks = rng.integers(0, M_WORDS, N, dtype=np.uint32)
masks = rng.integers(1, 2**32, N, dtype=np.uint32)
keep = rng.random(N) < 0.85
b_dev = jnp.asarray(np.where(keep, blocks, M_WORDS).astype(np.uint32))
w_dev = jnp.asarray(np.where(keep, masks, 0).astype(np.uint32))
print("data staged", flush=True)


def seg_or_scan(bs, ws):
    """Segmented inclusive OR-scan along sorted blocks: manual
    Hillis-Steele (log2 N static-shift steps; associative_scan's
    recursive build took unbounded compile time at 48M)."""
    n = bs.shape[0]
    v = ws
    f = jnp.concatenate(
        [jnp.ones((1,), bool), bs[1:] != bs[:-1]])      # segment starts
    d = 1
    while d < n:
        pv = jnp.concatenate([jnp.zeros((d,), ws.dtype), v[:-d]])
        pf = jnp.concatenate([jnp.ones((d,), bool), f[:-d]])
        v = jnp.where(f, v, v | pv)
        f = f | pf
        d <<= 1
    return v


def build_sorted(b, w):
    bs, ws = jax.lax.sort((b, w), num_keys=1)
    wor = seg_or_scan(bs, ws)
    q = jnp.arange(M_WORDS, dtype=jnp.uint32)
    p = jnp.searchsorted(bs, q, side="right") - 1
    pc = jnp.clip(p, 0, N - 1)
    hitb = bs[pc] == q
    return jnp.where(hitb, wor[pc], 0)


def build_scatter(b, w):
    out = jnp.zeros(M_WORDS + 1, jnp.uint32)
    return out.at[b].max(w, mode="drop")[:M_WORDS]
    # NOTE max != OR for colliding masks; only for timing reference


# stage timings
timeit("sort 1key+payload 48M", lambda b, w: jax.lax.sort((b, w), num_keys=1),
       b_dev, w_dev)
bs, ws = jax.jit(lambda b, w: jax.lax.sort((b, w), num_keys=1))(
    b_dev, w_dev)
sync(bs)


timeit("segOR scan 48M", seg_or_scan, bs, ws)
timeit("searchsorted 524k in 48M", lambda bs: jnp.searchsorted(
    bs, jnp.arange(M_WORDS, dtype=jnp.uint32), side="right"), bs)
t_dense = timeit("dense build TOTAL", build_sorted, b_dev, w_dev)
t_scat = timeit("scatter-max build (timing ref)", build_scatter,
                b_dev, w_dev, reps=2)

# correctness vs a numpy OR reference on a SMALL slice
Ns = 2_000_000
bsm = jnp.asarray(blocks[:Ns].astype(np.uint32))
wsm = jnp.asarray(masks[:Ns].astype(np.uint32))
got = np.asarray(jax.jit(build_sorted)(bsm, wsm))
want = np.zeros(M_WORDS, np.uint32)
np.bitwise_or.at(want, blocks[:Ns], masks[:Ns])
print("dense build correct:", bool((got == want).all()), flush=True)
print(f"dense {t_dense*1e3:.0f} ms vs scatter {t_scat*1e3:.0f} ms",
      flush=True)
