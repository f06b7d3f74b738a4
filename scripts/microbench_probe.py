"""On-chip microbench: bulk Bloom probe strategies (round-2 VERDICT #1).

The two bulk query streams (pass-2 trusted query + pass-3 initial
all-window query, ~49M probes each at the 400k bench) ride XLA's
serialized gather.  This measures every candidate fetch engine:

  xla_word        packed[block] one-u32 gather + bit test (baseline)
  xla_full_query  ops/bloom.py::bloom_query_rows production twin
  xla_rowK        (M/K, K) row gather — per-INDEX cost vs payload width
  pallas_taa      ops/pallas_bloom.py take_along_axis dual gather
                  (Mosaic dynamic_gather is single-vreg along sublanes:
                  FAILS to compile for filters > 8 rows — recorded)
  pallas_scalar   filter pinned in VMEM, scalar fori fetch loop with
                  per-probe dynamic row load + lane select + row store
  pallas_dma      HBM filter, grouped ring of outstanding 512-B row
                  async copies (the round-2 pipelined-DMA hypothesis);
                  select=False variant times the DMA issue+wait alone

Measured 2026-08-19 on the v5e chip (8 MB filter, see PERF.md):
  xla_word 9.56 ns/probe | xla_row8 19.2 ns/idx | xla_row32 16.1 ns/idx
  pallas_scalar 155 ns | pallas_dma G16/NG4 88.6 ns (87.3 ns issue-only,
  90.7 at G32/NG8, 104 at G8/NG16) | pallas_taa: does not compile.
Conclusion: the DMA ring is ISSUE-RATE-bound on the scalar core
(~87 ns/descriptor); no ring depth fixes an issue-rate bound.  XLA's
serialized gather stands as the fastest random-word fetch.

Timing: one call at >=1M probes (>> relay noise), synced by a scalar
d2h read (block_until_ready unreliable through the axon relay).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from kbbq_tpu.ops.bloom import bloom_query_rows  # noqa: E402
from kbbq_tpu.ops.pallas_bloom import bloom_query_rows_pallas  # noqa: E402

_u32 = jnp.uint32


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1]
                         .astype(jnp.float32)))


def timeit(label, fn, *args, reps=3, n_probes=None):
    try:
        fn_j = jax.jit(fn)
        sync(fn_j(*args))  # compile
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            sync(fn_j(*args))
            best = min(best, time.time() - t0)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:200]
        print(f"{label} FAILED: {msg}", flush=True)
        return {"label": label, "error": msg}
    per = best / n_probes * 1e9
    print(f"{label}: {best*1e3:.1f} ms  ({per:.2f} ns/probe)", flush=True)
    return {"label": label, "ms": round(best * 1e3, 1),
            "ns_per_probe": round(per, 2)}


# ----------------------------------------------------------- datasets
LOG2_M = 26                       # 2^26 bits = 2^21 words = 8 MB packed
M = 1 << (LOG2_M - 5)
R = M // 128
N = 48_000_000
rng = np.random.default_rng(0)
packed = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint32))
block = jnp.asarray(rng.integers(0, M, N, dtype=np.int32))
h2 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
hi = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
lo = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
print(f"staged: filter {M*4>>20} MB, {N/1e6:.0f}M probes", flush=True)

results = []


# ------------------------------------------------------ XLA baselines
def xla_word(p, b, h):
    w = p[b]
    off = (h & _u32(31)).astype(_u32)
    return ((w >> off) & _u32(1)) > 0


results.append(timeit("xla_word", xla_word, packed, block, h2,
                      n_probes=N))
results.append(timeit("xla_full_query",
                      lambda p, a, b: bloom_query_rows(p, a, b, 4),
                      packed, hi, lo, n_probes=N))

# row gathers materialize [N, K] with the K minor dim padded to the
# 128-lane tile (docs/KNOWN_ISSUES.md #9) — cap N so the pad fits HBM
N_ROW = 2_000_000
for K in (8, 32):
    p2 = packed.reshape(M // K, K)
    r = block[:N_ROW] >> int(np.log2(K))
    results.append(timeit(f"xla_row{K}",
                          lambda p, rr: p[rr][:, 0], p2, r,
                          n_probes=N_ROW))

# ---------------------------------------------- pallas take_along_axis
# (expected: Mosaic "Multiple source vregs along gather dimension")
results.append(timeit("pallas_taa",
                      lambda p, a, b: bloom_query_rows_pallas(
                          p, a, b, 4, interpret=False),
                      packed, hi[:N_ROW], lo[:N_ROW], n_probes=N_ROW))


# ---------------------------------------------- pallas scalar VMEM loop
CHUNK = 2048


def _scalar_kernel(blk_ref, filt_ref, out_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    C = blk_ref.shape[0]

    def body(i, _):
        b = blk_ref[i, 0]
        row = filt_ref[pl.ds(jax.lax.shift_right_logical(b, 7), 1), :]
        w = jnp.sum(jnp.where(lane == (b & 127), row, 0), axis=1,
                    keepdims=True)
        out_ref[pl.ds(i, 1), :] = w
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def pallas_scalar(p, b):
    filt2d = p.reshape(R, 128).astype(jnp.int32)
    total = b.shape[0]
    return pl.pallas_call(
        _scalar_kernel,
        grid=(total // CHUNK,),
        in_specs=[pl.BlockSpec((CHUNK, 1), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK, 1), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, 1), jnp.int32),
    )(b.reshape(total, 1), filt2d)


N_SC = 2_000_000
results.append(timeit("pallas_scalar", pallas_scalar, packed,
                      block[:N_SC], n_probes=N_SC))


# --------------------------------------------------- pallas DMA ring
def make_dma(G, NG, do_select):
    """Grouped ring: G probes per vectorized-select group, NG groups of
    512-B row DMAs in flight."""
    def _k(blk_ref, filt_hbm, out_ref, scratch, sems):
        C = blk_ref.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, 128), 1)
        n_groups = C // G

        def mk(slot, g, j):
            return pltpu.make_async_copy(
                filt_hbm.at[pl.ds(jax.lax.shift_right_logical(
                    blk_ref[g * G + j, 0], 7), 1), :],
                scratch.at[slot, pl.ds(j, 1), :],
                sems.at[slot, j])

        for s in range(NG):
            for j in range(G):
                mk(s, s, j).start()

        def body(g, _):
            slot = jax.lax.rem(g, NG)
            for j in range(G):
                mk(slot, g, j).wait()
            if do_select:
                rows = scratch[slot]
                cols = blk_ref[pl.ds(g * G, G), :] & 127
                w = jnp.sum(jnp.where(lane == cols, rows, 0), axis=1,
                            keepdims=True)
                out_ref[pl.ds(g * G, G), :] = w
            else:
                out_ref[pl.ds(g * G, G), :] = scratch[slot][:, :1]

            @pl.when(g + NG < n_groups)
            def _s():
                for j in range(G):
                    mk(slot, g + NG, j).start()
            return 0

        jax.lax.fori_loop(0, n_groups, body, 0)

    def f(p, b):
        filt2d = p.reshape(R, 128).astype(jnp.int32)
        total = b.shape[0]
        return pl.pallas_call(
            _k, grid=(total // CHUNK,),
            in_specs=[pl.BlockSpec((CHUNK, 1), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((CHUNK, 1), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((total, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((NG, G, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA((NG, G))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(b.reshape(total, 1), filt2d)
    return f


N_DMA = 1_000_000
for (G, NG, sel) in [(16, 4, True), (16, 4, False), (32, 8, True),
                     (8, 16, True)]:
    results.append(timeit(f"pallas_dma G{G} NG{NG} select={sel}",
                          make_dma(G, NG, sel), packed, block[:N_DMA],
                          n_probes=N_DMA))

print(json.dumps({"device": str(jax.devices()[0]), "M_words": M,
                  "results": results}), flush=True)
