"""Pass-3 JAX kernel: batched Lighter-style error inference (D7).

Bit-exact twin of oracle/lighter.py::infer_read_errors, reformulated for
SIMD hardware (SURVEY.md H2):

- The data-dependent walk is a `lax.while_loop` vmapped over the batch;
  every iteration evaluates all 4 substitution candidates at once (the
  original base's extension doubles as the "is this window trusted" check,
  letting trusted stretches advance up to k windows per iteration).
- Window k-mers are maintained as forward/RC uint32 lane arrays
  (kmer_lanes_batch) and **patched in place** on substitution: replacing
  the base at window offset d is two masked-OR ops at bit 2(k-1-d) of the
  forward word and bit 2d of the RC word — O(1) per affected window
  instead of O(k) re-rolling, which removed a 63-step sequential scan from
  every while iteration (~10x pass-3 speedup on TPU).
- The LEFT walk is the RIGHT walk run on the reverse complement: canonical
  k-mers are strand-invariant, so window trust is preserved under RC; the
  RC lane state is just the flipped (rc, fwd) lane pair — commits made by
  the right walk carry over for free.  The candidate tie-break order is
  reversed (RC code 3-c) to keep first-max tie-breaking identical to the
  oracle's ascending-original order.
- Windows containing N are skipped in one jump (to just past the last N in
  the window) — equivalent to the oracle's one-at-a-time skips, which never
  mark anything, but O(1) per N stretch.
- `infer_errors_compact` routes only reads that actually need the walk
  (untrusted window + anchor present) through the while-loop, compacted
  into power-of-two buckets: the while cost is (worst lane iterations) x
  (bucket width), and clean reads — the vast majority at realistic error
  rates — cost one vectorized query pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bloom import bloom_query
from .kmers import canonical_from_lanes, canonical_kmers_batch, \
    kmer_lanes_batch

_i32 = jnp.int32
_u32 = jnp.uint32


def _complement(x: jax.Array) -> jax.Array:
    """Base complement, N (4) fixed.  Arithmetic on purpose: a gather from
    a module-level constant table here makes the axon TPU plugin's MLIR
    lowering pathologically slow (>400s measured for this one op)."""
    return jnp.where(x < 4, 3 - x, x).astype(jnp.int8)


def _leading_true(x: jax.Array) -> jax.Array:
    """Count of leading True along the last axis (int32)."""
    return jnp.sum(jnp.cumprod(x.astype(_i32), axis=-1), axis=-1)


def _longest_run_anchor(trusted: jax.Array):
    """(a, b, has_anchor) of the longest True run; ties -> leftmost.

    trusted: bool [n].  Matches oracle _longest_true_run.
    """
    def step(run, t):
        nrun = jnp.where(t, run + 1, 0)
        return nrun, nrun

    _, runs = jax.lax.scan(step, jnp.int32(0), trusted)
    b = jnp.argmax(runs).astype(_i32)          # first max == leftmost run end
    ln = runs[b]
    a = b - ln + 1
    return a, b, ln > 0


def _patch_lanes(hi, lo, bitpos, val):
    """Set the 2-bit field at global bit `bitpos` (0..2k-2) to `val`.

    hi holds bits 32..2k-1, lo bits 0..31 (k<17: everything in lo).
    Shapes broadcast; all uint32.
    """
    in_hi = bitpos >= 32
    sh = jnp.where(in_hi, bitpos - 32, bitpos).astype(_u32)
    m = ~(_u32(3) << sh)
    nhi = (hi & m) | (val << sh)
    nlo = (lo & m) | (val << sh)
    return jnp.where(in_hi, nhi, hi), jnp.where(in_hi, lo, nlo)


def _walk(slots, work_pad, lanes, err, j0, k, num_hashes, n, L, rev_ties):
    """One directional walk (D7 step 4); left walk = this on RC (see module
    docstring).

    work_pad: int8 [L+2k] (positions >= L are N).
    lanes: (fhi, flo, rhi, rlo, valid) uint32x4+bool, each [n+k] (padded
      windows invalid).
    Returns (work_pad', lanes', err')."""

    # static-per-walk N geometry (substitutions never touch N bases)
    is_n = (work_pad == 4)
    nprefix = jnp.concatenate(
        [jnp.zeros(1, _i32), jnp.cumsum(is_n.astype(_i32))])

    def lastn_step(carry, xn):
        i, x = xn
        nc = jnp.where(x, i, carry)
        return nc, nc

    idxs = jnp.arange(work_pad.shape[0], dtype=_i32)
    _, last_n = jax.lax.scan(lastn_step, jnp.int32(-1), (idxs, is_n))

    cand = jnp.arange(4, dtype=_i32)                     # [4]
    t_vec = jnp.arange(k, dtype=_i32)                    # [k]
    bit_f = (2 * t_vec).astype(_i32)                     # fwd bit of subst
    bit_r = (2 * (k - 1 - t_vec)).astype(_i32)           # rc bit of subst

    def cond(st):
        return st[3] < n

    def body(st):
        work_pad, lanes, err, j = st
        fhi, flo, rhi, rlo, valid = lanes
        win_n = nprefix[j + k] - nprefix[j]
        has_n = win_n > 0
        j_skip = last_n[j + k - 1] + 1          # jump past the blocking N

        p = j + k - 1
        orig = work_pad[p].astype(_i32)

        # lane slices for windows j..j+k-1 (all contain base p)
        sl = lambda a: jax.lax.dynamic_slice(a, (j,), (k,))
        wf_hi, wf_lo = sl(fhi), sl(flo)
        wr_hi, wr_lo = sl(rhi), sl(rlo)
        wvalid = sl(valid)

        # patch base p with each candidate: [4, k] lanes
        cval = cand.astype(_u32)[:, None]
        pf_hi, pf_lo = _patch_lanes(wf_hi[None], wf_lo[None],
                                    bit_f[None], cval)
        pr_hi, pr_lo = _patch_lanes(wr_hi[None], wr_lo[None],
                                    bit_r[None], _u32(3) - cval)
        chi, clo = canonical_from_lanes(pf_hi, pf_lo, pr_hi, pr_lo)
        q = bloom_query(slots, chi, clo, num_hashes)
        q = q & wvalid[None] & (t_vec[None] < (n - j))
        ext = _leading_true(q)                            # int32 [4]

        e_orig = ext[orig]
        masked = jnp.where(cand == orig, jnp.int32(-1), ext)
        if rev_ties:   # RC walk: ties -> largest RC code == smallest original
            best_c = (3 - jnp.argmax(masked[::-1])).astype(_i32)
        else:
            best_c = jnp.argmax(masked).astype(_i32)
        best_ext = masked[best_c]

        trusted_here = e_orig >= 1
        fixable = best_ext >= 1
        mark = (~has_n) & (~trusted_here)
        commit = mark & fixable

        err = err.at[p].set(err[p] | (mark & (p < L)))
        new_base = jnp.where(commit, best_c, orig).astype(jnp.int8)
        work_pad = work_pad.at[p].set(new_base)

        # on commit, write the chosen candidate's patched lanes back
        upd = lambda a, pa: jax.lax.dynamic_update_slice(
            a, jnp.where(commit, pa[best_c], sl(a)), (j,))
        lanes = (upd(fhi, pf_hi), upd(flo, pf_lo),
                 upd(rhi, pr_hi), upd(rlo, pr_lo), valid)

        j_next = jnp.where(
            has_n, j_skip,
            jnp.where(trusted_here, j + e_orig,
                      jnp.where(fixable, j + best_ext, j + 1)))
        return (work_pad, lanes, err, j_next)

    work_pad, lanes, err, _ = jax.lax.while_loop(
        cond, body, (work_pad, lanes, err, j0))
    return work_pad, lanes, err


@functools.partial(jax.jit, static_argnames=("k", "num_hashes"))
def infer_errors_batch(slots: jax.Array, codes: jax.Array, k: int,
                       num_hashes: int) -> jax.Array:
    """Error mask per base for a batch (D7).

    Args:
      slots: uint8 [m] trusted-k-mer Bloom filter.
      codes: int8 [B, L] base codes (pads are 4).
    Returns: bool [B, L].
    """
    B, L = codes.shape
    n = L - k + 1

    fhi, flo, rhi, rlo, valid = kmer_lanes_batch(codes, k)
    hi, lo = canonical_from_lanes(fhi, flo, rhi, rlo)
    trusted0 = bloom_query(slots, hi, lo, num_hashes) & valid

    zpad = jnp.zeros((B, k), dtype=_u32)
    vpad = jnp.zeros((B, k), dtype=bool)
    pads = (jnp.concatenate([fhi, zpad], 1), jnp.concatenate([flo, zpad], 1),
            jnp.concatenate([rhi, zpad], 1), jnp.concatenate([rlo, zpad], 1),
            jnp.concatenate([valid, vpad], 1))

    def one(codes_1d, trusted_1d, valid_1d, fhi1, flo1, rhi1, rlo1, vv1):
        any_valid = valid_1d.any()
        all_tr = jnp.all(trusted_1d | ~valid_1d)
        a, b, has_anchor = _longest_run_anchor(trusted_1d)
        active = any_valid & ~all_tr & has_anchor

        pad = jnp.full(2 * k, 4, dtype=jnp.int8)
        work_pad = jnp.concatenate([codes_1d, pad])
        err = jnp.zeros(L, dtype=bool)
        lanes = (fhi1, flo1, rhi1, rlo1, vv1)

        # rightward walk from anchor end
        j0 = jnp.where(active, b + 1, n)
        work_pad, lanes, err = _walk(slots, work_pad, lanes, err, j0, k,
                                     num_hashes, n, L, rev_ties=False)

        # leftward walk == rightward walk on the reverse complement; the
        # RC lane state is the flipped (rc, fwd) pair, commits included
        fhi1, flo1, rhi1, rlo1, vv1 = lanes
        flip = lambda x: x[:n][::-1]
        rc_lanes = (jnp.concatenate([flip(rhi1), fhi1[n:]]),
                    jnp.concatenate([flip(rlo1), flo1[n:]]),
                    jnp.concatenate([flip(fhi1), rhi1[n:]]),
                    jnp.concatenate([flip(flo1), rlo1[n:]]),
                    jnp.concatenate([flip(vv1) & True,
                                     jnp.zeros(k, bool)]))
        rc = _complement(work_pad[:L])[::-1]
        rc_pad = jnp.concatenate([rc, pad])
        rc_err = jnp.zeros(L, dtype=bool)
        j0_rc = jnp.where(active, n - a, n)
        _, _, rc_err = _walk(slots, rc_pad, rc_lanes, rc_err, j0_rc, k,
                             num_hashes, n, L, rev_ties=True)
        return err | rc_err[::-1]

    return jax.vmap(one)(codes, trusted0, valid, *pads)


@functools.partial(jax.jit, static_argnames=("k", "num_hashes"))
def _active_mask(slots, codes, k, num_hashes):
    """Reads that need the walk: some valid window untrusted AND an anchor
    exists (otherwise the kernel marks nothing; D7 steps 2-3)."""
    hi, lo, valid = canonical_kmers_batch(codes, k)
    trusted0 = bloom_query(slots, hi, lo, num_hashes) & valid
    some_untrusted = jnp.any(~trusted0 & valid, axis=1)
    has_anchor = jnp.any(trusted0, axis=1)
    return some_untrusted & has_anchor


# Max lanes per walk dispatch.  Two reasons: (1) the while-loop costs
# (worst-lane iterations) x (width), and narrower chunks have fewer wasted
# lane-iterations; (2) the axon TPU backend MISCOMPILES the vmapped
# while-loop at large widths (first seen at width 1024: row results differ
# from the same rows at width <= 256 and from the CPU/oracle result —
# see docs/KNOWN_ISSUES.md for the repro).  256 is measured-correct.
WALK_CHUNK = 256


def infer_errors_chunked(slots, codes, k: int, num_hashes: int,
                         chunk: int = WALK_CHUNK) -> jax.Array:
    """infer_errors_batch dispatched in WALK_CHUNK-wide slices, fully
    asynchronous (no host sync): the right choice when dispatch/sync
    latency is high (the axon tunnel costs ~0.6s per round trip) and the
    walk kernel itself is fast.  Bit-identical to infer_errors_batch.
    """
    B, _ = codes.shape
    if B <= chunk:
        return infer_errors_batch(slots, codes, k, num_hashes)
    outs = [infer_errors_batch(slots, codes[s:s + chunk], k, num_hashes)
            for s in range(0, B, chunk)]
    return jnp.concatenate(outs, axis=0)


def infer_errors_compact(slots, codes, k: int, num_hashes: int,
                         min_bucket: int = 64) -> jax.Array:
    """infer_errors_batch with host-side compaction of active reads.

    Only reads that actually need the walk (some untrusted window + anchor
    present) are routed through the while-loop kernel, compacted into
    power-of-two buckets (bounding recompiles) and dispatched in chunks of
    WALK_CHUNK lanes.  Output is identical to infer_errors_batch (tests
    assert this).
    """
    B, L = codes.shape
    active = np.asarray(_active_mask(slots, codes, k, num_hashes))
    idx = np.nonzero(active)[0]
    errors = np.zeros((B, L), dtype=bool)
    if idx.size == 0:
        return jnp.asarray(errors)
    bucket = max(min_bucket,
                 min(WALK_CHUNK, 1 << int(idx.size - 1).bit_length()))
    pad = (-idx.size) % bucket
    pad_idx = np.concatenate([idx, np.zeros(pad, dtype=idx.dtype)])
    codes_j = jnp.asarray(codes)
    outs = []
    for s in range(0, pad_idx.size, bucket):
        sub = codes_j[jnp.asarray(pad_idx[s:s + bucket])]
        outs.append(np.asarray(
            infer_errors_batch(slots, sub, k, num_hashes)))
    sub_err = np.concatenate(outs, axis=0)
    errors[idx] = sub_err[:idx.size]
    return jnp.asarray(errors)
