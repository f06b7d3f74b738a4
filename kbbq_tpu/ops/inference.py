"""Pass-3 JAX kernel: batched Lighter-style error inference (D7).

Bit-exact twin of oracle/lighter.py::infer_read_errors, reformulated for
SIMD hardware (SURVEY.md H2):

- The data-dependent walk is a `lax.while_loop` vmapped over the batch;
  every iteration evaluates all 4 substitution candidates at once (the
  original base's extension doubles as the "is this window trusted" check,
  letting trusted stretches advance up to k windows per iteration).
- The LEFT walk is the RIGHT walk run on the reverse complement: canonical
  k-mers are strand-invariant, so window trust is preserved under RC; the
  candidate tie-break order is reversed (RC code 3-c) to keep first-max
  tie-breaking identical to the oracle's ascending-original order.
- Windows containing N are skipped in one jump (to just past the last N in
  the window) — equivalent to the oracle's one-at-a-time skips, which never
  mark anything, but O(1) per N stretch (this also disposes of the padded
  tail of short reads in a single iteration).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bloom import bloom_query
from .kmers import canonical_kmers_batch

_i32 = jnp.int32


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


def _walk(slots, work_pad, err, j0, k, num_hashes, n, L, rev_ties):
    """One directional walk (D7 step 4); left walk = this on RC (see module
    docstring).  work_pad: int8 [L+2k] (positions >= L are N).  Returns
    (work_pad', err')."""

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

    cand = jnp.arange(4, dtype=jnp.int8)

    def cond(st):
        return st[2] < n

    def body(st):
        work_pad, err, j = st
        win_n = nprefix[j + k] - nprefix[j]
        has_n = win_n > 0
        j_skip = last_n[j + k - 1] + 1          # jump past the blocking N

        p = j + k - 1
        orig = work_pad[p]
        # segment covering windows j..j+k-1, with each candidate at p
        seg = jax.lax.dynamic_slice(work_pad, (j,), (2 * k - 1,))
        seg4 = jnp.broadcast_to(seg, (4, 2 * k - 1)).at[:, k - 1].set(cand)
        hi, lo, valid = canonical_kmers_batch(seg4, k)   # [4, k]
        q = bloom_query(slots, hi, lo, num_hashes) & valid
        # cap extension at the real window count n - j
        t = jax.lax.broadcasted_iota(_i32, (1, k), 1)
        q = q & (t < (n - j))
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
        new_base = jnp.where(commit, best_c.astype(jnp.int8), orig)
        work_pad = work_pad.at[p].set(new_base)
        j_next = jnp.where(
            has_n, j_skip,
            jnp.where(trusted_here, j + e_orig,
                      jnp.where(fixable, j + best_ext, j + 1)))
        return (work_pad, err, j_next)

    work_pad, err, _ = jax.lax.while_loop(cond, body, (work_pad, err, j0))
    return work_pad, err


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

    hi, lo, valid = canonical_kmers_batch(codes, k)
    trusted0 = bloom_query(slots, hi, lo, num_hashes) & valid

    def one(codes_1d, trusted_1d, valid_1d):
        any_valid = valid_1d.any()
        all_tr = jnp.all(trusted_1d | ~valid_1d)
        a, b, has_anchor = _longest_run_anchor(trusted_1d)
        active = any_valid & ~all_tr & has_anchor

        pad = jnp.full(2 * k, 4, dtype=jnp.int8)
        work_pad = jnp.concatenate([codes_1d, pad])
        err = jnp.zeros(L, dtype=bool)

        # rightward walk from anchor end
        j0 = jnp.where(active, b + 1, n)
        work_pad, err = _walk(slots, work_pad, err, j0, k, num_hashes, n, L,
                              rev_ties=False)

        # leftward walk == rightward walk on the reverse complement
        rc = _complement(work_pad[:L])[::-1]
        rc_pad = jnp.concatenate([rc, pad])
        rc_err = jnp.zeros(L, dtype=bool)
        j0_rc = jnp.where(active, n - a, n)
        _, rc_err = _walk(slots, rc_pad, rc_err, j0_rc, k, num_hashes, n, L,
                          rev_ties=True)
        return err | rc_err[::-1]

    return jax.vmap(one)(codes, trusted0, valid)
