"""Pallas TPU kernel: one walk ROUND for a chunk, filter pinned in VMEM.

Round-2 on-chip attribution (docs/PERF.md): pass 3 is ~all walk rounds,
and a round at width 128 costs ~0.5-0.7 ms under XLA — dominated by
per-op overhead across the ~100 small ops of the round body, not by
arithmetic.  This kernel runs the ENTIRE round body (window take,
candidate patching, Bloom probes, resolution, put-back, cursor advance)
as ONE Mosaic program; the XLA `lax.while_loop` stays outside (cond =
any lane active), calling the kernel once per round.

Probe strategy: Mosaic's dynamic_gather cannot index a filter-sized
table (single-source-vreg limit, pinned by tests/test_aot_tpu.py), so
the packed filter lives in VMEM as [R, 128] words and a scalar
`fori_loop` fetches each probe's row by dynamic sublane index (4C*1
loads per round, one per candidate window); the bit tests then run
vectorized.  All state is int32 (Mosaic rejects int8 compares); int<->
uint casts are value-mod-2^32, i.e. bit-identical.

Bit-exact twin of ops/inference.py::_walk_rounds' body — every op
mirrors the stacked-plane XLA version, and tests compare the two paths
bit-for-bit (interpret mode on CPU, AOT-compile gate for v5e).
Reference analog: the fix-one walk of pub:src/kbbq/bloom.cc (SURVEY.md
§3.1 C3; mount empty, §0).

MEASURED OUTCOME (on-chip, 400k-read bench, 2026-08-17): pass 3 ran
50.4s with this kernel vs 3.3s for the XLA stacked-plane walk — 15x
SLOWER, parity true.  The scalar `fori_loop` probe fetch (4C*W = 4096
serialized [1,128]-row loads + lane-mask reductions per round) costs
far more under Mosaic than the whole XLA round body.  Kept as an
opt-in (`KBBQ_PALLAS=1` / `use_pallas=True`) because it pins the only
Mosaic-legal formulation found for a VMEM-resident filter walk; do not
enable it for production runs until the probe fetch is rewritten
(needs a vectorized multi-vreg gather Mosaic does not currently offer
— tests/test_aot_tpu.py::test_pallas_probe_mosaic_limitation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kmers import canonical_from_lanes, kmer_hashes

_i32 = jnp.int32
_u32 = jnp.uint32


def _roll_left(a, shift, width):
    """Barrel circular left-roll of [G, width] by per-row [G, 1] shift."""
    b = 1
    while b < width:
        r = jnp.roll(a, -b, axis=1)
        a = jnp.where((shift & b) != 0, r, a)
        b <<= 1
    return a


def _round_kernel(j_ref, work_ref, planes_ref, err_ref, filt_ref,
                  oj_ref, owork_ref, oplanes_ref, oerr_ref, blk_ref,
                  *, k, n, W, C, nk, Lw, L, rev_ties, num_hashes,
                  log2_m):
    j = j_ref[:]                                     # [C, 1]
    active = j < n
    jc = jnp.minimum(j, n - 1)
    p = jc + k - 1

    iota_lw = jax.lax.broadcasted_iota(_i32, (C, Lw), 1)
    work = work_ref[:]
    orig = jnp.sum(jnp.where(iota_lw == p, work, 0), axis=1,
                   keepdims=True)                    # [C, 1]

    # ---- window take: ONE barrel roll of all six planes (kept full
    # width: the put-back is "update cols [0, k) of the rolled view,
    # roll back" — a pure permutation, no masked scatter)
    planes = planes_ref[:]                           # [6C, nk]
    shift6 = jnp.concatenate([jc] * 6, axis=0)
    rolled6 = _roll_left(planes, shift6, nk)         # [6C, nk]
    win6 = rolled6[:, :k]                            # [6C, k]
    wf_hi = win6[:C].astype(_u32)
    wf_lo = win6[C:2 * C].astype(_u32)
    wr_hi = win6[2 * C:3 * C].astype(_u32)
    wr_lo = win6[3 * C:4 * C].astype(_u32)
    old_te = win6[4 * C:5 * C] > 0                   # [C, k]
    wvalid = win6[5 * C:] > 0

    # ---- candidate patching on [4C, k] (candidate axis stacked as rows)
    t_vec = jax.lax.broadcasted_iota(_i32, (1, k), 1)
    cand4 = jax.lax.broadcasted_iota(_i32, (4 * C, 1), 0) // C  # 0..3
    cval = cand4.astype(_u32)
    bit_f = (2 * t_vec).astype(_u32)                 # [1, k]
    bit_r = (2 * (k - 1 - t_vec)).astype(_u32)

    def patch(hi, lo, bitpos, val):
        in_hi = bitpos >= _u32(32)
        sh = jnp.where(in_hi, bitpos - _u32(32), bitpos)
        m = ~(_u32(3) << sh)
        nhi = (hi & m) | (val << sh)
        nlo = (lo & m) | (val << sh)
        return jnp.where(in_hi, nhi, hi), jnp.where(in_hi, lo, nlo)

    t4 = lambda a: jnp.concatenate([a] * 4, axis=0)  # [C,k] -> [4C,k]
    pf_hi, pf_lo = patch(t4(wf_hi), t4(wf_lo), bit_f, cval)
    pr_hi, pr_lo = patch(t4(wr_hi), t4(wr_lo), bit_r, _u32(3) - cval)
    chi, clo = canonical_from_lanes(pf_hi, pf_lo, pr_hi, pr_lo)
    chi, clo = chi[:, :W], clo[:, :W]                # [4C, W]

    # ---- probes: word index per candidate window; scalar gather loop
    h1, h2 = kmer_hashes(chi, clo)
    block = (h1 & _u32((1 << (log2_m - 5)) - 1)).astype(_i32)
    blk_ref[:] = block                               # stage for scalar reads
    lane128 = jax.lax.broadcasted_iota(_i32, (1, 128), 1)
    srow = jax.lax.broadcasted_iota(_i32, (4 * C, 1), 0)

    cols = []
    for w in range(W):
        def body(i, acc, w=w):
            b = blk_ref[i, w]
            row = filt_ref[pl.ds(jax.lax.shift_right_logical(b, 7), 1), :]
            word = jnp.sum(jnp.where(lane128 == (b & 127), row, 0))
            return jnp.where(srow == i, word, acc)

        cols.append(jax.lax.fori_loop(
            0, 4 * C, body, jnp.zeros((4 * C, 1), _i32)))
    words = jnp.concatenate(cols, axis=1).astype(_u32)   # [4C, W]

    hit = words == words                              # all-True [4C, W]
    for hj in range(num_hashes):
        s = _u32((hj * 5) & 31)
        rot = (h2 >> s) | (h2 << ((_u32(32) - s) & _u32(31)))
        off = rot & _u32(31)
        hit = hit & (((words >> off) & _u32(1)) > 0)

    # ---- validity + extent masking, leading-true extension lengths
    tw = t_vec[:, :W]                                 # [1, W]
    q = hit & t4(wvalid[:, :W]) & (t4(jnp.broadcast_to(tw, (C, W)))
                                   < jnp.concatenate([n - jc] * 4, 0))
    run = q[:, :1].astype(_i32)
    ext = run
    for t in range(1, W):
        run = run * q[:, t:t + 1].astype(_i32)
        ext = ext + run                               # [4C, 1]

    # ---- per-candidate resolution (group c = rows [cC, (c+1)C))
    exts = [ext[c * C:(c + 1) * C] for c in range(4)]
    e_orig = jnp.zeros((C, 1), _i32)
    for c in range(4):
        e_orig = jnp.where(orig == c, exts[c], e_orig)
    masked = [jnp.where(orig == c, -1, exts[c]) for c in range(4)]
    # argmax with the oracle's tie order: fwd ties -> smallest cand;
    # rc ties -> largest cand
    order = range(3, -1, -1) if not rev_ties else range(4)
    first = True
    best_c = jnp.zeros((C, 1), _i32)
    best_ext = jnp.zeros((C, 1), _i32)
    for c in order:
        if first:
            best_c = jnp.full((C, 1), c, _i32)
            best_ext = masked[c]
            first = False
        else:
            take = masked[c] >= best_ext
            best_c = jnp.where(take, c, best_c)
            best_ext = jnp.where(take, masked[c], best_ext)

    trusted_here = e_orig >= 1
    fixable = best_ext >= 1
    mark = active & ~trusted_here
    commit = mark & fixable
    chosen = jnp.where(commit, best_c, orig)

    # ---- chosen candidate's patched window planes ([C, k] each)
    def pick(stacked):
        out = jnp.zeros((C, stacked.shape[1]), stacked.dtype)
        for c in range(4):
            out = jnp.where(chosen == c, stacked[c * C:(c + 1) * C], out)
        return out

    nf_hi = jnp.where(commit, pick(pf_hi), wf_hi).astype(_i32)
    nf_lo = jnp.where(commit, pick(pf_lo), wf_lo).astype(_i32)
    nr_hi = jnp.where(commit, pick(pr_hi), wr_hi).astype(_i32)
    nr_lo = jnp.where(commit, pick(pr_lo), wr_lo).astype(_i32)

    # ---- effective-trust update for the k window slots
    q_ch = pick(q.astype(_i32)) if W == k else jnp.concatenate(
        [pick(q.astype(_i32)), jnp.zeros((C, k - W), _i32)], axis=1)
    idxs = jc + t_vec                                 # [C, k]
    known = jnp.broadcast_to(t_vec < W, (C, k))
    old_te_i = old_te.astype(_i32)
    upd = jnp.where(known, q_ch, jnp.where(commit, 0, old_te_i))
    te_new = jnp.where(active & (idxs < n), upd, old_te_i)

    # ---- put-back: splice updated window cols into the ROLLED view,
    # roll back (pure permutation — Mosaic's masked-put form crashed
    # its compiler; this is also one roll cheaper)
    vals = jnp.concatenate([nf_hi, nf_lo, nr_hi, nr_lo, te_new], axis=0)
    upd5 = jnp.concatenate([vals, rolled6[:5 * C, k:]], axis=1)
    back = jnp.where(jc == 0, 0, nk - jc)
    new5 = _roll_left(upd5, jnp.concatenate([back] * 5, axis=0), nk)
    oplanes_ref[:] = jnp.concatenate([new5, planes[5 * C:]], axis=0)

    # ---- sequence + error mask + cursor
    newb = jnp.where(commit, chosen, orig)
    at_p = iota_lw == p
    owork_ref[:] = jnp.where(at_p & active, newb, work)
    iota_l = jax.lax.broadcasted_iota(_i32, (C, L), 1)
    err = err_ref[:]
    oerr_ref[:] = jnp.where((iota_l == p) & mark, 1, err)

    adv = jnp.where(trusted_here, e_orig,
                    jnp.where(fixable, best_ext, 1))
    x = jnp.where(active, jc + adv, n)
    teff_n = new5[4 * C:, :n] > 0
    validn = planes[5 * C:, :n] > 0
    iota_n = jax.lax.broadcasted_iota(_i32, (C, n), 1)
    brk = validn & (~teff_n) & (iota_n >= x)
    oj_ref[:] = jnp.min(jnp.where(brk, iota_n, n), axis=1, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("k", "n", "W", "L", "rev_ties",
                                    "num_hashes", "interpret"))
def walk_rounds_pallas(filt2d, j0, work, planes, err, *, k, n, W, L,
                       rev_ties, num_hashes, interpret=False):
    """All rounds of one directional walk, one Pallas call per round.

    filt2d: int32 [R, 128] packed filter rows (R*128 >= m/32, padded);
    j0 [C, 1]; work [C, L+2k]; planes [6C, n+k] (fhi|flo|rhi|rlo|teff|
    valid); err [C, L] — all int32.  Returns (work, planes, err).
    """
    C = j0.shape[0]
    nk = planes.shape[1]
    Lw = work.shape[1]
    log2_m = int(filt2d.shape[0] * 128 * 32).bit_length() - 1

    kern = functools.partial(
        _round_kernel, k=k, n=n, W=W, C=C, nk=nk, Lw=Lw, L=L,
        rev_ties=rev_ties, num_hashes=num_hashes, log2_m=log2_m)
    call = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((C, 1), _i32),
                   jax.ShapeDtypeStruct((C, Lw), _i32),
                   jax.ShapeDtypeStruct((6 * C, nk), _i32),
                   jax.ShapeDtypeStruct((C, L), _i32)],
        scratch_shapes=[pltpu.VMEM((4 * C, W), _i32)],
        interpret=interpret,
    )

    def cond(st):
        return jnp.any(st[0] < n)

    def body(st):
        j, work, planes, err = st
        return tuple(call(j, work, planes, err, filt2d))

    _, work, planes, err = jax.lax.while_loop(
        cond, body, (j0, work, planes, err))
    return work, planes, err
