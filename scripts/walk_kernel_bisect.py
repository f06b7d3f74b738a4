"""Bisect the pallas walk round kernel for the Mosaic CHECK crash.

Each stage compiles a progressively larger prefix of the round body in a
SUBPROCESS (the crash is a hard abort).
"""
import subprocess
import sys

STAGES = ["take", "patch", "probe", "resolve", "putback", "full"]

TEMPLATE = r'''
import functools, sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental import topologies
from kbbq_tpu.ops.kmers import canonical_from_lanes, kmer_hashes

STAGE = "%s"
_i32, _u32 = jnp.int32, jnp.uint32
C, k, n, W, NH = 128, 32, 119, 8, 7
nk = n + k
L = 150
Lw = L + 2 * k
R = (1 << 26) // 32 // 128
log2_m = 26


def _roll_left(a, shift, width):
    b = 1
    while b < width:
        r = jnp.roll(a, -b, axis=1)
        a = jnp.where((shift & b) != 0, r, a)
        b <<= 1
    return a


def kern(j_ref, work_ref, planes_ref, err_ref, filt_ref,
         oj_ref, owork_ref, oplanes_ref, oerr_ref, blk_ref):
    j = j_ref[:]
    active = j < n
    jc = jnp.minimum(j, n - 1)
    p = jc + k - 1
    iota_lw = jax.lax.broadcasted_iota(_i32, (C, Lw), 1)
    work = work_ref[:]
    orig = jnp.sum(jnp.where(iota_lw == p, work, 0), axis=1, keepdims=True)
    planes = planes_ref[:]
    shift6 = jnp.concatenate([jc] * 6, axis=0)
    win6 = _roll_left(planes, shift6, nk)[:, :k]
    wf_hi = win6[:C].astype(_u32)
    wf_lo = win6[C:2 * C].astype(_u32)
    wr_hi = win6[2 * C:3 * C].astype(_u32)
    wr_lo = win6[3 * C:4 * C].astype(_u32)
    old_te = win6[4 * C:5 * C] > 0
    wvalid = win6[5 * C:] > 0
    if STAGE == "take":
        oj_ref[:] = jc + orig * 0
        owork_ref[:] = work
        oplanes_ref[:] = planes
        oerr_ref[:] = err_ref[:] + win6[:C, :1] * 0
        blk_ref[:] = jnp.zeros((4 * C, W), _i32)
        return

    t_vec = jax.lax.broadcasted_iota(_i32, (1, k), 1)
    cand4 = jax.lax.broadcasted_iota(_i32, (4 * C, 1), 0) // C
    cval = cand4.astype(_u32)
    bit_f = (2 * t_vec).astype(_u32)
    bit_r = (2 * (k - 1 - t_vec)).astype(_u32)

    def patch(hi, lo, bitpos, val):
        in_hi = bitpos >= _u32(32)
        sh = jnp.where(in_hi, bitpos - _u32(32), bitpos)
        m = ~(_u32(3) << sh)
        nhi = (hi & m) | (val << sh)
        nlo = (lo & m) | (val << sh)
        return jnp.where(in_hi, nhi, hi), jnp.where(in_hi, lo, nlo)

    t4 = lambda a: jnp.concatenate([a] * 4, axis=0)
    pf_hi, pf_lo = patch(t4(wf_hi), t4(wf_lo), bit_f, cval)
    pr_hi, pr_lo = patch(t4(wr_hi), t4(wr_lo), bit_r, _u32(3) - cval)
    chi, clo = canonical_from_lanes(pf_hi, pf_lo, pr_hi, pr_lo)
    chi, clo = chi[:, :W], clo[:, :W]
    h1, h2 = kmer_hashes(chi, clo)
    block = (h1 & _u32((1 << (log2_m - 5)) - 1)).astype(_i32)
    blk_ref[:] = block
    if STAGE == "patch":
        oj_ref[:] = jc
        owork_ref[:] = work
        oplanes_ref[:] = planes
        oerr_ref[:] = err_ref[:] + block[:C, :1] * 0
        return

    lane128 = jax.lax.broadcasted_iota(_i32, (1, 128), 1)
    srow = jax.lax.broadcasted_iota(_i32, (4 * C, 1), 0)
    cols = []
    for w in range(W):
        def body(i, acc, w=w):
            b = blk_ref[i, w]
            row = filt_ref[pl.ds(jax.lax.shift_right_logical(b, 7), 1), :]
            word = jnp.sum(jnp.where(lane128 == (b & 127), row, 0))
            return jnp.where(srow == i, word, acc)
        cols.append(jax.lax.fori_loop(0, 4 * C, body,
                                      jnp.zeros((4 * C, 1), _i32)))
    words = jnp.concatenate(cols, axis=1).astype(_u32)
    hit = words == words
    for hj in range(NH):
        s = _u32((hj * 5) & 31)
        rot = (h2 >> s) | (h2 << ((_u32(32) - s) & _u32(31)))
        off = rot & _u32(31)
        hit = hit & (((words >> off) & _u32(1)) > 0)
    if STAGE == "probe":
        oj_ref[:] = jc
        owork_ref[:] = work
        oplanes_ref[:] = planes
        oerr_ref[:] = err_ref[:] + hit[:C, :1].astype(_i32) * 0
        return

    tw = t_vec[:, :W]
    q = hit & t4(wvalid[:, :W]) & (t4(jnp.broadcast_to(tw, (C, W)))
                                   < jnp.concatenate([n - jc] * 4, 0))
    run = q[:, :1].astype(_i32)
    ext = run
    for t in range(1, W):
        run = run * q[:, t:t + 1].astype(_i32)
        ext = ext + run
    exts = [ext[c * C:(c + 1) * C] for c in range(4)]
    e_orig = jnp.zeros((C, 1), _i32)
    for c in range(4):
        e_orig = jnp.where(orig == c, exts[c], e_orig)
    masked = [jnp.where(orig == c, -1, exts[c]) for c in range(4)]
    first = True
    best_c = jnp.zeros((C, 1), _i32)
    best_ext = jnp.zeros((C, 1), _i32)
    for c in range(3, -1, -1):
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
    if STAGE == "resolve":
        oj_ref[:] = chosen
        owork_ref[:] = work
        oplanes_ref[:] = planes
        oerr_ref[:] = err_ref[:]
        return

    def pick(stacked):
        out = jnp.zeros((C, stacked.shape[1]), stacked.dtype)
        for c in range(4):
            out = jnp.where(chosen == c, stacked[c * C:(c + 1) * C], out)
        return out

    nf_hi = jnp.where(commit, pick(pf_hi), wf_hi).astype(_i32)
    nf_lo = jnp.where(commit, pick(pf_lo), wf_lo).astype(_i32)
    nr_hi = jnp.where(commit, pick(pr_hi), wr_hi).astype(_i32)
    nr_lo = jnp.where(commit, pick(pr_lo), wr_lo).astype(_i32)
    q_ch = jnp.concatenate(
        [pick(q.astype(_i32)), jnp.zeros((C, k - W), _i32)], axis=1)
    idxs = jc + t_vec
    known = jnp.broadcast_to(t_vec < W, (C, k))
    old_te_i = old_te.astype(_i32)
    upd = jnp.where(known, q_ch, jnp.where(commit, 0, old_te_i))
    te_new = jnp.where(active & (idxs < n), upd, old_te_i)
    vals = jnp.concatenate([nf_hi, nf_lo, nr_hi, nr_lo, te_new], axis=0)
    pad = jnp.concatenate([vals, jnp.zeros((5 * C, nk - k), _i32)], axis=1)
    iota_nk = jax.lax.broadcasted_iota(_i32, (C, nk), 1)
    winmask = iota_nk < k
    back = jnp.where(jc == 0, 0, nk - jc)
    pad_r = _roll_left(pad, jnp.concatenate([back] * 5, axis=0), nk)
    mask_r = _roll_left(winmask.astype(_i32), back, nk) > 0
    mask5 = jnp.concatenate([mask_r] * 5, axis=0)
    new5 = jnp.where(mask5, pad_r, planes[:5 * C])
    oplanes_ref[:] = jnp.concatenate([new5, planes[5 * C:]], axis=0)
    if STAGE == "putback":
        oj_ref[:] = jc
        owork_ref[:] = work
        oerr_ref[:] = err_ref[:]
        return

    newb = jnp.where(commit, chosen, orig)
    at_p = iota_lw == p
    owork_ref[:] = jnp.where(at_p & active, newb, work)
    iota_l = jax.lax.broadcasted_iota(_i32, (C, L), 1)
    err = err_ref[:]
    oerr_ref[:] = jnp.where((iota_l == p) & mark, 1, err)
    adv = jnp.where(trusted_here, e_orig, jnp.where(fixable, best_ext, 1))
    x = jnp.where(active, jc + adv, n)
    teff_n = new5[4 * C:, :n] > 0
    validn = planes[5 * C:, :n] > 0
    iota_n = jax.lax.broadcasted_iota(_i32, (C, n), 1)
    brk = validn & (~teff_n) & (iota_n >= x)
    oj_ref[:] = jnp.min(jnp.where(brk, iota_n, n), axis=1, keepdims=True)


topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:1x1x1",
                                    chips_per_host_bounds=(1, 1, 1),
                                    num_slices=1)
from jax.sharding import Mesh, NamedSharding, PartitionSpec
mesh = Mesh(np.array(topo.devices).reshape(1,), ("d",))
sh = NamedSharding(mesh, PartitionSpec())
call = pl.pallas_call(
    kern,
    out_shape=[jax.ShapeDtypeStruct((C, 1), _i32),
               jax.ShapeDtypeStruct((C, Lw), _i32),
               jax.ShapeDtypeStruct((6 * C, nk), _i32),
               jax.ShapeDtypeStruct((C, L), _i32)],
    scratch_shapes=[pltpu.VMEM((4 * C, W), _i32)],
)
fn = lambda j, w, pl_, e, f: call(j, w, pl_, e, f)
shaped = [jax.ShapeDtypeStruct(s_, _i32, sharding=sh) for s_ in
          [(C, 1), (C, Lw), (6 * C, nk), (C, L), (R, 128)]]
jax.jit(fn).lower(*shaped).compile()
print("STAGE", STAGE, "OK")
'''

for stage in STAGES:
    code = TEMPLATE % stage
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600)
    if f"STAGE {stage} OK" in r.stdout:
        print(f"OK   {stage}", flush=True)
    else:
        tail = (r.stderr or r.stdout).strip().splitlines()[-6:]
        print(f"FAIL {stage}:", " | ".join(t[:100] for t in tail),
              flush=True)
