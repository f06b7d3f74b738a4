"""Pass-3 JAX kernel: covariate scatter-add accumulation (D8).

Twin: oracle/covariate.py::accumulate_read.  Counters are int32 on device
(a flush cycle caps events per device epoch well below 2^31; the pipeline
folds epochs into host int64 totals — exact, and sidesteps TPUs' lack of
int64).  Scatter-adds of +1 commute, so any sharding/batch order yields
identical tables (SURVEY.md H5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import (
    DINUC_INVALID,
    MIN_USABLE_Q,
    NUM_DINUC,
    NUM_Q,
)

_i32 = jnp.int32


def new_covariate_state(num_rg: int, max_len: int):
    """Zeroed device tables: dict of int32 arrays."""
    nc = 2 * max_len
    z = functools.partial(jnp.zeros, dtype=_i32)
    return {
        "cyc_total": z((num_rg, NUM_Q, nc)),
        "cyc_errors": z((num_rg, NUM_Q, nc)),
        "din_total": z((num_rg, NUM_Q, NUM_DINUC)),
        "din_errors": z((num_rg, NUM_Q, NUM_DINUC)),
    }


def base_covariates(codes: jax.Array, quals: jax.Array, mask: jax.Array,
                    seconds: jax.Array):
    """Per-base covariate indices for a batch.

    Args:
      codes: int8 [B, L]; quals: int8 [B, L]; mask: bool [B, L] real-base;
      seconds: bool [B] second-in-pair.
    Returns dict: skip [B,L] bool, q [B,L] i32, cyc [B,L] i32, din [B,L] i32.
    """
    B, L = codes.shape
    codes = codes.astype(_i32)
    quals = quals.astype(_i32)
    skip = (~mask) | (codes == 4) | (quals < MIN_USABLE_Q)
    q = jnp.clip(quals, 0, NUM_Q - 1)

    i = jax.lax.broadcasted_iota(_i32, (B, L), 1)
    cyc1 = i * 2            # (i+1-1)*2, read-1 lanes
    cyc2 = i * 2 + 1        # (i+1-1)*2+1, read-2 lanes
    cyc = jnp.where(seconds[:, None], cyc2, cyc1)

    prev = jnp.concatenate(
        [jnp.full((B, 1), 4, dtype=_i32), codes[:, :-1]], axis=1)
    din_ok = (prev != 4) & (codes != 4)
    din_ok = din_ok & (i > 0)
    din = jnp.where(din_ok, prev * 4 + codes, DINUC_INVALID)
    return {"skip": skip, "q": q, "cyc": cyc, "din": din}


@jax.jit
def accumulate_covariates(state: dict, codes: jax.Array, quals: jax.Array,
                          mask: jax.Array, rgs: jax.Array,
                          seconds: jax.Array, errors: jax.Array) -> dict:
    """Scatter one batch into the covariate tables.  state is donated by
    the pipeline's jit wrapper; all four tables are updated functionally.
    """
    cv = base_covariates(codes, quals, mask, seconds)
    use = ~cv["skip"]
    err = errors & use
    rg = rgs.astype(_i32)[:, None]

    nc = state["cyc_total"].shape[2]
    num_rg = state["cyc_total"].shape[0]

    # flat scatter indices; masked-out bases routed out of bounds + dropped
    cyc_flat = (rg * NUM_Q + cv["q"]) * nc + cv["cyc"]
    cyc_oob = jnp.int32(num_rg * NUM_Q * nc)
    cyc_idx = jnp.where(use, cyc_flat, cyc_oob).reshape(-1)

    din_ok = use & (cv["din"] != DINUC_INVALID)
    din_flat = (rg * NUM_Q + cv["q"]) * NUM_DINUC + cv["din"]
    din_oob = jnp.int32(num_rg * NUM_Q * NUM_DINUC)
    din_idx = jnp.where(din_ok, din_flat, din_oob).reshape(-1)

    one = jnp.ones_like(cyc_idx, dtype=_i32)
    errf = err.reshape(-1).astype(_i32)

    def scat(table, idx, val):
        shape = table.shape
        return (table.reshape(-1).at[idx].add(val, mode="drop")
                .reshape(shape))

    return {
        "cyc_total": scat(state["cyc_total"], cyc_idx, one),
        "cyc_errors": scat(state["cyc_errors"], cyc_idx, errf),
        "din_total": scat(state["din_total"], din_idx, one),
        "din_errors": scat(state["din_errors"], din_idx, errf),
    }
