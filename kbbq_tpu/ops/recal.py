"""Pass-4 JAX kernel: recalibrated quality assignment (D10).

"The final per-base recalibrated quality assignment is a pure gather over
the merged empirical-quality tables" (BASELINE.json north star): all float
delta math happens on host in float64 (oracle/gatk.py), producing a dense
int8 table Q'[rg, q, cycle_idx, dinuc(17)]; the device does one integer
gather per base.  Twin: oracle/pipeline.py pass 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .covariate import base_covariates

_i32 = jnp.int32


@jax.jit
def apply_recal_table(recal: jax.Array, codes: jax.Array, quals: jax.Array,
                      mask: jax.Array, rgs: jax.Array,
                      seconds: jax.Array) -> jax.Array:
    """New per-base qualities: int8 [B, L].

    recal: int8 [num_rg, NUM_Q, 2*max_len, 17]; skipped bases keep their
    original reported quality.
    """
    cv = base_covariates(codes, quals, mask, seconds)
    rg = rgs.astype(_i32)[:, None]
    din = cv["din"]  # DINUC_INVALID (=16) indexes the zero-delta column
    # one flattened-index gather per base, fenced so the (serialized) TPU
    # gather loop doesn't swallow the index math / output select (see
    # ops/bloom.py::bloom_query_rows)
    nrg, nq, nc, nd = recal.shape
    flat = ((rg * nq + cv["q"]) * nc + cv["cyc"]) * nd + din
    flat = jax.lax.optimization_barrier(flat)
    out = recal.reshape(-1)[flat]
    out = jax.lax.optimization_barrier(out)
    return jnp.where(cv["skip"], quals, out).astype(jnp.int8)
