"""Chipless AOT probes of Mosaic constructs the Pallas walk kernel needs.

Compiles tiny kernels against the v5e topology (no chip claim) and
reports pass/fail per construct.
"""
import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental import topologies
from jax.experimental.pallas import tpu as pltpu

topo = topologies.get_topology_desc(
    platform="tpu", topology_name="v5e:1x1x1",
    chips_per_host_bounds=(1, 1, 1), num_slices=1)


def compile_for(fn, *avals):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    mesh = Mesh(np.array(topo.devices).reshape(1,), ("d",))
    s = NamedSharding(mesh, PartitionSpec())
    shaped = [jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s)
              for a in avals]
    return jax.jit(fn).lower(*shaped).compile()


def probe(name, fn, *avals):
    try:
        compile_for(fn, *avals)
        print(f"OK   {name}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"FAIL {name}: {msg}", flush=True)


B, NK = 128, 184


# 1. while_loop with vector state + scalar any() cond
def k_while(x_ref, o_ref):
    def cond(st):
        j, x = st
        return jnp.any(j < 10)

    def body(st):
        j, x = st
        return j + 1, x + 1

    j0 = jnp.zeros((B, 1), jnp.int32)
    _, x = jax.lax.while_loop(cond, body, (j0, x_ref[:]))
    o_ref[:] = x


probe("while_vector_state",
      lambda x: pl.pallas_call(
          k_while, out_shape=jax.ShapeDtypeStruct((B, NK), jnp.int32))(x),
      jax.ShapeDtypeStruct((B, NK), jnp.int32))


# 2. static jnp.roll along lanes
def k_roll(x_ref, o_ref):
    o_ref[:] = jnp.roll(x_ref[:], -3, axis=1)


probe("static_roll_lanes",
      lambda x: pl.pallas_call(
          k_roll, out_shape=jax.ShapeDtypeStruct((B, NK), jnp.int32))(x),
      jax.ShapeDtypeStruct((B, NK), jnp.int32))


# 3. barrel shift: masked static rolls by powers of two
def k_barrel(x_ref, s_ref, o_ref):
    x = x_ref[:]
    sh = s_ref[:]
    b = 1
    while b < NK:
        r = jnp.roll(x, -b, axis=1)
        x = jnp.where((sh & b) != 0, r, x)
        b <<= 1
    o_ref[:] = x


probe("barrel_shift",
      lambda x, s: pl.pallas_call(
          k_barrel, out_shape=jax.ShapeDtypeStruct((B, NK), jnp.int32))(x, s),
      jax.ShapeDtypeStruct((B, NK), jnp.int32),
      jax.ShapeDtypeStruct((B, 1), jnp.int32))


# 4. per-probe dynamic row load in a fori_loop (the filter probe)
R = 1024


def k_probe(idx_ref, filt_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, acc):
        r = idx_ref[i, 0]
        row = filt_ref[pl.ds(r, 1), :]           # dynamic sublane start
        col = idx_ref[i, 1]
        w = jnp.sum(jnp.where(lane == col, row, 0))
        return acc + w

    o_ref[0, 0] = jax.lax.fori_loop(0, B, body, jnp.int32(0))


probe("fori_dynamic_row_load",
      lambda idx, f: pl.pallas_call(
          k_probe, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32))(idx, f),
      jax.ShapeDtypeStruct((B, 2), jnp.int32),
      jax.ShapeDtypeStruct((R, 128), jnp.int32))


# 5. vectorized probe: dynamic_gather rows for a SMALL (<=8x128?) table
def k_gather_small(idx_ref, filt_ref, o_ref):
    S = idx_ref.shape[0]
    rowidx = jnp.broadcast_to(idx_ref[:, :1], (S, 128))
    rows = jnp.take_along_axis(filt_ref[:], rowidx, axis=0)
    o_ref[:] = rows


probe("take_along_axis_rows_1024",
      lambda idx, f: pl.pallas_call(
          k_gather_small,
          out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32))(idx, f),
      jax.ShapeDtypeStruct((R, 2), jnp.int32),
      jax.ShapeDtypeStruct((R, 128), jnp.int32))


# 6. int8 vector ops + where
def k_i8(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.where(x > 2, x, jnp.int8(4))


probe("int8_ops",
      lambda x: pl.pallas_call(
          k_i8, out_shape=jax.ShapeDtypeStruct((B, NK), jnp.int8))(x),
      jax.ShapeDtypeStruct((B, NK), jnp.int8))


# 7. cummax / argmax / take_along_axis small (anchor math)
def k_anchor(x_ref, o_ref):
    t = x_ref[:] > 0
    i = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    lf = jax.lax.cummax(jnp.where(t, -1, i), axis=1)
    runs = jnp.where(t, i - lf, 0)
    b = jnp.argmax(runs, axis=1).astype(jnp.int32)
    o_ref[:] = b[:, None]


probe("cummax_argmax",
      lambda x: pl.pallas_call(
          k_anchor, out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32))(x),
      jax.ShapeDtypeStruct((B, NK), jnp.int32))


# 8. scalar-prefetch/SMEM cursor + vector select write at [arange==p]
def k_scatter1(p_ref, x_ref, o_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, x_ref.shape, 1)
    o_ref[:] = jnp.where(i == p_ref[:], x_ref[:] + 1, x_ref[:])


probe("perrow_position_select",
      lambda p, x: pl.pallas_call(
          k_scatter1, out_shape=jax.ShapeDtypeStruct((B, NK), jnp.int32))(p, x),
      jax.ShapeDtypeStruct((B, 1), jnp.int32),
      jax.ShapeDtypeStruct((B, NK), jnp.int32))

print("probes done", file=sys.stderr)
