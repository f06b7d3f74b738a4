"""Round-kernel-specific Mosaic probes (chipless AOT)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental import topologies

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
        msg = str(e).replace("\n", " | ")[:250]
        print(f"FAIL {name}: {msg}", flush=True)


C, NK, W = 128, 184, 8
R = 16384          # 8.4MB filter = 16384 x 128 u32


# 1. probe loop: 4096 iterations, dynamic sublane row load, vector accum
def k_probe(blk_ref, off_ref, filt_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    P = blk_ref.shape[0]            # [P, 128] padded probes (P rows)

    def body(i, acc):
        b = blk_ref[i, 0]
        row = filt_ref[pl.ds(jax.lax.shift_right_logical(b, 7), 1), :]
        w = jnp.sum(jnp.where(lane == (b & 127), row, 0))
        bit = jax.lax.shift_right_logical(w, off_ref[i, 0]) & 1
        srow = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        return jnp.where(srow == i, bit, acc)

    o_ref[:] = jax.lax.fori_loop(0, P, body,
                                 jnp.zeros((P, 1), jnp.int32))


probe("probe_loop_4096",
      lambda b, o, f: pl.pallas_call(
          k_probe,
          out_shape=jax.ShapeDtypeStruct((4096, 1), jnp.int32))(b, o, f),
      jax.ShapeDtypeStruct((4096, 1), jnp.int32),
      jax.ShapeDtypeStruct((4096, 1), jnp.int32),
      jax.ShapeDtypeStruct((R, 128), jnp.int32))


# 2. pallas call inside an XLA while loop body
def k_inc(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1


def while_with_kernel(x):
    def cond(st):
        return st[0] < 5

    def body(st):
        i, x = st
        y = pl.pallas_call(
            k_inc, out_shape=jax.ShapeDtypeStruct((C, NK), jnp.int32))(x)
        return i + 1, y

    return jax.lax.while_loop(cond, body, (jnp.int32(0), x))[1]


probe("pallas_in_while",
      while_with_kernel,
      jax.ShapeDtypeStruct((C, NK), jnp.int32))


# 3. per-row dynamic-position read via masked reduce (orig = work[b, p])
def k_posread(p_ref, x_ref, o_ref):
    i = jax.lax.broadcasted_iota(jnp.int32, x_ref.shape, 1)
    o_ref[:] = jnp.sum(jnp.where(i == p_ref[:], x_ref[:], 0), axis=1,
                       keepdims=True)


probe("perrow_position_read",
      lambda p, x: pl.pallas_call(
          k_posread, out_shape=jax.ShapeDtypeStruct((C, 1), jnp.int32))(p, x),
      jax.ShapeDtypeStruct((C, 1), jnp.int32),
      jax.ShapeDtypeStruct((C, NK), jnp.int32))


# 4. uint32 bit ops + shifts on [4C, k] shapes
def k_bits(x_ref, o_ref):
    x = x_ref[:].astype(jnp.uint32)
    y = (x << 2) | (x >> 30)
    o_ref[:] = (y & jnp.uint32(0xFFFF)).astype(jnp.int32)


probe("u32_bitops_4C_k",
      lambda x: pl.pallas_call(
          k_bits, out_shape=jax.ShapeDtypeStruct((4 * C, 32), jnp.int32))(x),
      jax.ShapeDtypeStruct((4 * C, 32), jnp.int32))


# 5. multiple outputs (planes, work, err, j) from one kernel
def k_multi(x_ref, o1_ref, o2_ref, o3_ref):
    o1_ref[:] = x_ref[:] + 1
    o2_ref[:] = x_ref[:, :32] * 2
    o3_ref[:] = jnp.min(x_ref[:], axis=1, keepdims=True)


probe("multi_output",
      lambda x: pl.pallas_call(
          k_multi,
          out_shape=[jax.ShapeDtypeStruct((5 * C, NK), jnp.int32),
                     jax.ShapeDtypeStruct((5 * C, 32), jnp.int32),
                     jax.ShapeDtypeStruct((5 * C, 1), jnp.int32)])(x),
      jax.ShapeDtypeStruct((5 * C, NK), jnp.int32))

print("done", file=sys.stderr)
