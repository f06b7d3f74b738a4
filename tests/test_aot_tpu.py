"""Chipless TPU AOT compile gate.

jax.experimental.topologies + the local libtpu can compile programs for a
v5e target WITHOUT claiming a chip (AOT, "chipless").  The axon relay
surfaces backend compile failures as opaque HTTP 500s, so this is the
only fast way to catch "lowers on CPU but Mosaic/XLA-TPU rejects it"
regressions — exactly what bit round 2's Pallas probe kernel.

Requires libtpu (present on this machine); skips cleanly elsewhere.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

topologies = pytest.importorskip("jax.experimental.topologies")


@pytest.fixture(scope="module")
def v5e():
    try:
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:1x1x1",
            chips_per_host_bounds=(1, 1, 1), num_slices=1)
    except Exception as e:  # no libtpu / unsupported
        pytest.skip(f"no chipless TPU AOT available: {e}")
    return topo


def _compile(topo, fn, *avals):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    mesh = Mesh(np.array(topo.devices).reshape(1,), ("d",))
    s = NamedSharding(mesh, PartitionSpec())
    shaped = [jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s)
              for a in avals]
    return jax.jit(fn).lower(*shaped).compile()


def test_bloom_query_insert_compile(v5e):
    from kbbq_tpu.ops.bloom import (bloom_insert, bloom_insert_rows,
                                    bloom_query_rows)

    NQ, M = 1 << 16, 1 << 22
    _compile(v5e, functools.partial(bloom_query_rows, num_hashes=7),
             jax.ShapeDtypeStruct((M // 32,), jnp.uint32),
             jax.ShapeDtypeStruct((NQ,), jnp.uint32),
             jax.ShapeDtypeStruct((NQ,), jnp.uint32))
    for ins in (bloom_insert, bloom_insert_rows):
        _compile(v5e,
                 lambda s, h, l, m, _f=ins: _f(s, h, l, m, 7),
                 jax.ShapeDtypeStruct((M,), jnp.uint8),
                 jax.ShapeDtypeStruct((NQ,), jnp.uint32),
                 jax.ShapeDtypeStruct((NQ,), jnp.uint32),
                 jax.ShapeDtypeStruct((NQ,), jnp.bool_))


def test_walk_compile(v5e):
    from kbbq_tpu.ops.inference import infer_errors_batch

    _compile(v5e,
             functools.partial(infer_errors_batch, k=32, num_hashes=7),
             jax.ShapeDtypeStruct(((1 << 22) // 32,), jnp.uint32),
             jax.ShapeDtypeStruct((256, 150), jnp.int8))


def test_resident_passes_compile(v5e):
    from kbbq_tpu.pipeline.resident import (
        _pass1_slice, _pass2_all, _pass3_accum, _pass3_walks, _pass4_all)

    B, N, L, M = 512, 1024, 150, 1 << 22
    codes = jax.ShapeDtypeStruct((N, L), jnp.int8)
    quals = jax.ShapeDtypeStruct((N, L), jnp.int8)
    mask = jax.ShapeDtypeStruct((N, L), jnp.bool_)
    rgs = jax.ShapeDtypeStruct((N,), jnp.int32)
    secs = jax.ShapeDtypeStruct((N,), jnp.bool_)
    ids = jax.ShapeDtypeStruct((N,), jnp.uint32)
    slots = jax.ShapeDtypeStruct((M,), jnp.uint8)
    rows = jax.ShapeDtypeStruct((M // 32,), jnp.uint32)
    errs = jax.ShapeDtypeStruct((N, L), jnp.bool_)

    _compile(v5e, functools.partial(_pass1_slice.__wrapped__, k=32,
                                    num_hashes=7, B=B),
             slots, codes, ids, jax.ShapeDtypeStruct((), jnp.uint32))
    _compile(v5e, functools.partial(_pass2_all.__wrapped__, k=32,
                                    num_hashes=7, trust_threshold=None,
                                    B=B),
             rows, slots, codes,
             jax.ShapeDtypeStruct((200,), jnp.int32))
    # B > walk_chunk so the MXU-scheduled walk path is the one compiled
    _compile(v5e, functools.partial(_pass3_walks.__wrapped__, k=32,
                                    num_hashes=7, ext_cap=None,
                                    use_pallas=False, B=B,
                                    walk_chunk=256),
             rows, codes)
    _compile(v5e, functools.partial(_pass3_accum.__wrapped__, B=B,
                                    num_rg=1, max_len=L),
             errs, codes, quals, mask, rgs, secs)
    _compile(v5e, functools.partial(_pass4_all.__wrapped__, B=B),
             jax.ShapeDtypeStruct((1, 94, 2 * L, 17), jnp.int8),
             codes, quals, mask, rgs, secs)


def test_dense_build_passes_compile(v5e):
    """The sort-based dense filter builds (pass-1 hash-cache slice +
    finish, cached pass 2, cached pass-3 walks) must compile for v5e —
    they lean on lax.sort and searchsorted at tens-of-millions scale,
    which this gate pins."""
    from kbbq_tpu.pipeline.resident import (
        _dense_finish, _pass1_kmers_slice, _pass2_dense,
        _pass2_dense_cached, _pass3_walks)

    B, N, L, M = 512, 1024, 150, 1 << 22
    n = L - 32 + 1
    nkm = N * n
    codes = jax.ShapeDtypeStruct((N, L), jnp.int8)
    ids = jax.ShapeDtypeStruct((N,), jnp.uint32)
    log2_m = M.bit_length() - 1
    _compile(v5e, functools.partial(_pass1_kmers_slice.__wrapped__,
                                    k=32, num_hashes=7, B=B),
             codes, ids, jax.ShapeDtypeStruct((), jnp.uint32))
    tri = jax.ShapeDtypeStruct((nkm,), jnp.uint32)
    msk = jax.ShapeDtypeStruct((nkm,), jnp.bool_)
    _compile(v5e,
             lambda a, b, c, d, e, f: _dense_finish.__wrapped__(
                 (a, b), (c, d), (e, f), log2_m=log2_m),
             tri, tri, tri, tri, msk, msk)
    _compile(v5e, functools.partial(_pass2_dense.__wrapped__, k=32,
                                    num_hashes=7, trust_threshold=None,
                                    log2_m=log2_m, B=B),
             jax.ShapeDtypeStruct((M // 32,), jnp.uint32), codes,
             jax.ShapeDtypeStruct((200,), jnp.int32))
    h1 = jax.ShapeDtypeStruct((N * n,), jnp.uint32)
    _compile(v5e,
             lambda r, a, b, t: _pass2_dense_cached.__wrapped__(
                 r, (a,), (b,), t, k=32, trust_threshold=None,
                 log2_m_a=log2_m, log2_m_b=log2_m, B=B, n_win=n),
             jax.ShapeDtypeStruct((M // 32,), jnp.uint32), h1, h1,
             jax.ShapeDtypeStruct((200,), jnp.int32))
    _compile(v5e, functools.partial(_pass3_walks.__wrapped__, k=32,
                                    num_hashes=7, ext_cap=None,
                                    use_pallas=False, B=B,
                                    walk_chunk=256, log2_m_b=log2_m),
             jax.ShapeDtypeStruct((M // 32,), jnp.uint32), codes,
             h1, h1)


def test_pallas_walk_round_kernel_compile(v5e):
    """The Pallas walk round kernel must compile for v5e at bench-scale
    shapes (chunk 128, L=150, k=32, 2^26-bit filter pinned in VMEM).
    Mosaic crashed outright on an earlier masked-put formulation — this
    gate catches such regressions without touching the chip."""
    from kbbq_tpu.ops.inference import infer_errors_batch

    M = 1 << 26
    _compile(v5e,
             functools.partial(infer_errors_batch, k=32, num_hashes=7,
                               use_pallas=True),
             jax.ShapeDtypeStruct((M // 32,), jnp.uint32),
             jax.ShapeDtypeStruct((128, 150), jnp.int8))


def test_pallas_probe_mosaic_limitation(v5e):
    """Pins the Mosaic contract that killed the VMEM-resident probe
    kernel: tpu.dynamic_gather supports only a SINGLE source vreg along
    the gather dimension (8 sublanes axis 0 / 128 lanes axis 1), so a
    large-table row gather cannot compile.  If this ever STARTS
    compiling, the Pallas probe path is worth revisiting."""
    from kbbq_tpu.ops.pallas_bloom import bloom_query_rows_pallas

    W = (1 << 25) // 32
    NQ = 1 << 18
    with pytest.raises(Exception, match="Mosaic|vreg|gather"):
        _compile(v5e,
                 functools.partial(bloom_query_rows_pallas, num_hashes=7,
                                   interpret=False),
                 jax.ShapeDtypeStruct((W,), jnp.uint32),
                 jax.ShapeDtypeStruct((NQ,), jnp.uint32),
                 jax.ShapeDtypeStruct((NQ,), jnp.uint32))
