"""Validate the while-iteration fixed cost and the unroll lever on the
real chip: empty loops at different trip counts, unrolled bodies, and
cond-guarded gathers inside unrolled bodies."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

filt = jnp.arange(2_097_152, dtype=jnp.uint32)
idx0 = jnp.arange(512 * 83, dtype=jnp.int32).reshape(512, 83) * 7 \
    % filt.shape[0]


def gather_probe(i, x):
    idx = (idx0 + i) % filt.shape[0]
    return x ^ jnp.sum(filt[idx], dtype=jnp.uint32)


def mk(rounds, unroll, body, guard=False):
    @jax.jit
    def f(x):
        def cond(c):
            return c[0] < rounds

        def bd(c):
            i, x = c
            for _ in range(unroll):
                if guard:
                    x = jax.lax.cond(i < rounds, lambda a: body(a, x),
                                     lambda a: x, i)
                else:
                    x = body(i, x)
                i = i + 1
            return i, x

        return jax.lax.while_loop(cond, bd, (jnp.int32(0), x))[1]
    return f


def run(tag, f, rounds):
    x = jnp.uint32(1)
    np.asarray(f(x))
    t0 = time.time()
    np.asarray(f(x))
    dt = time.time() - t0
    print(f"{tag}: {dt * 1e3:8.2f} ms total, "
          f"{dt / rounds * 1e6:7.1f} us/round", flush=True)


empty = lambda i, x: x + jnp.uint32(1)
run("empty     R=200 U=1", mk(200, 1, empty), 200)
run("empty     R=800 U=1", mk(800, 1, empty), 800)
run("empty     R=800 U=4", mk(800, 4, empty), 800)
run("gather83  R=200 U=1", mk(200, 1, gather_probe), 200)
run("gather83  R=200 U=2", mk(200, 2, gather_probe), 200)
run("gather83  R=200 U=4", mk(200, 4, gather_probe), 200)
run("gather83g R=200 U=4", mk(200, 4, gather_probe, guard=True), 200)
run("gather83g R=200 U=8", mk(200, 8, gather_probe, guard=True), 200)
