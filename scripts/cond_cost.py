"""Price lax.cond inside a device while_loop on the real chip:
per-iteration cost of (a) plain gather body, (b) cond-wrapped gather,
(c) cond taking the cheap branch, (d) empty body."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

ROUNDS = 200
filt = jnp.arange(2_097_152, dtype=jnp.uint32)
idx0 = jnp.arange(512 * 96, dtype=jnp.int32).reshape(512, 96) * 7 % filt.shape[0]


def mk(body):
    @jax.jit
    def f(x):
        def cond(c):
            return c[0] < ROUNDS

        def bd(c):
            i, x = c
            return i + 1, body(i, x)

        return jax.lax.while_loop(cond, bd, (jnp.int32(0), x))[1]
    return f


def b_gather(i, x):
    idx = (idx0 + i) % filt.shape[0]
    return x ^ jnp.sum(filt[idx], dtype=jnp.uint32)


def b_gather_small(i, x):
    idx = (idx0[:, :35] + i) % filt.shape[0]
    return x ^ jnp.sum(filt[idx], dtype=jnp.uint32)


def b_cond_taken(i, x):
    def t(a):
        idx = (idx0[:, :35] + a) % filt.shape[0]
        return jnp.sum(filt[idx], dtype=jnp.uint32)

    def f(a):
        return jnp.uint32(0)

    return x ^ jax.lax.cond(i >= 0, t, f, i)


def b_cond_cheap(i, x):
    def t(a):
        idx = (idx0[:, :35] + a) % filt.shape[0]
        return jnp.sum(filt[idx], dtype=jnp.uint32)

    def f(a):
        return jnp.uint32(0)

    return x ^ jax.lax.cond(i < -1, t, f, i)


def b_empty(i, x):
    return x + jnp.uint32(1)


for name, body in (("gather96  ", b_gather), ("gather35  ", b_gather_small),
                   ("cond taken", b_cond_taken),
                   ("cond cheap", b_cond_cheap), ("empty     ", b_empty)):
    f = mk(body)
    x = jnp.uint32(1)
    np.asarray(f(x))
    t0 = time.time()
    np.asarray(f(x))
    dt = time.time() - t0
    print(f"{name}: {dt / ROUNDS * 1e6:8.1f} us/iter", flush=True)
