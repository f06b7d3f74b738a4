"""Probe axon-relay h2d behavior: one 15MB put vs sliced puts, on an
idle vs busy device, from main vs background thread.  One long-lived
process (KNOWN_ISSUES #0)."""
import concurrent.futures as cf
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


dev = jax.devices()[0]
log(f"device: {dev}")

# warm the device
x = jnp.zeros((8, 128), jnp.float32)
jax.block_until_ready(x @ x.T)
log("device warm")

data = np.random.randint(0, 255, size=(400000, 38), dtype=np.uint8)  # ~15MB


def put_once(tag, arr):
    t0 = time.time()
    d = jax.device_put(arr)
    t1 = time.time()
    jax.block_until_ready(d)
    t2 = time.time()
    log(f"{tag}: call {t1-t0:.3f}s, ready {t2-t0:.3f}s")
    return d


def put_sliced(tag, arr, nsl=7):
    t0 = time.time()
    outs = []
    step = (arr.shape[0] + nsl - 1) // nsl
    for i in range(0, arr.shape[0], step):
        outs.append(jax.device_put(arr[i:i + step]))
    t1 = time.time()
    for o in outs:
        jax.block_until_ready(o)
    t2 = time.time()
    log(f"{tag}: calls {t1-t0:.3f}s, ready {t2-t0:.3f}s")
    return outs


# 1. idle device, main thread, one put
put_once("idle/main/one", data)
put_once("idle/main/one(rep)", data)
# 2. idle device, main thread, sliced
put_sliced("idle/main/sliced", data)

# 3. busy device: dispatch a long matmul loop first
a = jnp.asarray(np.random.rand(4096, 4096).astype(np.float32))


@jax.jit
def burn(a):
    def body(c, _):
        return c @ c * 1e-3 + c, None
    c, _ = jax.lax.scan(body, a, None, length=60)
    return c


r = burn(a)  # compile
jax.block_until_ready(r)
t0 = time.time()
jax.block_until_ready(burn(a))
burn_s = time.time() - t0
log(f"burn takes {burn_s:.2f}s on device")

r = burn(a)  # async dispatch — device busy now
put_once("busy/main/one", data)
jax.block_until_ready(r)

r = burn(a)
put_sliced("busy/main/sliced", data)
jax.block_until_ready(r)

# 4. busy device, background-thread put (the resident-pipeline pattern)
r = burn(a)
ex = cf.ThreadPoolExecutor(1)
t0 = time.time()
fut = ex.submit(jax.device_put, data)
d = fut.result()
t1 = time.time()
jax.block_until_ready(d)
log(f"busy/thread/one: result {t1-t0:.3f}s, ready {time.time()-t0:.3f}s")
jax.block_until_ready(r)

# 5. like the pipeline: thread does pack + put while device busy
r = burn(a)
t0 = time.time()


def pack_and_put():
    c = (data[:, :36] & 3)
    packed = (c[:, :9] | (c[:, 9:18] << 2) | (c[:, 18:27] << 4)
              | (c[:, 27:36] << 6))
    return jax.device_put(packed)


fut = ex.submit(pack_and_put)
d = fut.result()
t1 = time.time()
jax.block_until_ready(d)
log(f"busy/thread/pack+put(3.6MB): result {t1-t0:.3f}s, "
    f"ready {time.time()-t0:.3f}s")
jax.block_until_ready(r)
log("done")
