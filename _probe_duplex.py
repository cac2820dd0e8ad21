"""Is the tunnel full-duplex? Do async uploads overlap blocking syncs?"""
import time
import numpy as np
import jax, jax.numpy as jnp

x = jnp.zeros((512,), jnp.float32)
f = jax.jit(lambda im: im.astype(jnp.float32).sum())
h = np.zeros((10, 370, 1226), np.uint8)  # 4.5 MB
jax.block_until_ready(f(jnp.asarray(h)))
_ = jax.device_get(x)
jax.block_until_ready(x)

def t(label, fn, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:58s} min={min(ts)*1e3:8.1f} ms")

t("sync alone (device_get ready buffer)", lambda: jax.device_get(x))

def upload_alone():
    h[0, 0, 0] += 1
    jax.block_until_ready(jnp.asarray(h))
t("upload 4.5MB alone (blocked)", upload_alone)

def upload_then_sync():
    h[0, 0, 0] += 1
    u = jnp.asarray(h)      # async upload in flight
    d = jax.device_get(x)   # blocking sync on unrelated ready buffer
    return u, d
t("async 4.5MB upload + immediate sync of ready buffer", upload_then_sync)

def upload_then_sync_then_block():
    h[0, 0, 0] += 1
    u = jnp.asarray(h)
    d = jax.device_get(x)
    jax.block_until_ready(u)
t("async upload + sync + block upload (total)", upload_then_sync_then_block)

# dispatch compute while upload in flight: does compute on OLD data proceed?
g = jax.jit(lambda a: (a @ jnp.ones((512, 512), jnp.float32)).sum())
a0 = jnp.zeros((512, 512), jnp.float32)
jax.block_until_ready(g(a0))

def upload_plus_compute():
    h[0, 0, 0] += 1
    u = jnp.asarray(h)
    r = g(a0)
    jax.block_until_ready(r)
t("async upload + unrelated compute dispatch + block", upload_plus_compute)
