"""Measure tunnel OCCUPANCY of async ops: do N queued async ops serialize?"""
import time
import numpy as np
import jax, jax.numpy as jnp

f = jax.jit(lambda x: x + 1.0)
g = jax.jit(lambda x, s: x * s + 1.0)
x = jnp.zeros((512,), jnp.float32)
jax.block_until_ready(f(x)); jax.block_until_ready(g(x, 1.0))
_ = jax.device_get(x)  # enter degraded mode

def t(label, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} min={min(ts)*1e3:8.1f} ms")

def chain(n):
    y = x
    for _ in range(n):
        y = f(y)
    jax.block_until_ready(y)

t("1 dispatch + block", lambda: chain(1))
t("5 chained dispatches + 1 block", lambda: chain(5))
t("20 chained dispatches + 1 block", lambda: chain(20))
t("60 chained dispatches + 1 block", lambda: chain(60))

def chain_scalar(n):
    y = x
    for i in range(n):
        y = g(y, 1.0 + i * 1e-6)  # fresh python scalar each call
    jax.block_until_ready(y)

t("20 chained dispatches w/ fresh py scalar + block", lambda: chain_scalar(20))

h = np.zeros((512,), np.float32)

def chain_upload(n):
    y = x
    for i in range(n):
        y = f(y + jnp.asarray(h + i))  # fresh 2KB upload each iteration
    jax.block_until_ready(y)

t("20 chained w/ fresh 2KB upload each + block", lambda: chain_upload(20))

himg = np.zeros((370, 1226), np.uint8)
acc = jax.jit(lambda y, im: y + im.astype(jnp.float32).sum() * 0)
jax.block_until_ready(acc(x, jnp.asarray(himg)))

def chain_upload_big(n):
    y = x
    for i in range(n):
        himg[0, 0] = i
        y = acc(y, jnp.asarray(himg))  # fresh 450KB upload each iteration
    jax.block_until_ready(y)

t("10 chained w/ fresh 450KB uint8 upload + block", lambda: chain_upload_big(10))

def fanout(n):
    ys = [f(x + float(i)) for i in range(n)]
    jax.block_until_ready(ys)

t("20 independent dispatches + block all", lambda: fanout(20))
