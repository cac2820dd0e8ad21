"""Break down the VO frontend cost at KITTI shapes."""
import time
import numpy as np
import jax, jax.numpy as jnp

from srba_slam_tpu.utils.camera import StereoCamera
from srba_slam_tpu.models.vo import extract_and_match, track_and_solve, vo_scan
from srba_slam_tpu.ops.fast import fast_score_map
from srba_slam_tpu.ops.nms import local_max_suppress, grid_topk
from srba_slam_tpu.ops.orb import describe

cam = StereoCamera.kitti()
h, w, k = 370, 1226, 512
rng = np.random.default_rng(0)
left = jnp.asarray(rng.integers(0, 255, (h, w)), jnp.uint8)
right = jnp.asarray(rng.integers(0, 255, (h, w)), jnp.uint8)
leftf = left.astype(jnp.float32)
jax.block_until_ready(leftf)
_ = jax.device_get(jnp.zeros(4))

def t(label, fn, n=6):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} min={min(ts)*1e3:7.1f} ms")

fs = jax.jit(lambda im: fast_score_map(im, jnp.float32(20.0)))
t("fast_score_map", lambda: fs(leftf))
nm = jax.jit(lambda s: local_max_suppress(s, radius=2))
smap = fs(leftf)
t("local_max_suppress", lambda: nm(smap))
gt = jax.jit(lambda s: grid_topk(s, cell=5, k=k))
sn = nm(smap)
t("grid_topk cell=5 k=512", lambda: gt(sn)[0])
ys, xs, sc, valid = gt(sn)
de = jax.jit(lambda im, ys, xs, v: describe(im, ys, xs, v, oriented=False))
t("describe (ORB 512)", lambda: de(leftf, ys, xs, valid)[0])

t("extract_and_match (1 pair)",
  lambda: extract_and_match(left, right, cam, jnp.float32(20.0), jnp.int32(60),
                            k=k).m_valid)
prev = extract_and_match(left, right, cam, jnp.float32(20.0), jnp.int32(60), k=k)
t("track_and_solve",
  lambda: track_and_solve(prev, prev, cam, jnp.zeros(6, jnp.float32),
                          jnp.int32(60)).pose.pose)

lefts = jnp.asarray(rng.integers(0, 255, (10, h, w)), jnp.uint8)
rights = jnp.asarray(rng.integers(0, 255, (10, h, w)), jnp.uint8)
jax.block_until_ready((lefts, rights))
t("vo_scan 10 frames (device only)",
  lambda: vo_scan(lefts, rights, prev, jnp.zeros(6, jnp.float32), cam,
                  jnp.float32(20.0), jnp.int32(60), k=k)[2][3], n=4)
