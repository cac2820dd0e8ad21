"""Profile the bench workload stage timings (warm, rep 3)."""
import time, collections, functools
import numpy as np
import jax

STATS = collections.defaultdict(lambda: [0, 0.0])
_real_device_get = jax.device_get

def timed(name, fn):
    @functools.wraps(fn)
    def w(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        STATS[name][0] += 1
        STATS[name][1] += time.perf_counter() - t0
        return out
    return w

jax.device_get = timed("device_get", _real_device_get)

from srba_slam_tpu.config import GeneralOptions, SRBAStereoSLAMOptions, VOOptions
from srba_slam_tpu.models.estimator import SRBAStereoSLAMEstimator
from srba_slam_tpu.utils.camera import StereoCamera
from srba_slam_tpu.utils.framesource import SyntheticSource

cam = StereoCamera.kitti()
src = SyntheticSource(cam, n_frames=41, seed=11, step=0.8)
frames = list(src)

def build():
    opts = SRBAStereoSLAMOptions(
        camera=cam, n_feats=500, detect_fast_th=20,
        adaptive_th_min_matches=100, max_translation=2.0, max_rotation=25.0,
        updated_matches_th=60, vo_id_tracking_th=40,
        srba_submap_size=10, srba_max_tree_depth=4, srba_max_optimize_depth=5,
        srba_kernel_param=1.5, da_filter_by_direction=False, residual_th=30.0,
    )
    est = SRBAStereoSLAMEstimator(
        GeneralOptions(), opts, VOOptions(fast_th=20, n_feats=500),
        capacity=512, max_kfs=128,
    )
    est.initialize()
    return est

for rep in range(3):
    est = build()
    if rep == 2:
        for name in ["_dispatch_scan", "_kf_check_dispatch", "_defer_check",
                     "_resolve_spec", "_kf_apply", "_finish_batched"]:
            setattr(est, name, timed(name, getattr(est, name)))
    est.perform_stereo_slam_batched(frames[:11], batch=10)
    jax.block_until_ready(est.vo.last_frame().desc_l)
    for k in list(STATS): del STATS[k]
    t0 = time.perf_counter()
    est.perform_stereo_slam_batched(frames[11:], batch=10)
    jax.block_until_ready(est.vo.last_frame().desc_l)
    total = time.perf_counter() - t0
    print(f"rep {rep}: {total*1e3:.0f} ms ({30/total:.2f} fps)")

n_checks = sum(1 for r in est.step_log[11:] if r.kf_check)
n_ins = sum(1 for r in est.step_log[11:] if r.inserted_kf is not None)
print(f"{n_checks} checks, {n_ins} inserts")
for k, (n, t) in sorted(STATS.items(), key=lambda kv: -kv[1][1]):
    print(f"  {k:22s} n={n:3d}  total={t*1e3:7.1f} ms  avg={t/n*1e3:6.1f} ms")
