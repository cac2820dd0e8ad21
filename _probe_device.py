"""Time the device programs at bench shapes: vo_scan batch, DA check, window BA."""
import time
import numpy as np
import jax, jax.numpy as jnp

from srba_slam_tpu.config import GeneralOptions, SRBAStereoSLAMOptions, VOOptions
from srba_slam_tpu.models.estimator import SRBAStereoSLAMEstimator
from srba_slam_tpu.utils.camera import StereoCamera
from srba_slam_tpu.utils.framesource import SyntheticSource
from srba_slam_tpu.ops.window_ba import optimize_window_packed, pack_window

cam = StereoCamera.kitti()
src = SyntheticSource(cam, n_frames=12, seed=11, step=0.8)
frames = list(src)

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
est.perform_stereo_slam_batched(frames, batch=10)
est.rba.flush()

def t(label, fn, n=6):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label:46s} min={min(ts)*1e3:7.1f} ms")

# vo_scan for 10 frames (reuse the engine's jitted path via _dispatch_scan)
lefts = np.stack([f[0] for f in frames[:10]])
rights = np.stack([f[1] for f in frames[:10]])
t("vo_scan 10 frames (incl upload)", lambda: est._dispatch_scan(lefts, rights)["outs"][3])

# DA check program
frame = est.vo.last_frame()
t("query_and_associate (5-cand DA)", lambda: est._kf_check_dispatch(frame)[4])

# window BA at the two bucket sizes used in this workload
p = est.rba.p
for C, L, O in [(8, 1024, 2048), (16, 2048, 4096), (16, 4096, 8192)]:
    rng = np.random.default_rng(0)
    cam_pose = np.zeros((C, 6), np.float32)
    cam_valid = np.ones(C, bool)
    lm_pos = rng.normal(0, 1, (L, 3)).astype(np.float32) + np.array([0, 0, 10], np.float32)
    lm_base = rng.integers(0, C, L).astype(np.int32)
    lm_valid = np.ones(L, bool)
    oc = rng.integers(0, C, O).astype(np.int32)
    ol = rng.integers(0, L, O).astype(np.int32)
    opx = rng.normal(300, 50, (O, 3)).astype(np.float32)
    ov = np.ones(O, bool)
    ints, floats = pack_window(cam_pose, cam_valid, lm_pos, lm_base, lm_valid, oc, ol, opx, ov)
    ints_d, floats_d = jnp.asarray(ints), jnp.asarray(floats)
    t(f"window BA C={C} L={L} O={O} ({p.opt_iters} it)",
      lambda: optimize_window_packed(ints_d, floats_d, C, L, O, cam,
                                     kernel_param=p.kernel_param,
                                     max_iters=p.opt_iters,
                                     use_kernel=p.use_robust_kernel).cam_pose)

# store/bow speculative appends
t("store.write_row dispatch", lambda: (est.store.write_row(frame, 100), est.store.arrays.ys_l)[1])
t("bow.write_row dispatch", lambda: (est.bow.write_row(frame.desc_l, frame.m_valid, 100), est.bow._db)[1])
