import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srba_slam_tpu.parallel.batch import (
    batched_vo_step, empty_features, make_mesh,
)
from srba_slam_tpu.parallel.sweep import feature_budget_sweep
from srba_slam_tpu.utils.camera import StereoCamera
from srba_slam_tpu.utils.framesource import SyntheticSource


def small_cam():
    return StereoCamera(
        fx_l=90.0, fy_l=90.0, cx_l=80.0, cy_l=48.0,
        fx_r=90.0, fy_r=90.0, cx_r=80.0, cy_r=48.0,
        baseline=0.5, width=160, height=96,
    )


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_batched_vo_step_sharded(rng):
    cam = small_cam()
    mesh = make_mesh(8)
    b, h, w, k = 8, 96, 160, 64
    lefts = jnp.asarray(rng.uniform(0, 255, (b, h, w)).astype(np.float32))
    rights = jnp.roll(lefts, -3, axis=-1)
    prev = empty_features(b, k)
    init = jnp.zeros((b, 6), jnp.float32)
    cur, poses, valid, fleet_res, fleet_frac = batched_vo_step(
        mesh, lefts, rights, prev, init, cam, fast_th=8.0, k=k
    )
    assert poses.shape == (b, 6)
    # second step tracks against real features on every shard
    cur2, poses2, valid2, res2, frac2 = batched_vo_step(
        mesh, lefts, rights, cur, init, cam, fast_th=8.0, k=k
    )
    assert bool(jnp.all(jnp.isfinite(poses2)))
    assert float(frac2) > 0.9  # every sequence tracked (identical frames)
    # increments should be ~zero (same frames twice)
    assert float(jnp.max(jnp.abs(poses2))) < 0.05


def test_feature_budget_sweep():
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=5, seed=3, step=0.08))
    res = feature_budget_sweep(frames, cam, budgets=(64, 128), fast_th=10.0)
    assert [r.n_feats for r in res] == [64, 128]
    # a larger budget finds at least as many matches
    assert res[1].mean_stereo_matches >= res[0].mean_stereo_matches
    assert res[0].trajectory.shape == (5, 6)
