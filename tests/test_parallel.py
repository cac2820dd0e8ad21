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


def _fleet_estimator(cam, n_feats=128, voc=None):
    from srba_slam_tpu.config import (GeneralOptions, SRBAStereoSLAMOptions,
                                      VOOptions)
    from srba_slam_tpu.models.estimator import SRBAStereoSLAMEstimator

    opts = SRBAStereoSLAMOptions(
        orb_adaptive_fast_th=True,
        camera=cam, n_feats=n_feats, detect_fast_th=12,
        adaptive_th_min_matches=30, max_translation=0.5, max_rotation=10.0,
        updated_matches_th=30, vo_id_tracking_th=25, srba_submap_size=5,
        srba_max_optimize_depth=3, da_filter_by_direction=False,
        residual_th=10.0,
    )
    est = SRBAStereoSLAMEstimator(
        GeneralOptions(), opts, VOOptions(fast_th=12, n_feats=n_feats),
        capacity=128, max_kfs=32,
    )
    est.initialize(vocabulary=voc)
    return est


def test_fleet_matches_sequential_runs(rng):
    """Full-pipeline multi-sequence mode: S sequences advanced in lockstep
    with sharded VO + sharded BoW/DA must reproduce the per-sequence
    estimator runs exactly (same keyframe counts, same trajectories)."""
    from srba_slam_tpu.models.bow import Vocabulary
    from srba_slam_tpu.parallel.fleet import FleetSLAM

    cam = small_cam()
    n_frames = 14
    # two different sequences (different seeds -> different scenes/motion)
    sources = [
        list(SyntheticSource(cam, n_frames=n_frames, seed=s, step=0.12))
        for s in (11, 23)
    ]
    desc = rng.integers(0, 2**32, (512, 8), dtype=np.uint64).astype(np.uint32)
    voc = Vocabulary.train(desc, k=8, L=2, seed=0)

    # sequential reference runs
    seq_ests = [_fleet_estimator(cam, voc=voc) for _ in sources]
    for est, frames in zip(seq_ests, sources):
        est.perform_stereo_slam(frames)

    # fleet run over the 8-virtual-device mesh (2 sequences -> 2-device mesh)
    fleet_ests = [_fleet_estimator(cam, voc=voc) for _ in sources]
    fleet = FleetSLAM(fleet_ests)
    fleet.run(sources)

    for seq, flt in zip(seq_ests, fleet_ests):
        assert flt.store.n_kfs == seq.store.n_kfs, (
            flt.store.n_kfs, seq.store.n_kfs)
        flt.rba.flush()
        seq.rba.flush()
        # vmapped vs single-program XLA fusion differs in f32 rounding, so
        # poses agree to millimeters, not bits
        np.testing.assert_allclose(
            flt.rba.kf_global[: flt.store.n_kfs],
            seq.rba.kf_global[: seq.store.n_kfs], atol=5e-3)
        # same landmark bookkeeping
        assert flt.rba.n_lms == seq.rba.n_lms
        assert flt.rba.n_edges == seq.rba.n_edges
