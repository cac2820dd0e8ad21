import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.utils.camera import StereoCamera, project_match_to_3d, project_stereo


def test_project_match_to_3d_reference_formula():
    """Bit-level check against the reference formula (utils.h:558-574)."""
    cam = StereoCamera.kitti()
    ul, vl, ur = 640.0, 200.0, 600.0
    fl, fr = cam.fx_l, cam.fx_r
    b_d = cam.baseline / (fl * (cam.cx_r - ur) + fr * (ul - cam.cx_l))
    expected = np.array([b_d * fr * (ul - cam.cx_l), b_d * fr * (vl - cam.cy_l), b_d * fl * fr])
    got = project_match_to_3d(jnp.float32(ul), jnp.float32(vl), jnp.float32(ur), cam)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def test_project_roundtrip(rng):
    cam = StereoCamera.kitti()
    pts = np.stack(
        [rng.uniform(-10, 10, 100), rng.uniform(-3, 3, 100), rng.uniform(4, 60, 100)], axis=-1
    ).astype(np.float32)
    ul, vl, ur, vr = project_stereo(jnp.asarray(pts), cam)
    back = project_match_to_3d(ul, vl, ur, cam)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-3, atol=1e-3)
    # rectified: vl == vr
    np.testing.assert_allclose(np.asarray(vl), np.asarray(vr), atol=1e-4)


def test_batched_shapes():
    cam = StereoCamera.kitti()
    ul = jnp.ones((4, 500)) * 640.0
    vl = jnp.ones((4, 500)) * 180.0
    ur = jnp.ones((4, 500)) * 600.0
    out = project_match_to_3d(ul, vl, ur, cam)
    assert out.shape == (4, 500, 3)
