import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srba_slam_tpu.utils import se3


def random_poses(rng, n, max_angle=2.8):
    w = rng.normal(size=(n, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.0, max_angle, (n, 1))
    t = rng.normal(size=(n, 3)) * 5.0
    return jnp.asarray(np.concatenate([w, t], axis=-1), dtype=jnp.float32)


def test_exp_log_roundtrip(rng):
    poses = random_poses(rng, 64)
    R, t = se3.exp(poses)
    back = se3.log(R, t)
    # rotation vectors round-trip within the principal branch (|w| < pi);
    # f32 loses ~1e-3 of precision for angles approaching pi
    np.testing.assert_allclose(np.asarray(back), np.asarray(poses), atol=1e-2)


def test_exp_log_roundtrip_small_angles(rng):
    # the per-frame VO regime: small increments must round-trip tightly
    poses = random_poses(rng, 64, max_angle=0.3)
    R, t = se3.exp(poses)
    back = se3.log(R, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(poses), atol=1e-4)


def test_exp_small_angle(rng):
    w = jnp.asarray([[1e-8, -1e-9, 1e-8]], dtype=jnp.float32)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(se3.so3_log(R))))


def test_rotation_matrix_orthonormal(rng):
    poses = random_poses(rng, 32)
    R, _ = se3.exp(poses)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    det = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_compose_inverse_identity(rng):
    a = random_poses(rng, 16)
    ident = se3.compose(a, se3.inverse(a))
    np.testing.assert_allclose(np.asarray(ident), 0.0, atol=1e-4)


def test_compose_matches_matrix_composition(rng):
    a, b = random_poses(rng, 8), random_poses(rng, 8)
    c = se3.compose(a, b)
    Ra, ta = se3.exp(a)
    Rb, tb = se3.exp(b)
    Rc, tc = se3.exp(c)
    np.testing.assert_allclose(np.asarray(Rc), np.asarray(Ra @ Rb), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tc), np.asarray(jnp.einsum("nij,nj->ni", Ra, tb) + ta), atol=1e-4
    )


def test_transform_points_roundtrip(rng):
    pose = random_poses(rng, 4)
    pts = jnp.asarray(rng.normal(size=(4, 10, 3)), dtype=jnp.float32)
    out = se3.inverse_transform_points(pose, se3.transform_points(pose, pts))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-4)


def test_relative(rng):
    a, b = random_poses(rng, 8), random_poses(rng, 8)
    rel = se3.relative(a, b)  # a in frame of b
    recomposed = se3.compose(b, rel)
    Ra, ta = se3.exp(a)
    Rr, tr = se3.exp(recomposed)
    np.testing.assert_allclose(np.asarray(Rr), np.asarray(Ra), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tr), np.asarray(ta), atol=1e-4)


def test_ypr_roundtrip(rng):
    ypr = jnp.asarray(rng.uniform(-1.2, 1.2, size=(16, 3)), dtype=jnp.float32)
    R = se3.rotmat_from_ypr(ypr)
    back = se3.ypr_from_rotmat(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ypr), atol=1e-4)


def test_quat_near_pi(rng):
    # rotation by ~pi around arbitrary axes is the hard case for log
    axes = rng.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    w = jnp.asarray(axes * (np.pi - 1e-3), dtype=jnp.float32)
    R = se3.so3_exp(w)
    back = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=1e-2)


def test_jit_and_vmap():
    f = jax.jit(se3.compose)
    a = jnp.zeros((6,))
    out = f(a, a)
    assert out.shape == (6,)
    batched = jax.vmap(se3.inverse)(jnp.zeros((5, 6)))
    assert batched.shape == (5, 6)
