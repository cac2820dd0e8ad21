"""Stereo camera model and inverse/forward projections as pure JAX.

Replaces the reference's MRPT ``TStereoCamera`` plus the inverse stereo
projection ``projectMatchTo3D`` (reference src/srba-stereo-slam_utils.h:558-574)
with batched, mask-friendly tensor ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class StereoCamera(NamedTuple):
    """Pinhole stereo rig (rectified). All entries are scalars (static or 0-d arrays).

    ``baseline`` is the x-offset of the right camera in the left frame
    (reference demo/config_imgdir_kitti_srba.ini:155 stores it as the first
    element of ``pose_quaternion``).
    """

    fx_l: float
    fy_l: float
    cx_l: float
    cy_l: float
    fx_r: float
    fy_r: float
    cx_r: float
    cy_r: float
    baseline: float
    width: int = 0
    height: int = 0

    @staticmethod
    def kitti() -> "StereoCamera":
        """The KITTI seq-00 calibration from demo/config_imgdir_kitti_srba.ini:138-155."""
        return StereoCamera(
            fx_l=707.0912, fy_l=707.0912, cx_l=601.8873, cy_l=183.1104,
            fx_r=707.0912, fy_r=707.0912, cx_r=601.8873, cy_r=183.1104,
            baseline=0.54, width=1226, height=370,
        )


def project_match_to_3d(ul: jax.Array, vl: jax.Array, ur: jax.Array,
                        cam: StereoCamera) -> jax.Array:
    """Inverse stereo projection; batched over any shape of ul/vl/ur.

    Bit-parity with the reference formula (src/srba-stereo-slam_utils.h:572-573):
        b_d = baseline / (fl*(cur - ur) + fr*(ul - cul))
        X = b_d*fr*(ul - cul);  Y = b_d*fr*(vl - cvl);  Z = b_d*fl*fr
    Returns [..., 3] points in the LEFT camera frame.
    """
    fl, fr = cam.fx_l, cam.fx_r
    b_d = cam.baseline / (fl * (cam.cx_r - ur) + fr * (ul - cam.cx_l))
    x = b_d * fr * (ul - cam.cx_l)
    y = b_d * fr * (vl - cam.cy_l)
    z = b_d * fl * fr
    return jnp.stack([x, y, z], axis=-1)


def project_stereo(pts: jax.Array, cam: StereoCamera, eps: float = 1e-6):
    """Forward stereo projection of points [..., 3] in the left camera frame.

    Returns (ul, vl, ur, vr) each of shape [...]. Observation layout matches
    the reference's StereoCamera observation o = {ul, vl, ur, vr}
    (src/srba-stereo-slam.h:51).
    """
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    zi = 1.0 / jnp.maximum(z, eps)
    ul = cam.cx_l + cam.fx_l * x * zi
    vl = cam.cy_l + cam.fy_l * y * zi
    ur = cam.cx_r + cam.fx_r * (x - cam.baseline) * zi
    vr = cam.cy_r + cam.fy_r * y * zi
    return ul, vl, ur, vr


def disparity(ul: jax.Array, ur: jax.Array, cam: StereoCamera) -> jax.Array:
    """Generalized disparity fl*(cur-ur) + fr*(ul-cul) (positive for valid depth)."""
    return cam.fx_l * (cam.cx_r - ur) + cam.fx_r * (ul - cam.cx_l)
