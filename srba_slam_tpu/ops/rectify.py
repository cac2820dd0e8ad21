"""Stereo rectification / undistortion as a batched bilinear remap.

The reference delegates rectification to the stereo-vo engine's RECTIFY stage
(cv::initUndistortRectifyMap + remap; demo configs run with
``rectified_images=true`` so it is pass-through for KITTI, but the capability
exists for raw rigs like EuRoC). Here: precompute the remap grids once on
host from the radial-tangential distortion model + rectifying rotation, then
every frame is one gather-based bilinear warp on device — fused by XLA into
the frontend when traced together.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class RectifyMaps(NamedTuple):
    """Per-eye sampling grids: output pixel (y, x) samples input (map_y, map_x)."""

    map_y: jax.Array  # f32 [H, W]
    map_x: jax.Array  # f32 [H, W]


def build_maps(width: int, height: int, fx: float, fy: float, cx: float,
               cy: float, dist=(0.0, 0.0, 0.0, 0.0, 0.0), R=None,
               new_fx=None, new_fy=None, new_cx=None, new_cy=None
               ) -> RectifyMaps:
    """≙ cv::initUndistortRectifyMap for the radial-tangential (k1 k2 p1 p2
    k3) model with an optional rectifying rotation R (3x3)."""
    k1, k2, p1, p2, k3 = (list(dist) + [0.0] * 5)[:5]
    new_fx = new_fx or fx
    new_fy = new_fy or fy
    new_cx = new_cx if new_cx is not None else cx
    new_cy = new_cy if new_cy is not None else cy
    R = np.eye(3) if R is None else np.asarray(R, np.float64)
    Rinv = R.T

    us, vs = np.meshgrid(np.arange(width), np.arange(height))
    x = (us - new_cx) / new_fx
    y = (vs - new_cy) / new_fy
    ones = np.ones_like(x)
    # rotate the ideal ray back into the original camera
    pts = np.stack([x, y, ones], axis=-1) @ Rinv.T
    x = pts[..., 0] / pts[..., 2]
    y = pts[..., 1] / pts[..., 2]
    # apply distortion
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return RectifyMaps(
        map_y=jnp.asarray((yd * fy + cy).astype(np.float32)),
        map_x=jnp.asarray((xd * fx + cx).astype(np.float32)),
    )


@jax.jit
def remap_bilinear(img: jax.Array, maps: RectifyMaps) -> jax.Array:
    """Bilinear warp; out-of-bounds samples clamp to the border."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    y = jnp.clip(maps.map_y, 0.0, h - 1.0)
    x = jnp.clip(maps.map_x, 0.0, w - 1.0)
    # keep the interpolation cell inside the image; at the far edge the
    # fractional weight reaches exactly 1.0 so the last row/col is exact
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    fy = y - y0
    fx = x - x0
    flat = img.reshape(-1)

    def at(yy, xx):
        return flat[yy * w + xx]

    v = (
        at(y0, x0) * (1 - fy) * (1 - fx)
        + at(y0, x0 + 1) * (1 - fy) * fx
        + at(y0 + 1, x0) * fy * (1 - fx)
        + at(y0 + 1, x0 + 1) * fy * fx
    )
    return v


@functools.partial(jax.jit, static_argnames=())
def rectify_pair(left: jax.Array, right: jax.Array,
                 maps_l: RectifyMaps, maps_r: RectifyMaps):
    """Rectify both eyes in one dispatch."""
    return remap_bilinear(left, maps_l), remap_bilinear(right, maps_r)
