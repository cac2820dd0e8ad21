"""Oriented 256-bit binary (ORB-style) descriptors as batched gathers.

TPU-native equivalent of the ORB descriptor stage inside the reference's
stereo-vo engine (forced dmORB mode, reference
src/CSRBAStereoSLAMEstimator.cpp:1135; 1 octave per
demo/config_imgdir_kitti_srba.ini RECTIFY nOctaves=1).

Per image the pipeline is three fixed-shape batched gathers over all K
keypoints at once — no per-keypoint loop:

1. orientation: intensity-centroid moments over a radius-15 disc,
   theta = atan2(m01, m10);
2. steering: the 256 (p, q) test-point pairs are rotated by theta
   (per-keypoint 2x2 rotation applied to the whole pattern tensor);
3. test: bit_i = blurred(x + Rp_i) < blurred(x + Rq_i), packed to
   uint32[K, 8] in the byte-LSB-first bit order shared with the reference
   (see srba_slam_tpu.ops.bits).

The test-point pattern is a deterministic seeded Gaussian pattern (sigma =
patch/5, classic BRIEF construction) constrained to the radius-15 disc so
rotated samples never leave the patch. It is NOT OpenCV's learned table —
descriptors are ORB-like, not bit-identical to OpenCV's (the framework trains
or loads its own vocabulary; see srba_slam_tpu.models.bow).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

PATCH_RADIUS = 15
N_BITS = 256


def _make_pattern(seed: int = 7) -> np.ndarray:
    """[256, 2, 2] int32 (pair, point, (dy,dx)) test pattern inside the disc."""
    rng = np.random.default_rng(seed)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pts = []
    while len(pts) < N_BITS * 2:
        cand = rng.normal(0.0, sigma, size=(N_BITS * 4, 2))
        cand = cand[np.linalg.norm(cand, axis=1) <= PATCH_RADIUS - 1.0]
        pts.extend(cand.tolist())
    pts = np.asarray(pts[: N_BITS * 2], dtype=np.float64)
    return pts.reshape(N_BITS, 2, 2)


_PATTERN = _make_pattern()  # float64 [256, 2, 2] in (dy, dx)


def _disc_offsets(radius: int) -> np.ndarray:
    """Integer (dy, dx) offsets within the closed disc."""
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    keep = ys * ys + xs * xs <= radius * radius
    return np.stack([ys[keep], xs[keep]], axis=-1)


_DISC = _disc_offsets(PATCH_RADIUS)  # [D, 2]


def box_blur5(img: jax.Array) -> jax.Array:
    """5x5 box filter (the smoothing ORB applies before binary tests)."""
    s = jax.lax.reduce_window(
        img.astype(jnp.float32), 0.0, jax.lax.add, (5, 5), (1, 1), "SAME"
    )
    return s / 25.0


def _gather(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """img[ys, xs] with clipping; ys/xs any equal shape."""
    h, w = img.shape
    yc = jnp.clip(ys, 0, h - 1)
    xc = jnp.clip(xs, 0, w - 1)
    return img.reshape(-1)[yc * w + xc]


def orientations(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Intensity-centroid orientation (radians) for K keypoints. [K] -> [K]."""
    dy = jnp.asarray(_DISC[:, 0], jnp.int32)
    dx = jnp.asarray(_DISC[:, 1], jnp.int32)
    vals = _gather(img, ys[:, None] + dy[None, :], xs[:, None] + dx[None, :])
    m01 = jnp.sum(vals * dy.astype(jnp.float32)[None, :], axis=-1)
    m10 = jnp.sum(vals * dx.astype(jnp.float32)[None, :], axis=-1)
    return jnp.arctan2(m01, m10)


@functools.partial(jax.jit, static_argnames=("oriented",))
def describe(img: jax.Array, ys: jax.Array, xs: jax.Array, valid: jax.Array,
             oriented: bool = True):
    """Compute 256-bit binary descriptors for K keypoints.

    Args:
      img: [H, W] float32 grayscale.
      ys, xs: [K] int32 keypoint coordinates (full patch support assumed —
        the detector enforces the margin).
      valid: [K] bool; invalid rows get zero descriptors.
      oriented: steer the pattern by the intensity-centroid angle (rotation
        invariance for wide-baseline place recognition). Upright descriptors
        (False) are markedly more stable for stereo matching and
        frame-to-frame tracking — the intensity centroid is noisy on
        weak-gradient patches — and are what the VO frontend uses.

    Returns:
      (desc, theta): uint32[K, 8] packed descriptors, [K] orientations.
    """
    img = img.astype(jnp.float32)
    blurred = box_blur5(img)
    theta = orientations(img, ys, xs)
    if not oriented:
        theta = jnp.zeros_like(theta)

    c, s = jnp.cos(theta), jnp.sin(theta)  # [K]
    pat = jnp.asarray(_PATTERN, jnp.float32)  # [256, 2, 2] (pair, point, (dy,dx))
    pdy, pdx = pat[..., 0], pat[..., 1]  # [256, 2]
    # rotate each offset by theta_k: dy' = s*dx + c*dy? Using image coords
    # (y down, x right) rotate by theta about the keypoint:
    rdx = c[:, None, None] * pdx[None] - s[:, None, None] * pdy[None]  # [K,256,2]
    rdy = s[:, None, None] * pdx[None] + c[:, None, None] * pdy[None]
    iy = ys[:, None, None] + jnp.round(rdy).astype(jnp.int32)
    ix = xs[:, None, None] + jnp.round(rdx).astype(jnp.int32)
    samples = _gather(blurred, iy, ix)  # [K, 256, 2]
    bits = (samples[..., 0] < samples[..., 1]).astype(jnp.uint32)  # [K, 256]
    from srba_slam_tpu.ops.bits import pack_bits

    desc = pack_bits(bits)
    desc = jnp.where(valid[:, None], desc, jnp.uint32(0))
    return desc, theta
