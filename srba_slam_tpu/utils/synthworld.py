"""Synthetic stereo-world renderer (tests, benchmarks, demos).

Renders a textured, tilted plane seen from a moving rectified stereo rig —
ray-plane intersection + bilinear texture sampling, all in numpy. Gives
pixel-accurate ground-truth camera motion for VO / SLAM tests without any
dataset dependency.
"""

from __future__ import annotations

import numpy as np

from srba_slam_tpu.utils import se3
import jax.numpy as jnp


def smooth_texture(rng, h=2048, w=2048, spacing=48, sigma=6.0):
    """Multi-scale field of anisotropic Gaussian blobs on a dark floor.

    Gives FAST corners with well-separated, persistent scores — the
    detector's top-K selection is then repeatable across small viewpoint
    changes, like on natural images (smooth noise textures produce thousands
    of near-tied weak corners and pathological selection churn). Three blob
    octaves + random elongation/orientation make each corner's BRIEF
    neighborhood spatially unique: a single-scale lattice of symmetric blobs
    produces near-identical descriptors everywhere, and that translation
    symmetry aliases inter-keyframe matching and fakes/breaks loop closures.
    """
    tex = np.full((h, w), 20.0, np.float32)

    def stamp_layer(spacing_l, sigma_l, amp_lo, amp_hi, signed=False):
        rad = int(3 * sigma_l)
        lo = rad + spacing_l // 2
        win = np.arange(-rad, rad + 1)
        gy, gx = np.meshgrid(win, win, indexing="ij")
        for y0 in np.arange(lo, h - lo, spacing_l):
            for x0 in np.arange(lo, w - lo, spacing_l):
                cy = y0 + rng.uniform(-spacing_l / 3, spacing_l / 3)
                cx = x0 + rng.uniform(-spacing_l / 3, spacing_l / 3)
                amp = rng.uniform(amp_lo, amp_hi)
                if signed and rng.uniform() < 0.5:
                    amp = -amp
                iy, ix = int(round(cy)), int(round(cx))
                fy, fx = cy - iy, cx - ix
                sx = sigma_l * rng.uniform(0.55, 1.5)
                sy = sigma_l * rng.uniform(0.55, 1.5)
                th = rng.uniform(0.0, np.pi)
                ct, st = np.cos(th), np.sin(th)
                u = ct * (gx - fx) + st * (gy - fy)
                v = -st * (gx - fx) + ct * (gy - fy)
                blob = amp * np.exp(-(u**2 / sx**2 + v**2 / sy**2) / 2)
                tex[iy - rad : iy + rad + 1, ix - rad : ix + rad + 1] += \
                    blob.astype(np.float32)

    # coarse backdrop octaves (signed: bright and dark patches) give every
    # fine corner a unique large-scale context; the fine layer provides the
    # actual FAST corners
    stamp_layer(spacing * 4, sigma * 4, 25.0, 60.0, signed=True)
    stamp_layer(spacing * 2, sigma * 2, 20.0, 50.0, signed=True)
    stamp_layer(spacing, sigma, 40.0, 235.0)
    return np.clip(tex, 0.0, 255.0)


def _bilinear(tex, u, v):
    """Bilinear sample with wrap-around (the texture tiles, so planes are
    effectively infinite)."""
    h, w = tex.shape
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    fu, fv = u - u0, v - v0
    u0 %= w
    v0 %= h
    u1 = (u0 + 1) % w
    v1 = (v0 + 1) % h
    t00 = tex[v0, u0]
    t01 = tex[v0, u1]
    t10 = tex[v1, u0]
    t11 = tex[v1, u1]
    return (
        t00 * (1 - fu) * (1 - fv)
        + t01 * fu * (1 - fv)
        + t10 * (1 - fu) * fv
        + t11 * fu * fv
    )


class PlaneScene:
    """Textured plane n·x = d in world coordinates (default: tilted frontal
    plane ~12m away). Rays that miss the plane (behind the camera or beyond
    max_range) render black.

    ``PlaneScene.ground(rng)`` builds the long-sequence variant: an infinite
    tiled ground plane 1.5 m below the camera (KITTI-like road geometry) that
    never runs out however far the camera drives.
    """

    def __init__(self, rng, normal=(0.05, 0.08, -1.0), d=-12.0, tex_scale=60.0,
                 max_range=200.0):
        self.tex = smooth_texture(rng)
        n = np.asarray(normal, np.float64)
        self.n = n / np.linalg.norm(n)
        self.d = d / np.linalg.norm(np.asarray(normal, np.float64))
        self.tex_scale = tex_scale  # texture pixels per world meter
        self.max_range = max_range
        # in-plane texture basis (orthonormal, ⟂ n)
        a = np.array([1.0, 0.0, 0.0])
        if abs(self.n @ a) > 0.9:
            a = np.array([0.0, 1.0, 0.0])
        self.e1 = np.cross(self.n, a)
        self.e1 /= np.linalg.norm(self.e1)
        self.e2 = np.cross(self.n, self.e1)

    @staticmethod
    def ground(rng, height=1.5, tex_scale=24.0):
        """Infinite tiled ground plane `height` meters below the camera
        (camera convention: x right, y DOWN, z forward)."""
        return PlaneScene(rng, normal=(0.0, 1.0, 0.0), d=height,
                          tex_scale=tex_scale, max_range=120.0)

    def render(self, cam, pose_wc: np.ndarray):
        """Render the stereo pair for a camera at world pose `pose_wc`
        ([6] rotvec+trans; camera looks +z, x right, y down)."""
        R, t = se3.exp(jnp.asarray(pose_wc, jnp.float32))
        R = np.asarray(R, np.float64)
        t = np.asarray(t, np.float64)
        h, w = cam.height, cam.width
        us, vs = np.meshgrid(np.arange(w), np.arange(h))

        def render_eye(cx, cy, fx, fy, origin):
            dirs = np.stack(
                [(us - cx) / fx, (vs - cy) / fy, np.ones_like(us, np.float64)], -1
            )
            dirs_w = dirs @ R.T
            denom = dirs_w @ self.n
            lam = (self.d - origin @ self.n) / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
            pts = origin[None, None, :] + lam[..., None] * dirs_w
            u_t = (pts @ self.e1) * self.tex_scale + self.tex.shape[1] / 2
            v_t = (pts @ self.e2) * self.tex_scale + self.tex.shape[0] / 2
            img = _bilinear(self.tex, u_t, v_t)
            # rays that miss the plane (behind camera / horizon / too far)
            visible = (lam > 0.0) & (lam < self.max_range)
            # 8-bit output (what a real camera delivers; keeps host->device
            # uploads at 1 byte/px — the tunnel is bandwidth-limited)
            img = np.where(visible, img, 0.0)
            return np.clip(np.rint(img), 0.0, 255.0).astype(np.uint8)

        left = render_eye(cam.cx_l, cam.cy_l, cam.fx_l, cam.fy_l, t)
        right_origin = t + R @ np.array([cam.baseline, 0.0, 0.0])
        right = render_eye(cam.cx_r, cam.cy_r, cam.fx_r, cam.fy_r, right_origin)
        return left, right
