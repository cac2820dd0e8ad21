"""Pallas TPU kernel: single-pass FAST-9/16 corner scores.

The XLA formulation (srba_slam_tpu.ops.fast) materializes 16 shifted image
views plus rotate-min/max intermediates — ~24 HBM passes over the image. This
kernel DMAs one image row-band (+3-row halo) from HBM into VMEM and produces
that band's score rows in a single read + single write pass: the 16
Bresenham-circle taps become static slices of the VMEM band and the
contiguous-arc tests run in registers on the VPU.

Numerically identical to ``fast.fast_score_map`` (same taps, same
rotate-min/max reduction); verified against it by tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srba_slam_tpu.ops.fast import CIRCLE

_R = 3   # circle radius
_HALO = 8  # halo rows per side (Mosaic DMA slices must be 8-row aligned)


def _make_kernel(tile_h: int):
    def kernel(img_hbm, th_ref, out_ref, band, sem):
        i = pl.program_id(0)
        copy = pltpu.make_async_copy(
            img_hbm.at[pl.ds(i * tile_h, tile_h + 2 * _HALO), :], band, sem
        )
        copy.start()
        copy.wait()
        center = band[_HALO:_HALO + tile_h, :]
        th = th_ref[0]

        # contrast of each circle tap vs the center; x-shift wraps at the row
        # edge exactly like jnp.roll in the XLA version (border masked later)
        ds = []
        for (dy, dx) in CIRCLE:
            rows = band[_HALO + dy:_HALO + dy + tile_h, :]
            # pltpu.roll requires non-negative shift: out[x] = in[x + dx]
            # means rolling left by dx, i.e. rolling right by (w - dx)
            w_ = rows.shape[1]
            shifted = pltpu.roll(rows, (-dx) % w_, 1) if dx else rows
            ds.append(shifted - center)

        def window9(vals, combine):
            w3 = [combine(combine(vals[i_], vals[(i_ + 1) % 16]),
                          vals[(i_ + 2) % 16]) for i_ in range(16)]
            return [combine(combine(w3[i_], w3[(i_ + 3) % 16]),
                            w3[(i_ + 6) % 16]) for i_ in range(16)]

        min9 = window9(ds, jnp.minimum)
        max9 = window9(ds, jnp.maximum)
        bright = min9[0]
        dark = max9[0]
        for i_ in range(1, 16):
            bright = jnp.maximum(bright, min9[i_])
            dark = jnp.minimum(dark, max9[i_])
        score = jnp.maximum(bright, -dark)
        out_ref[:, :] = jnp.where(score > th, score, 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("margin", "tile_h", "interpret"))
def fast_score_map_pallas(img: jax.Array, threshold: jax.Array,
                          margin: int = 16, tile_h: int = 64,
                          interpret: bool = False) -> jax.Array:
    """Drop-in for ops.fast.fast_score_map backed by the Pallas kernel."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    gh = -(-h // tile_h)
    pad = gh * tile_h - h
    wp = -(-w // 128) * 128  # lane tiling: widths must be 128-aligned
    img_p = jnp.pad(img, ((_HALO, _HALO + pad), (0, wp - w)))
    th = jnp.reshape(jnp.asarray(threshold, jnp.float32), (1,))

    out = pl.pallas_call(
        _make_kernel(tile_h),
        grid=(gh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # full image stays in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),  # threshold scalar
        ],
        out_specs=pl.BlockSpec((tile_h, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gh * tile_h, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p, th)

    score = out[:h, :w]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (ys >= margin) & (ys < h - margin) & (xs >= margin) & (xs < w - margin)
    return jnp.where(inside, score, 0.0)


# --------------------------------------------------------------------------
# Fused, batched FAST + 5x5 keyed NMS (the round-3 frontend hot path).
#
# The detector feeds nms.local_max_suppress immediately in every caller, and
# both are memory-bound as separate XLA programs (the 16 shifted views alone
# are ~29 MB of HBM intermediates per image).  This kernel produces the
# SUPPRESSED score map for a whole batch of images in one read + one write
# per pixel: grid (image, row-band), one VMEM band with an 8-row halo per
# side, FAST arcs + margin mask + the row-major-keyed max-pool of
# nms.local_max_suppress all computed in registers.  Bit-exact vs
# ``local_max_suppress(fast_score_map(img, th, margin), radius)``:
# FAST scores are exact integers (min/max of integer differences), and the
# NMS tiebreak key ``score - eps*(y*W + x)`` is reproduced with the same f32
# rounding (same eps, same global row-major index).
# --------------------------------------------------------------------------


def _window9_scalarlist(ds, combine):
    """min/max over all 9-long circular windows; ds is a 16-list of arrays."""
    w3 = [combine(combine(ds[i], ds[(i + 1) % 16]), ds[(i + 2) % 16])
          for i in range(16)]
    return [combine(combine(w3[i], w3[(i + 3) % 16]), w3[(i + 6) % 16])
            for i in range(16)]


def _make_fast_nms_kernel(tile_h: int, h: int, w: int, wp: int, margin: int,
                          radius: int):
    nr = radius
    s_rows = tile_h + 2 * nr          # score rows computed (incl. NMS halo)

    def kernel(img_hbm, th_ref, out_ref, band, sem):
        n = pl.program_id(0)
        i = pl.program_id(1)
        copy = pltpu.make_async_copy(
            img_hbm.at[n, pl.ds(i * tile_h, tile_h + 2 * _HALO), :], band, sem
        )
        copy.start()
        copy.wait()
        th = th_ref[0]

        # FAST scores for rows [base-nr, base+tile_h+nr) where base=i*tile_h.
        # Score row r needs image rows r-3..r+3 = band rows (r-base)+_HALO±3.
        r0 = _HALO - nr               # band row of the first score row
        center = band[r0:r0 + s_rows, :]
        ds = []
        for (dy, dx) in CIRCLE:
            rows = band[r0 + dy:r0 + dy + s_rows, :]
            shifted = pltpu.roll(rows, (-dx) % wp, 1) if dx else rows
            ds.append(shifted - center)
        min9 = _window9_scalarlist(ds, jnp.minimum)
        max9 = _window9_scalarlist(ds, jnp.maximum)
        bright = min9[0]
        dark = max9[0]
        for j in range(1, 16):
            bright = jnp.maximum(bright, min9[j])
            dark = jnp.minimum(dark, max9[j])
        score = jnp.maximum(bright, -dark)
        score = jnp.where(score > th, score, 0.0)

        # margin mask BEFORE the pool (callers always suppress the masked map)
        ys = jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 0) \
            + i * tile_h - nr
        xs = jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 1)
        inside = ((ys >= margin) & (ys < h - margin)
                  & (xs >= margin) & (xs < w - margin))
        score = jnp.where(inside, score, 0.0)

        # keyed 5x5 max-pool (nms.local_max_suppress tiebreak, same f32 math)
        eps = jnp.float32(1e-3 / (h * w))
        keyed = score - eps * (ys * w + xs).astype(jnp.float32)
        # x-window max via lane rolls, then y-window max via row slices
        acc = keyed
        for dx in range(1, nr + 1):
            acc = jnp.maximum(acc, pltpu.roll(keyed, dx, 1))
            acc = jnp.maximum(acc, pltpu.roll(keyed, (-dx) % wp, 1))
        # output row t pools acc rows t+nr+dy, dy in [-nr, nr] (self included,
        # exactly like reduce_window SAME in nms.local_max_suppress)
        pooled = acc[0:tile_h, :]
        for dy in range(-nr + 1, nr + 1):
            pooled = jnp.maximum(pooled, acc[nr + dy:nr + dy + tile_h, :])
        c_keyed = keyed[nr:nr + tile_h, :]
        c_score = score[nr:nr + tile_h, :]
        out_ref[0, :, :] = jnp.where((c_keyed >= pooled) & (c_score > 0.0),
                                     c_score, 0.0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("margin", "radius", "tile_h", "interpret"))
def fast_nms_pallas(imgs: jax.Array, threshold: jax.Array, margin: int = 16,
                    radius: int = 2, tile_h: int = 40,
                    interpret: bool = False) -> jax.Array:
    """Suppressed FAST score maps for a batch of images.

    Drop-in for ``local_max_suppress(fast_score_map(img, th, margin), radius)``
    applied per image of ``imgs`` [N, H, W] (any float/uint8 dtype; cast to
    f32 on-chip).  Requires ``margin >= 3 + radius`` (every valid keypoint's
    support then stays clear of the pad/wrap borders, which is what makes the
    band formulation exact)."""
    assert margin >= 3 + radius, "margin must cover circle + NMS halo"
    imgs = imgs.astype(jnp.float32)
    n, h, w = imgs.shape
    gh = -(-h // tile_h)
    pad = gh * tile_h - h
    wp = -(-w // 128) * 128
    imgs_p = jnp.pad(imgs, ((0, 0), (_HALO, _HALO + pad), (0, wp - w)))
    th = jnp.reshape(jnp.asarray(threshold, jnp.float32), (1,))

    out = pl.pallas_call(
        _make_fast_nms_kernel(tile_h, h, w, wp, margin, radius),
        grid=(n, gh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wp), lambda ni, i: (ni, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, gh * tile_h, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(imgs_p, th)
    return out[:, :h, :w]


# --------------------------------------------------------------------------
# Image-wide upright ORB descriptor bit-planes.
#
# The per-keypoint formulation (ops/orb.py describe fast path) block-gathers
# one 33x33 patch per keypoint — 512 vmapped dynamic_slices per image, and
# that gather is ~85% of the whole frontend's device time on this TPU.  For
# UPRIGHT descriptors every one of the 256 (p, q) test pairs samples at a
# FIXED integer offset, so the TPU-native formulation is image-wide: compute
# bit_i(y, x) = blur(y+dy_p, x+dx_p) < blur(y+dy_q, x+dx_q) for every pixel
# as 256 shifted-view vector compares inside one row-band pass, pack them
# into 8 uint32 planes in registers, and let the caller point-gather K*8
# words at the keypoints (tiny).  Comparisons are on the same rounded-int
# f32 blur values as the patch path, so descriptors are bit-identical at
# every keypoint with full in-image support (margin >= 16; detector
# guarantees it).  Pixels closer than 16 px to a border see lane-wrap /
# zero-pad garbage and must not be gathered (same contract as patch_safe).
# --------------------------------------------------------------------------

_ORB_HALO = 16  # covers max |dy| of the pattern (13), rounded to 8-multiple


def _make_orb_kernel(tile_h: int, wp: int, pairs):
    # the 512 pattern samples share only ~27 distinct column shifts: roll
    # the whole band ONCE per distinct dx up front and serve every sample
    # as a cheap row slice of the pre-rolled copy — per-sample
    # pltpu.rolls (512 of them) were the kernel's dominant cost (~2x
    # overall kernel time, measured on v5e)
    dxs = sorted({dx for (_dy1, dx1, _dy2, dx2) in pairs
                  for dx in (dx1, dx2)})
    dx_slot = {dx: i for i, dx in enumerate(dxs)}

    def kernel(img_hbm, out_ref, band, rolled, sem):
        n = pl.program_id(0)
        i = pl.program_id(1)
        copy = pltpu.make_async_copy(
            img_hbm.at[n, pl.ds(i * tile_h, tile_h + 2 * _ORB_HALO), :],
            band, sem,
        )
        copy.start()
        copy.wait()

        for dx in dxs:
            rolled[dx_slot[dx]] = (
                pltpu.roll(band[:], (-dx) % wp, 1) if dx else band[:])

        def view(dy, dx):
            return rolled[dx_slot[dx],
                          _ORB_HALO + dy:_ORB_HALO + dy + tile_h, :]

        for j in range(8):
            acc = None
            for b in range(32):
                (dy1, dx1, dy2, dx2) = pairs[32 * j + b]
                cmp = view(dy1, dx1) < view(dy2, dx2)
                word = jnp.where(cmp, jnp.uint32(1 << b), jnp.uint32(0))
                acc = word if acc is None else acc | word
            out_ref[0, j, :, :] = acc

    return kernel, len(dxs)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def orb_bitplanes_pallas(blurred: jax.Array, tile_h: int = 40,
                         interpret: bool = False) -> jax.Array:
    """Packed upright-ORB bit-planes for a batch of BLURRED images.

    ``blurred``: [N, H, W] f32, already gauss_blur7-rounded (ops/orb.py).
    Returns uint32 [N, 8, HP, WP] with HP/WP the tile-padded dims; plane
    ``j`` holds descriptor bits 32j..32j+31 in the ops/bits.py little-endian
    order. Valid only at pixels >= 16 px inside the true image borders."""
    from srba_slam_tpu.ops.orb import _PATTERN_OPENCV

    import numpy as np

    pat = np.rint(_PATTERN_OPENCV).astype(np.int32)  # [256, 2, (dy,dx)]
    pairs = [(int(p[0, 0]), int(p[0, 1]), int(p[1, 0]), int(p[1, 1]))
             for p in pat]

    blurred = blurred.astype(jnp.float32)
    n, h, w = blurred.shape
    gh = -(-h // tile_h)
    pad = gh * tile_h - h
    wp = -(-w // 128) * 128
    imgs_p = jnp.pad(blurred,
                     ((0, 0), (_ORB_HALO, _ORB_HALO + pad), (0, wp - w)))

    kernel, n_dx = _make_orb_kernel(tile_h, wp, pairs)
    return pl.pallas_call(
        kernel,
        grid=(n, gh),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, tile_h, wp), lambda ni, i: (ni, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, gh * tile_h, wp), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _ORB_HALO, wp), jnp.float32),
            pltpu.VMEM((n_dx, tile_h + 2 * _ORB_HALO, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(imgs_p)


def orb_descriptors_pallas(blurred: jax.Array, ys: jax.Array, xs: jax.Array,
                           valid: jax.Array, tile_h: int = 40,
                           interpret: bool = False) -> jax.Array:
    """Upright ORB descriptors via image-wide bit-planes + point gather.

    Drop-in for the batched ``describe(..., oriented=False, patch_safe=True)``
    fast path (bit-identical; tests/test_pallas_fast.py): ``blurred``
    [N, H, W] f32 gauss_blur7 output, ``ys``/``xs`` [N, K] int32 keypoints
    with margin >= 16, ``valid`` [N, K] bool. Returns uint32 [N, K, 8]."""
    planes = orb_bitplanes_pallas(blurred, tile_h=tile_h, interpret=interpret)
    n, _, hp, wp = planes.shape
    flat = planes.reshape(n, 8, hp * wp)
    idx = jnp.clip(ys, 0, hp - 1) * wp + jnp.clip(xs, 0, wp - 1)  # [N, K]
    d = jax.vmap(lambda f, i: f[:, i])(flat, idx)                 # [N, 8, K]
    return jnp.where(valid[..., None], jnp.transpose(d, (0, 2, 1)),
                     jnp.uint32(0))
