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
            pl.BlockSpec(memory_space=pltpu.ANY),   # full image stays in HBM
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
