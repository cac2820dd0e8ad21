"""Attribute the detect/describe frontend's device cost stage by stage.

tools/scan_phase_probe.py shows the 20-frame vo_scan is ~95% frontend
(detect+describe+match), ~2 ms/frame. This probe times each stage on the
same [2B, H, W] image batch the scan sees (both eyes):

  * fast_nms   — fused Pallas FAST+NMS score pass
  * grid_topk  — per-cell winner + global lax.top_k(k) selection
  * blur7      — 7x7 Gaussian for BRIEF sampling
  * orb_desc   — Pallas bit-plane descriptor pass + point gather
  * stereo     — stereo_match on the detected sets
  * track      — inter-frame match + solve chain (residual of scan)

Run: `timeout 1800 python tools/frontend_phase_probe.py [--cpu] [--n 10]`
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_srba"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import bench as B
    from srba_slam_tpu.models.vo import default_use_pallas
    from srba_slam_tpu.ops.nms import grid_topk, local_max_suppress
    from srba_slam_tpu.ops.fast import fast_score_map
    from srba_slam_tpu.ops.orb import gauss_blur7

    cam, frames = B._build_workload()
    bb = B.BATCH
    imgs = np.stack([f[i] for f in frames[1:1 + bb] for i in (0, 1)])
    imgs = jnp.asarray(imgs.astype(np.float32))  # [2B, H, W]
    jax.device_get(np.asarray(imgs[:1, :1, :1]))
    use_pallas = default_use_pallas() and not args.cpu

    fast_th, k, cell, radius, margin = 20.0, 512, 5, 2, 16

    if use_pallas:
        from srba_slam_tpu.ops.pallas_fast import (
            fast_nms_pallas, orb_descriptors_pallas,
        )

        f_fast = jax.jit(lambda im: fast_nms_pallas(
            im, fast_th, margin=margin, radius=radius))
    else:
        f_fast = jax.jit(jax.vmap(lambda im: local_max_suppress(
            fast_score_map(im, fast_th, margin=margin), radius=radius)))

    f_topk = jax.jit(jax.vmap(
        functools.partial(grid_topk, cell=cell, k=k)))
    f_blur = jax.jit(jax.vmap(gauss_blur7))

    def sync1(out):
        # slice ON DEVICE before pulling: np.asarray(leaf) would device_get
        # the whole array (72 MB for a score map — seconds through the
        # tunnel); a device-side scalar slice pulls 4 bytes
        leaf = jax.tree.leaves(out)[0]
        jax.device_get(leaf.ravel()[0])

    def timeit(fn, *a):
        out = fn(*a)
        sync1(out)
        t0 = time.perf_counter()
        for _ in range(args.n):
            out = fn(*a)
        sync1(out)
        return (time.perf_counter() - t0) / args.n, out

    out = {"backend": jax.devices()[0].platform, "imgs": int(imgs.shape[0]),
           "pallas": bool(use_pallas), "n": args.n}
    t, s = timeit(f_fast, imgs)
    out["fast_nms_ms"] = round(t * 1e3, 2)
    t, det = timeit(f_topk, s)
    out["grid_topk_ms"] = round(t * 1e3, 2)
    ys, xs, sc, valid = det
    t, blurred = timeit(f_blur, imgs)
    out["blur7_ms"] = round(t * 1e3, 2)
    if use_pallas:
        f_desc = jax.jit(lambda b, y, x, v: orb_descriptors_pallas(
            b, y, x, v, tile_h=24))
        t, desc = timeit(f_desc, blurred, ys, xs, valid)
        out["orb_desc_ms"] = round(t * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
