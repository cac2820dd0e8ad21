"""Group window-solve path comparison: vmapped lanes vs serial lax.scan.

The WINDOW_SLOTS group program (ops/window_ba.optimize_windows_batch_blob)
can run its 8 slots either vmapped (lock-step LM; padded slots run too) or
as a serial lax.scan with lax.cond skipping invalid slots. The right
choice depends on whether one window's per-iteration ops are latency- or
bandwidth-bound on the real device, and on the typical group FILL (the
eager half-group dispatch in models/srba.py sends groups of 4+). This
probe times both paths at fills 2 / 4 / 8 on the live backend for the
common bucket (C=16, L=1024, O=2048).

Run: `timeout 1800 python tools/group_solve_probe.py [C L O]`
(default bucket 16 1024 2048; the street workload's windows land in the
first rung, 8 512 1024)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import srba_slam_tpu.ops.window_ba as wba
    from test_window_ba import CAM, _make_window
    from srba_slam_tpu.ops.window_ba import WINDOW_SLOTS, pack_window

    rng = np.random.default_rng(0)
    C, L, O = (16, 1024, 2048) if len(sys.argv) < 4 else (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
    kw = dict(kernel_param=1.5, max_iters=12, stage1_iters=2)

    # fill ~70-80% of the bucket's obs capacity (obs ~= 8.7 per landmark at
    # n_cams=6 in _make_window); the default bucket reproduces the round-4
    # measurement (240+ lms), smaller buckets scale down
    base_lms = min(240, O // 12)
    grow = 9 if base_lms >= 240 else 1
    wins = [_make_window(rng, n_cams=6, n_lms=base_lms + grow * i,
                         C=C, L=L, O=O, px_noise=0.3)[0]
            for i in range(WINDOW_SLOTS)]
    packed = [pack_window(
        np.asarray(w.cam_pose), np.asarray(w.cam_valid),
        np.asarray(w.lm_pos), np.asarray(w.lm_base), np.asarray(w.lm_valid),
        np.asarray(w.obs_cam), np.asarray(w.obs_lm), np.asarray(w.obs_px),
        np.asarray(w.obs_valid)) for w in wins]

    out = {"bucket": [C, L, O], "backend": jax.devices()[0].platform}
    for path, limit in (("vmap", 10 ** 12), ("scan", 0)):
        wba._VMAP_LO_LIMIT = limit
        # fresh jit cache per path: the static args are identical, so clear
        wba.optimize_windows_batch_blob.clear_cache()
        for fill in (2, 4, 8):
            ints = np.stack([packed[i % fill][0]
                             for i in range(WINDOW_SLOTS)])
            floats = np.stack([packed[i % fill][1]
                               for i in range(WINDOW_SLOTS)])
            valids = np.arange(WINDOW_SLOTS) < fill
            args = (jnp.asarray(ints), jnp.asarray(floats),
                    jnp.asarray(valids))
            r = wba.optimize_windows_batch_blob(*args, C, L, O, CAM, **kw)
            jax.device_get(np.asarray(r[0, :1]))  # compile + warm
            reps, ts = 3, []
            for _ in range(reps):
                t0 = time.perf_counter()
                r = wba.optimize_windows_batch_blob(*args, C, L, O, CAM,
                                                    **kw)
                jax.device_get(np.asarray(r[0, :1]))
                ts.append(time.perf_counter() - t0)
            out[f"{path}_fill{fill}_ms"] = round(min(ts) * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
