"""Tunnel-loop batch-size sweep, interleaved in ONE process (VERDICT r4 #3).

Cross-process comparisons of the tunnel loop are meaningless — the shared
link moved 72 -> ~23 MB/s between two phase-probe runs 10 minutes apart
(2026-08-19). This probe times the REAL tunnel loop (fresh estimator per
pass, frames fed from host exactly as bench.py's timed section) at several
batch sizes round-robin inside one process, with a link-bandwidth sample
between rounds, and reports best/median fps per size plus the link trace.
Best-per-size under round-robin is as contention-fair as this pool gets.

Run standalone on the TPU: `python tools/batch_sweep_probe.py`.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

import bench  # noqa: E402

SIZES = (10, 20, 30, 60)
ROUNDS = 3


def main():
    import jax
    import jax.numpy as jnp

    bench._enable_persistent_compile_cache()
    cam, frames = bench._build_workload()
    n_need = 1 + max(SIZES) + bench.TIMED_FRAMES
    frames = frames[:n_need]

    def one_pass(batch):
        est = bench._build_estimator(cam)
        warm = 1 + batch  # bootstrap + one full batch, same as bench.py
        est.perform_stereo_slam_batched(frames[:warm], batch=batch)
        est.rba.flush()
        jax.block_until_ready(est.vo.last_frame().desc_l)
        timed = frames[warm:warm + bench.TIMED_FRAMES]
        t0 = time.perf_counter()
        est.perform_stereo_slam_batched(timed, batch=batch)
        est.rba.flush()
        jax.block_until_ready(est.vo.last_frame().desc_l)
        return len(timed) / (time.perf_counter() - t0)

    def link_sample():
        payload = np.stack([f[0] for f in frames[:10]])  # ~4.5 MB
        t0 = time.perf_counter()
        d = jnp.asarray(payload)
        jax.device_get(d.astype(jnp.int32).sum())
        return payload.nbytes / 1e6 / (time.perf_counter() - t0)

    # warm every batch shape's programs once (compiles outside timing)
    for b in SIZES:
        one_pass(b)

    fps = {b: [] for b in SIZES}
    links = []
    for _round in range(ROUNDS):
        links.append(round(link_sample(), 1))
        for b in SIZES:
            fps[b].append(round(one_pass(b), 2))
    links.append(round(link_sample(), 1))

    out = {
        "timed_frames": bench.TIMED_FRAMES,
        "link_MBps_trace": links,
        "per_batch": {
            str(b): {"fps_runs": fps[b],
                     "best": max(fps[b]),
                     "median": sorted(fps[b])[len(fps[b]) // 2]}
            for b in SIZES},
        "backend": jax.devices()[0].platform,
    }
    mb = sum(f[0].nbytes + f[1].nbytes
             for f in frames[1:1 + bench.TIMED_FRAMES]) / 1e6
    out["upload_bound_fps_at_best_link"] = round(
        max(links) * bench.TIMED_FRAMES / mb, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
