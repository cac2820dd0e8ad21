"""Measure strict solve scheduling (solve_sync) cost post-bulk-pull
(VERDICT r3 #5).

``solve_sync=True`` flushes the SRBA window solve immediately after every
keyframe insertion (one blocking pull per insert) instead of queueing
solves into the next batch boundary's single bulk pull. Strict mode gives
1e-5-level pose agreement with per-frame stepping; pipelined mode can
differ at the decimeter level through the window-BA init-anchor prior
(tests/test_batch_mode.py gates it at 0.15 m). This probe runs the
device-resident loop both ways and reports fps + the keyframe-pose
disagreement, so the batched-mode default can be chosen on a measured
number (BASELINE.md records it).

Run standalone: `python tools/solve_sync_probe.py`.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def run_devres(est, chunks):
    import jax

    disp = est._dispatch_scan(*chunks[0])
    i = 0
    while disp is not None:
        nf = None
        if i + 1 < len(chunks):
            nf = (lambda cd, c=chunks[i + 1]:
                  est._dispatch_scan(*c, chain=cd))
        disp = est._process_scan(disp, nf)
        i += 1
    est._finish_batched()
    est.rba.flush()
    jax.device_get(np.asarray(est.vo._last_pose_inc))


def one_pass(cam, frames, chunks_of, solve_sync, timed=True):
    import jax

    est = bench._build_estimator(cam)
    est.solve_sync = solve_sync
    est.perform_stereo_slam_batched(frames[: bench.WARMUP_FRAMES],
                                    batch=bench.BATCH)
    est.rba.flush()
    chunks = chunks_of(est)
    jax.block_until_ready(est.vo.last_frame().desc_l)
    t0 = time.perf_counter()
    run_devres(est, chunks)
    dt = time.perf_counter() - t0
    return est, bench.TIMED_FRAMES / dt


def main():
    import jax
    import jax.numpy as jnp

    bench._enable_persistent_compile_cache()
    cam, frames = bench._build_workload()
    frames = frames[: bench.WARMUP_FRAMES + bench.TIMED_FRAMES]

    def chunks_of(est):
        chunks = []
        for c0 in range(bench.WARMUP_FRAMES, len(frames), bench.DEV_BATCH):
            chunk = frames[c0:c0 + bench.DEV_BATCH]
            chunks.append((jnp.asarray(np.stack([f[0] for f in chunk])),
                           jnp.asarray(np.stack([f[1] for f in chunk]))))
        jax.block_until_ready(chunks)
        return chunks

    # warm both variants' programs, then time (best of 2 each, interleaved
    # to decorrelate pool contention)
    one_pass(cam, frames, chunks_of, False, timed=False)
    one_pass(cam, frames, chunks_of, True, timed=False)
    fps_pipe, fps_sync = 0.0, 0.0
    est_pipe = est_sync = None
    for _ in range(2):
        e, f = one_pass(cam, frames, chunks_of, False)
        if f > fps_pipe:
            fps_pipe, est_pipe = f, e
        e, f = one_pass(cam, frames, chunks_of, True)
        if f > fps_sync:
            fps_sync, est_sync = f, e

    ka = [r.inserted_kf for r in est_pipe.step_log]
    kb = [r.inserted_kf for r in est_sync.step_log]
    n = min(est_pipe.store.n_kfs, est_sync.store.n_kfs)
    dpose = float(np.max(np.linalg.norm(
        est_pipe.rba.kf_global[:n, 3:] - est_sync.rba.kf_global[:n, 3:],
        axis=1))) if n else 0.0
    print(json.dumps({
        "device_resident_fps_pipelined": round(fps_pipe, 2),
        "device_resident_fps_solve_sync": round(fps_sync, 2),
        "sync_cost_pct": round(100.0 * (1.0 - fps_sync / fps_pipe), 1),
        "decisions_identical": ka == kb,
        "n_kfs": [est_pipe.store.n_kfs, est_sync.store.n_kfs],
        "max_kf_pos_disagreement_m": round(dpose, 4),
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
