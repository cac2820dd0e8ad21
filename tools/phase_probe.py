"""Phase breakdown probe for the batched tunnel loop.

Monkeypatches the hot methods of SRBAStereoSLAMEstimator to time where the
wall clock goes per batch on the live backend:

  * pull      — the ONE blocking bulk_pull per batch
  * dispatch  — enqueuing vo_scan / fused-check programs (async RPCs)
  * host      — per-frame keyframe logic between transfers
  * upnext    — waiting on the uploader queue (upload-bandwidth bound)

Prints one JSON line with per-phase totals (seconds) and fps, so bench
regressions can be attributed to a phase instead of re-guessing the
latency model each time.  Run standalone: `python tools/phase_probe.py`.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo root on path)
from srba_slam_tpu.models import estimator as est_mod  # noqa: E402
from srba_slam_tpu.utils import pull as pull_mod  # noqa: E402

PHASES = {"pull": 0.0, "dispatch": 0.0, "host": 0.0, "upnext": 0.0}
COUNTS = {"pull": 0, "dispatch": 0, "upnext": 0}


def _wrap(obj, name, phase, count=False):
    orig = getattr(obj, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(*a, **kw)
        finally:
            PHASES[phase] += time.perf_counter() - t0
            if count:
                COUNTS[phase] += 1

    setattr(obj, name, timed)
    return orig


def main():
    # PROBE_BATCH overrides the tunnel batch size (pull-cadence experiments
    # — VERDICT r4 #3); WARMUP stays one full batch + bootstrap
    if os.environ.get("PROBE_BATCH"):
        bench.BATCH = int(os.environ["PROBE_BATCH"])
        bench.WARMUP_FRAMES = 1 + bench.BATCH
    bench._enable_persistent_compile_cache()
    cam, frames = bench._build_workload()
    frames = frames[: bench.WARMUP_FRAMES + bench.TIMED_FRAMES]
    import jax

    # throwaway FULL pass: in-process jit caches absorb every program the
    # timed pass will hit (later-KF-count window solves compile mid-run and
    # would land in "other" otherwise)
    est = bench._build_estimator(cam)
    est.perform_stereo_slam_batched(frames, batch=bench.BATCH)
    est.rba.flush()
    jax.block_until_ready(est.vo.last_frame().desc_l)

    est = bench._build_estimator(cam)
    est.perform_stereo_slam_batched(frames[: bench.WARMUP_FRAMES],
                                    batch=bench.BATCH)
    est.rba.flush()
    jax.block_until_ready(est.vo.last_frame().desc_l)

    # instrument AFTER warmup so compile time never pollutes the phases
    _wrap(pull_mod, "bulk_pull", "pull", count=True)
    est_mod.bulk_pull = pull_mod.bulk_pull  # rebind the module-level import
    orig_dispatch = _wrap(est_mod.SRBAStereoSLAMEstimator, "_dispatch_scan",
                          "dispatch", count=True)
    _wrap(est_mod._FrameUploader, "next", "upnext", count=True)
    orig_pf = _wrap(est_mod.SRBAStereoSLAMEstimator, "_process_frames", "host")

    t0 = time.perf_counter()
    est.perform_stereo_slam_batched(frames[bench.WARMUP_FRAMES:],
                                    batch=bench.BATCH)
    est.rba.flush()
    jax.block_until_ready(est.vo.last_frame().desc_l)
    total = time.perf_counter() - t0

    est_mod.SRBAStereoSLAMEstimator._dispatch_scan = orig_dispatch
    est_mod.SRBAStereoSLAMEstimator._process_frames = orig_pf

    other = total - sum(PHASES.values())
    # in-run uploader telemetry (measured on the worker thread, same
    # seconds as the phases): effective link speed DURING this run, the
    # uploader's busy seconds, and how much of that busy time the main
    # thread actually waited for (upnext) vs hid behind pulls/compute —
    # distinguishes "link was slow" from "pipeline failed to overlap"
    ups = [u for u in est.lat.get("uploads", []) if u["t1"] >= t0]
    up_busy = sum(u["t1"] - u["t0"] for u in ups)
    up_bytes = sum(u["bytes"] for u in ups)
    print(json.dumps({
        "fps": round(bench.TIMED_FRAMES / total, 2),
        "total_s": round(total, 3),
        **{k: round(v, 3) for k, v in PHASES.items()},
        "counts": COUNTS,
        "other_s": round(other, 3),
        "upload_busy_s": round(up_busy, 3),
        "upload_MB": round(up_bytes / 1e6, 1),
        "upload_MBps_in_run": round(up_bytes / 1e6 / up_busy, 1)
        if up_busy else None,
        "upload_hidden_s": round(up_busy - PHASES["upnext"], 3),
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
