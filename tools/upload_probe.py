"""Measure tunnel upload throughput under different chunking/threading
shapes, to pick the fastest frame-staging strategy for _FrameUploader.

Each trial ships the same ~18 MB of uint8 (40 KITTI-size frames), then
syncs with ONE device_get of a tiny on-device reduction over every staged
array (so the measurement includes transfer completion, not just enqueue).
"""

from __future__ import annotations

import json
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

H, W = 370, 1226
N = 40  # frames (one eye each): N * 0.45 MB ≈ 18 MB


def _mk(n):
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (H, W), np.uint8) for _ in range(n)]


def _sync(devs):
    s = jnp.stack([d.astype(jnp.int32).sum() for d in devs]).sum()
    return jax.device_get(s)


def trial_chunked(frames, chunk):
    t0 = time.perf_counter()
    devs = []
    for i in range(0, len(frames), chunk):
        devs.append(jnp.asarray(np.stack(frames[i:i + chunk])))
    _sync(devs)
    return time.perf_counter() - t0


def trial_threads(frames, n_threads, chunk=1):
    devs = [None] * ((len(frames) + chunk - 1) // chunk)
    idxs = list(range(len(devs)))
    lock = threading.Lock()

    def work():
        while True:
            with lock:
                if not idxs:
                    return
                i = idxs.pop(0)
            arr = np.stack(frames[i * chunk:(i + 1) * chunk])
            devs[i] = jnp.asarray(arr)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=work) for _ in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    _sync([d for d in devs if d is not None])
    return time.perf_counter() - t0


def main():
    frames = _mk(N)
    mb = N * H * W / 1e6
    # warm: one small upload + sync to leave cold-start out of trials
    _sync([jnp.asarray(frames[0])])
    out = {}
    for name, fn in [
        ("chunk1", lambda: trial_chunked(frames, 1)),
        ("chunk5", lambda: trial_chunked(frames, 5)),
        ("chunk10", lambda: trial_chunked(frames, 10)),
        ("chunk40", lambda: trial_chunked(frames, 40)),
        ("thr2_c1", lambda: trial_threads(frames, 2, 1)),
        ("thr4_c1", lambda: trial_threads(frames, 4, 1)),
        ("thr4_c5", lambda: trial_threads(frames, 4, 5)),
        ("thr8_c1", lambda: trial_threads(frames, 8, 1)),
    ]:
        best = min(fn() for _ in range(2))
        out[name] = round(mb / best, 1)  # MB/s
    out["unit"] = "MB/s"
    out["backend"] = jax.devices()[0].platform
    print(json.dumps(out))


if __name__ == "__main__":
    main()
