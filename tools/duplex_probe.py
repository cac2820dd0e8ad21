"""Does an in-flight blocking pull stall uploads on this tunnel?

Round-2 probes concluded uploads overlap blocking syncs ("full-duplex"),
and the batched tunnel loop was designed on that model (stage uploads two
batches ahead so the link never idles). The round-5 phase probe
contradicts it at batch 20: upload wait ~= the SERIAL upload time of the
whole payload even though the loop spends ~0.7 s in pulls/compute that
should have hidden it (/tmp/pp20.json, 2026-08-19). This probe measures
the interaction directly:

  A. upload 18 MB alone (uploader thread), time to completion
  B. blocking pulls alone (device_get of a fresh tiny reduction per
     iteration, ~31 ms RTT floor each), N iterations
  C. both at once: uploader thread ships the same 18 MB while the main
     thread runs the same N blocking pulls

If the tunnel is full-duplex, C's upload time ~= A and C's pull RTTs ~= B.
If a pull RPC blocks upload progress (single connection / head-of-line),
C's upload time ~= A + B's total.

Run standalone on the TPU: `python tools/duplex_probe.py`.
"""

from __future__ import annotations

import json
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

H, W, N = 370, 1226, 40  # ~18 MB of uint8


def _frames():
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (H, W), np.uint8) for _ in range(N)]


def upload_all(frames, out):
    t0 = time.perf_counter()
    devs = [jnp.asarray(f) for f in frames]
    s = jnp.stack([d.astype(jnp.int32).sum() for d in devs]).sum()
    jax.device_get(s)  # completion, not just enqueue
    out["upload_s"] = time.perf_counter() - t0


@jax.jit
def _fresh(x):
    return (x * x).sum()


def pulls(n, out):
    rtts = []
    x = jnp.arange(128.0)
    for i in range(n):
        t0 = time.perf_counter()
        jax.device_get(_fresh(x + i))  # unready data -> true blocking sync
        rtts.append(time.perf_counter() - t0)
    out["pull_rtts_ms"] = [round(r * 1e3, 1) for r in rtts]
    out["pulls_total_s"] = sum(rtts)


def main():
    frames = _frames()
    # warm: one upload + one pull
    jax.device_get(_fresh(jnp.asarray(frames[0]).astype(jnp.float32).ravel()[:128]))

    a = {}
    upload_all(frames, a)

    b = {}
    n_pulls = max(4, int(a["upload_s"] / 0.04))  # pulls span ~the upload time
    pulls(n_pulls, b)

    c_up, c_pull = {}, {}
    th = threading.Thread(target=upload_all, args=(frames, c_up))
    t0 = time.perf_counter()
    th.start()
    pulls(n_pulls, c_pull)
    th.join()
    c_wall = time.perf_counter() - t0

    # A2: upload alone AGAIN, after ~6 s of traffic — first run (2026-08-19)
    # measured A 4.6 MB/s but C (concurrent with pulls) 32 MB/s; A2 decides
    # whether that was link ramp-up/contention (A2 fast) or a genuine
    # needs-concurrent-RPC-traffic pathology (A2 slow again)
    a2 = {}
    upload_all(frames, a2)

    mb = N * H * W / 1e6
    print(json.dumps({
        "payload_MB": round(mb, 1),
        "A_upload_alone_s": round(a["upload_s"], 3),
        "A_MBps": round(mb / a["upload_s"], 1),
        "B_pulls_alone_s": round(b["pulls_total_s"], 3),
        "B_n_pulls": n_pulls,
        "B_rtt_ms_p50": sorted(b["pull_rtts_ms"])[n_pulls // 2],
        "C_upload_during_pulls_s": round(c_up["upload_s"], 3),
        "C_pulls_during_upload_s": round(c_pull["pulls_total_s"], 3),
        "C_rtt_ms_p50": sorted(c_pull["pull_rtts_ms"])[n_pulls // 2],
        "C_wall_s": round(c_wall, 3),
        "A2_upload_alone_after_s": round(a2["upload_s"], 3),
        "A2_MBps": round(mb / a2["upload_s"], 1),
        "full_duplex_if_~1": round(c_up["upload_s"] / a["upload_s"], 2),
        "serialized_if_~1": round(
            c_up["upload_s"] / (a["upload_s"] + b["pulls_total_s"]), 2),
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
