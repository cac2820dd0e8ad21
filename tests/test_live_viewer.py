"""Live map viewer: the HTTP-served, polling equivalent of the reference's
live CDisplayWindow3D (reference src/CSRBAStereoSLAMEstimator.cpp:1262-1338
— per-keyframe refresh of an interactive 3D view). Headless contract: a
stdlib server roots the run's out_dir, the live page polls live_map.json
once a second, and the estimator's per-keyframe snapshot keeps it current.
"""

from __future__ import annotations

import json
import urllib.request

import numpy as np
import pytest


def test_live_page_polls_json(tmp_path):
    from srba_slam_tpu.utils.html_viewer import write_live_viewer

    p = tmp_path / "live_viewer.html"
    assert write_live_viewer(str(p))
    html = p.read_text()
    assert "__DATA__" not in html
    assert "live_map.json" in html          # polling target
    assert "const D0 = null" in html        # live mode marker


def test_live_server_serves_page_and_json(tmp_path):
    from srba_slam_tpu.utils.html_viewer import build_map_data
    from srba_slam_tpu.utils.live_server import start_live_server

    poses = np.zeros((4, 6))
    poses[:, 3] = np.arange(4)
    data = build_map_data(poses, edges=[(0, 1, "submap")],
                          query_scores=[0.3], query_score_th=0.05,
                          kf_frames=[0, 2, 4, 6])
    (tmp_path / "live_map.json").write_text(json.dumps(data))

    srv, port = start_live_server(str(tmp_path), port=0)
    try:
        root = urllib.request.urlopen(
            f"http://localhost:{port}/", timeout=10).read().decode()
        assert "<canvas" in root and "live_map.json" in root
        got = json.loads(urllib.request.urlopen(
            f"http://localhost:{port}/live_map.json", timeout=10).read())
        assert got["traj"] == data["traj"]
        assert got["edges"] == [[0, 1, "submap"]]
    finally:
        srv.shutdown()


def test_estimator_live_snapshot_writes_json(tmp_path):
    """The per-keyframe show3D snapshot emits live_map.json alongside
    live_map.png, with the mid-run trajectory and typed edges."""
    from srba_slam_tpu.utils.framesource import SyntheticSource
    from tests.test_estimator import make_estimator, small_cam

    est = make_estimator()
    est.general.show3D = True
    est.general.out_dir = str(tmp_path)
    for left, right in SyntheticSource(small_cam(), n_frames=8, seed=11,
                                       step=0.12):
        est.step(left, right)
    assert est.store.n_kfs >= 1
    live = json.loads((tmp_path / "live_map.json").read_text())
    assert len(live["traj"]) == est.store.n_kfs
    assert len(live["frusta"]) == est.store.n_kfs
    for e in live["edges"]:
        assert e[2] in ("submap", "base", "lc")
    assert (tmp_path / "live_map.png").exists()
