import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.utils.stats import VerboseLogger, compute_dispersion
from srba_slam_tpu.utils.viz import render_map_png


def test_dispersion_reference_formula(rng):
    xs = rng.uniform(0, 100, 64).astype(np.float32)
    ys = rng.uniform(0, 50, 64).astype(np.float32)
    valid = np.ones(64, bool)
    sx, sy = compute_dispersion(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(valid))
    # reference: sqrt of SUM of squared deviations (utils.h:554-555)
    exp_x = np.sqrt(((xs - xs.mean()) ** 2).sum())
    exp_y = np.sqrt(((ys - ys.mean()) ** 2).sum())
    np.testing.assert_allclose(float(sx), exp_x, rtol=1e-5)
    np.testing.assert_allclose(float(sy), exp_y, rtol=1e-5)


def test_dispersion_masked(rng):
    xs = np.concatenate([rng.uniform(0, 10, 32), np.full(32, 1e6)]).astype(np.float32)
    ys = xs.copy()
    valid = np.arange(64) < 32
    sx, _ = compute_dispersion(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(valid))
    assert float(sx) < 100.0  # the poisoned half is ignored


def test_render_map_png(tmp_path, rng):
    poses = np.zeros((10, 6))
    poses[:, 5] = np.arange(10)
    lms = rng.normal(0, 5, (100, 3))
    ok = render_map_png(str(tmp_path / "map.png"), poses, lms,
                        query_scores=[0.1, 0.9, 0.3])
    if ok:
        assert (tmp_path / "map.png").stat().st_size > 1000


def test_verbose_logger(capsys):
    log = VerboseLogger(1)
    log(1, "important")
    log(2, "chatty")
    out = capsys.readouterr().out
    assert "important" in out and "chatty" not in out


def test_html_map_viewer(tmp_path, rng):
    """The interactive map viewer is one self-contained HTML file whose
    embedded JSON round-trips the scene (≙ the reference's live 3D window
    + BoW score bars, reference .cpp:1262-1338, utils.cpp:101-151)."""
    import json
    import re

    from srba_slam_tpu.utils.html_viewer import write_map_viewer

    poses = np.zeros((6, 6))
    poses[:, 3] = np.arange(6)
    poses[:, 1] = 0.1  # nonzero rotation exercises the frustum transform
    lms = rng.normal(0, 5, (50, 3))
    p = tmp_path / "map_viewer.html"
    assert write_map_viewer(
        str(p), poses, landmarks=lms,
        edges=[(0, 1, "submap"), (1, 5, "lc")],
        query_scores=[0.2, 0.8], query_score_th=0.05,
        kf_frames=[0, 3, 6, 9, 12, 15])
    html = p.read_text()
    assert "<canvas" in html and "__DATA__" not in html
    data = json.loads(re.search(r"const D0 = (\{.*?\});", html).group(1))
    assert len(data["traj"]) == 6 and len(data["lms"]) == 50
    assert data["edges"][1] == [1, 5, "lc"]
    assert len(data["frusta"][0]) == 8  # 8 segments per camera frustum
    assert data["qth"] == 0.05 and data["kf_frames"][1] == 3
