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
