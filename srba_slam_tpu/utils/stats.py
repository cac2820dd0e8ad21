"""Small geometry/quality statistics and leveled logging.

``compute_dispersion`` ≙ the reference's keypoint-dispersion statistic
(src/srba-stereo-slam_utils.h:534-556: un-normalized std over matched keypoint
coordinates — sqrt of the sum of squared deviations, exactly as the reference
computes it). ``vlog`` ≙ the VERBOSE_LEVEL console macro
(src/srba-stereo-slam_common.h:86).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_dispersion(xs: jax.Array, ys: jax.Array, valid: jax.Array):
    """(std_x, std_y) of the valid matched keypoints, reference formula
    (sqrt of sum of squared deviations — NOT divided by N)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    x = xs.astype(jnp.float32)
    y = ys.astype(jnp.float32)
    mx = jnp.sum(x * w) / n
    my = jnp.sum(y * w) / n
    sx = jnp.sqrt(jnp.sum(((x - mx) ** 2) * w))
    sy = jnp.sqrt(jnp.sum(((y - my) ** 2) * w))
    return sx, sy


class VerboseLogger:
    """Leveled console logging (0 none / 1 important / 2 chatty)."""

    def __init__(self, level: int = 0):
        self.level = level

    def __call__(self, level: int, msg: str):
        if self.level >= level:
            print(f"[srba_slam_tpu] {msg}", flush=True)
