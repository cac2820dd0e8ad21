"""Vectorized RANSAC fundamental-matrix estimation.

Replaces ``cv::findFundamentalMat(FM_RANSAC, th, prob)`` used by the
reference's data-association filter 3 (reference
src/CSRBAStereoSLAMEstimator.cpp:2015-2055, 2043, 2101): instead of the CPU's
sequential hypothesis loop with early termination, a fixed batch of NH
8-point hypotheses is solved simultaneously — the nullspace of each 8x9
system via eigendecomposition of A^T A (batched 9x9 eigh, TPU-friendly; no
SVD needed) — and all hypotheses score all correspondences at once with the
symmetric epipolar distance. Fixed shapes, masked correspondences, no host
sync.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def hypotheses_for_prob(fit_prob: float, inlier_ratio: float = 0.7,
                        min_hyp: int = 64, max_hyp: int = 512) -> int:
    """Map the config's RANSAC confidence to a FIXED hypothesis count.

    ≙ the ``ransac_fit_prob`` argument of cv::findFundamentalMat (reference
    src/CSRBAStereoSLAMEstimator.cpp:2043, 2101): OpenCV iterates until
    P(all-inlier sample seen) >= fit_prob, adapting to the observed inlier
    ratio. A fixed-shape batched program cannot adapt, so the standard
    N = log(1-p) / log(1-w^8) is evaluated at an assumed post-filter-2
    inlier ratio (w=0.7 — the cascade's ORB/uniqueness filters run first)
    and rounded up to a power of two so at most a handful of program shapes
    ever compile."""
    import math

    p = min(max(float(fit_prob), 0.5), 1.0 - 1e-9)
    denom = math.log(1.0 - inlier_ratio ** 8)
    n = math.ceil(math.log(1.0 - p) / denom)
    n_hyp = min_hyp
    while n_hyp < n and n_hyp < max_hyp:
        n_hyp *= 2
    return n_hyp


def _normalize_pts(x: jax.Array, y: jax.Array, w: jax.Array):
    """Hartley normalization (masked): zero-mean, mean distance sqrt(2)."""
    n = jnp.maximum(jnp.sum(w), 1.0)
    mx = jnp.sum(x * w) / n
    my = jnp.sum(y * w) / n
    d = jnp.sqrt((x - mx) ** 2 + (y - my) ** 2)
    s = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / n, 1e-9)
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    T = jnp.stack([
        jnp.stack([s, zero, -s * mx]),
        jnp.stack([zero, s, -s * my]),
        jnp.stack([zero, zero, one]),
    ])
    return (x - mx) * s, (y - my) * s, T


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_fundamental(
    x1: jax.Array, y1: jax.Array,
    x2: jax.Array, y2: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    threshold: float = 2.0,
    n_hyp: int = 128,
):
    """Estimate F from correspondences (x1,y1) <-> (x2,y2) under a mask.

    Returns (inliers [K] bool, best_inlier_count, F [3,3]).
    """
    k = x1.shape[0]
    w = valid.astype(jnp.float32)
    x1 = x1.astype(jnp.float32)
    y1 = y1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    y2 = y2.astype(jnp.float32)

    # Hartley-normalize both point sets (masked)
    nx1, ny1, T1 = _normalize_pts(x1, y1, w)
    nx2, ny2, T2 = _normalize_pts(x2, y2, w)

    # sample 8 DISTINCT valid indices per hypothesis: an independent random
    # key per correspondence per hypothesis, invalid pushed to the end, take
    # the first 8 of each row's sort order (sampling with replacement makes
    # the 8x9 system rank-deficient and the nullspace arbitrary)
    r = jax.random.uniform(key, (n_hyp, k))
    r = jnp.where(valid[None, :], r, 2.0)
    idx = jnp.argsort(r, axis=1)[:, :8].astype(jnp.int32)  # [NH, 8]

    a_x1, a_y1 = nx1[idx], ny1[idx]
    a_x2, a_y2 = nx2[idx], ny2[idx]
    ones = jnp.ones_like(a_x1)
    # epipolar constraint p2^T F p1 = 0, row = [x2x1 x2y1 x2 y2x1 y2y1 y2 x1 y1 1]
    A = jnp.stack(
        [a_x2 * a_x1, a_x2 * a_y1, a_x2, a_y2 * a_x1, a_y2 * a_y1, a_y2,
         a_x1, a_y1, ones],
        axis=-1,
    )  # [NH, 8, 9]
    AtA = jnp.einsum("hij,hik->hjk", A, A, precision=_HI)  # [NH, 9, 9]
    _, vecs = jnp.linalg.eigh(AtA)
    F = vecs[..., 0].reshape(-1, 3, 3)                     # smallest eigenvector

    # denormalize: F_px = T2^T F T1
    F = jnp.einsum("ji,hjk,kl->hil", T2, F, T1, precision=_HI)

    # symmetric epipolar distance of all correspondences vs all hypotheses
    p1 = jnp.stack([x1, y1, jnp.ones_like(x1)], axis=-1)   # [K,3]
    p2 = jnp.stack([x2, y2, jnp.ones_like(x2)], axis=-1)
    Fp1 = jnp.einsum("hij,kj->hki", F, p1, precision=_HI)  # [NH,K,3] lines in img2
    Ftp2 = jnp.einsum("hji,kj->hki", F, p2, precision=_HI) # lines in img1
    s = jnp.einsum("ki,hki->hk", p2, Fp1, precision=_HI)   # algebraic residual
    d2a = s**2 / jnp.maximum(Fp1[..., 0] ** 2 + Fp1[..., 1] ** 2, 1e-12)
    d2b = s**2 / jnp.maximum(Ftp2[..., 0] ** 2 + Ftp2[..., 1] ** 2, 1e-12)
    d2 = jnp.maximum(d2a, d2b)                             # [NH, K]
    inl = (d2 <= threshold * threshold) & valid[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
    best = jnp.argmax(counts)
    return inl[best], counts[best], F[best]
