"""Vectorized RANSAC fundamental-matrix estimation.

Replaces ``cv::findFundamentalMat(FM_RANSAC, th, prob)`` used by the
reference's data-association filter 3 (reference
src/CSRBAStereoSLAMEstimator.cpp:2015-2055, 2043, 2101): instead of the CPU's
sequential hypothesis loop with early termination, a fixed batch of NH
8-point hypotheses is solved simultaneously — the nullspace of each 8x9
system via fully-unrolled batched Gram-Schmidt (``_nullvec_cgs2``; see its
docstring for the eigh/QR/inverse-iteration comparison) — and all
hypotheses score all
correspondences at once with the symmetric epipolar distance. Fixed
shapes, masked correspondences, no host sync.
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


def _nullvec_cgs2(A: jax.Array) -> jax.Array:
    """Unit nullspace vector of each exact 8x9 system in ``A`` [NH, 8, 9].

    Fully-unrolled classical Gram-Schmidt with reorthogonalization (CGS2):
    orthonormalize the 8 rows (projecting against a fixed [NH, 8, 9] basis
    buffer — zero rows are projection no-ops, so no dynamic shapes), then
    project a deterministic generic vector out of the row space. Everything
    is a handful of batched einsums — no LAPACK-style factorization.

    Chosen over the alternatives by measurement + f32 error analysis (one
    fused check runs 640 of these):
      * batched 9x9 ``eigh`` of A^T A: 8.7 ms device, residual ~1e-4 —
        forming A^T A squares the conditioning, putting the two smallest
        eigenvalues inside f32 noise;
      * inverse iteration on A^T A: cheap but residual ~1e-2 (same
        squared-conditioning problem — the eigengap is sub-noise);
      * a fixed-coordinate gauge (f9=1): fails structurally — for
        pure-translation motion (the automotive case) the true normalized
        F has F33 = 0;
      * batched Householder QR of A^T (complete): residual ~4e-7 but
        ~2.8 ms device;
      * CGS2 (this): residual ~2e-7, ~0.5 ms device.
    Degenerate samples (rank < 8) orthonormalize to a zero row (guarded),
    leaving an arbitrary-but-valid residual direction — the hypothesis
    simply scores few inliers, the correct RANSAC treatment."""
    nh = A.shape[0]
    Q = jnp.zeros((nh, 8, 9), A.dtype)
    for i in range(8):
        v = A[:, i]
        for _ in range(2):  # reorthogonalize: CGS2 ~ machine-eps orthogonality
            c = jnp.einsum("hkj,hj->hk", Q, v, precision=_HI)
            v = v - jnp.einsum("hkj,hk->hj", Q, c, precision=_HI)
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = jnp.where(n > 1e-12, v / jnp.maximum(n, 1e-30), 0.0)
        Q = Q.at[:, i].set(v)
    # deterministic generic start (symmetry-broken ones)
    g = jnp.ones((nh, 9), A.dtype) + 0.01 * jnp.arange(9.0, dtype=A.dtype)
    for _ in range(2):
        c = jnp.einsum("hkj,hj->hk", Q, g, precision=_HI)
        g = g - jnp.einsum("hkj,hk->hj", Q, c, precision=_HI)
    return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-30)


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
    # 8 smallest via top_k of the negation — a full [NH, K] argsort sorts
    # 512-wide rows to keep 8 of them
    _, idx = jax.lax.top_k(-r, 8)
    idx = idx.astype(jnp.int32)  # [NH, 8]

    a_x1, a_y1 = nx1[idx], ny1[idx]
    a_x2, a_y2 = nx2[idx], ny2[idx]
    ones = jnp.ones_like(a_x1)
    # epipolar constraint p2^T F p1 = 0, row = [x2x1 x2y1 x2 y2x1 y2y1 y2 x1 y1 1]
    A = jnp.stack(
        [a_x2 * a_x1, a_x2 * a_y1, a_x2, a_y2 * a_x1, a_y2 * a_y1, a_y2,
         a_x1, a_y1, ones],
        axis=-1,
    )  # [NH, 8, 9]
    F = _nullvec_cgs2(A).reshape(-1, 3, 3)

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
