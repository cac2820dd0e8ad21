"""Global SE(3) pose-graph optimization (epilogue solver).

TPU-native ≙ ``mrpt::graphslam::optimize_graph_spa_levmarq`` over the kf2kf
graph exported by the SRBA engine (reference
src/CSRBAStereoSLAMEstimator.cpp:946-957): given relative-pose constraints
T_uv on edges, find absolute poses minimizing
``Σ_e || log( T_uv^-1 ∘ Q_u^-1 ∘ Q_v ) ||²`` with node 0 as the gauge anchor.

Runs once per sequence, so it favors exactness and simplicity over
hand-tuned Jacobians: the sparse block Jacobian is obtained with
``jax.jacfwd`` through the same compose/log code the rest of the framework
uses (XLA batches the tangents), and the normal equations are solved with a
dense Cholesky — at SLAM sizes (≤ 512 KFs → a 3072² system) that is
milliseconds on the MXU. Fixed shapes, masked nodes/edges, LM damping with
masked accept/reject.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from srba_slam_tpu.utils import se3

_HI = jax.lax.Precision.HIGHEST


def _apply_delta(poses: jax.Array, delta: jax.Array) -> jax.Array:
    """Left-multiplicative twist update per node: Q <- exp(delta) ∘ Q."""
    dR = se3.so3_exp(delta[:, :3])
    R, t = se3.exp(poses)
    R_new = jnp.einsum("nij,njk->nik", dR, R, precision=_HI)
    t_new = jnp.einsum("nij,nj->ni", dR, t, precision=_HI) + delta[:, 3:]
    return se3.log(R_new, t_new)


def _residuals(poses, eu, ev, rel, edge_w):
    qu = poses[eu]
    qv = poses[ev]
    pred = se3.compose(se3.inverse(qu), qv)        # pose of v in u's frame
    err = se3.compose(se3.inverse(rel), pred)      # ideally identity
    return err * edge_w[:, None]


@functools.partial(jax.jit, static_argnames=("max_iters",))
def optimize_pose_graph(
    poses0: jax.Array,      # f32 [N, 6] initial absolute poses
    node_valid: jax.Array,  # bool [N]
    eu: jax.Array,          # int32 [E]
    ev: jax.Array,          # int32 [E]
    rel: jax.Array,         # f32 [E, 6] measured pose of v in u's frame
    edge_valid: jax.Array,  # bool [E]
    max_iters: int = 30,
    init_lambda: float = 1e-4,
):
    """Returns (poses [N,6], cost_init, cost_final, iters)."""
    n = poses0.shape[0]
    edge_w = edge_valid.astype(jnp.float32)
    free = node_valid & (jnp.arange(n) != 0)
    free6 = jnp.repeat(free, 6)

    def cost_of(poses):
        r = _residuals(poses, eu, ev, rel, edge_w)
        return jnp.sum(r * r)

    cost0 = cost_of(poses0)

    def gn_step(poses, lam):
        def r_of_delta(delta_flat):
            delta = delta_flat.reshape(n, 6) * free[:, None]
            return _residuals(_apply_delta(poses, delta), eu, ev, rel, edge_w).reshape(-1)

        r0 = r_of_delta(jnp.zeros(n * 6))
        J = jax.jacfwd(r_of_delta)(jnp.zeros(n * 6))       # [6E, 6N]
        H = jnp.einsum("ei,ej->ij", J, J, precision=_HI)
        g = jnp.einsum("ei,e->i", J, r0, precision=_HI)
        H = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(n * 6)
        H = jnp.where(free6[:, None] & free6[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(free6, 0.0, 1.0))
        g = jnp.where(free6, g, 0.0)
        L = jnp.linalg.cholesky(H)
        delta = -jax.scipy.linalg.cho_solve((L, True), g)
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0).reshape(n, 6) * free[:, None]
        return _apply_delta(poses, delta), ok

    def body(_, carry):
        poses, cost, lam, iters = carry
        new_poses, ok = gn_step(poses, lam)
        new_cost = cost_of(new_poses)
        accept = ok & (new_cost < cost)
        poses = jnp.where(accept, new_poses, poses)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9),
                        jnp.minimum(lam * 8.0, 1e4))
        return poses, cost, lam, iters + accept.astype(jnp.int32)

    poses, cost, _, iters = jax.lax.fori_loop(
        0, max_iters, body,
        (poses0, cost0, jnp.float32(init_lambda), jnp.asarray(0, jnp.int32)),
    )
    return poses, cost0, cost, iters
