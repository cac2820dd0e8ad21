import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.ops.posegraph import optimize_pose_graph
from srba_slam_tpu.utils import se3_np


def _pad(poses, n_pad):
    out = np.zeros((n_pad, 6), np.float32)
    out[: len(poses)] = poses
    return out


def test_chain_with_loop_closure(rng):
    """Square loop with drifty odometry + one LC edge: solver closes it."""
    n, n_pad, e_pad = 12, 16, 32
    gt = [np.zeros(6)]
    inc = np.array([0, np.deg2rad(-30), 0, 0.2, 0, 1.5])
    for _ in range(n - 1):
        gt.append(se3_np.compose(gt[-1], inc))
    # odometry edges with noise (drift)
    eu, ev, rel = [], [], []
    for i in range(n - 1):
        noisy = se3_np.relative(gt[i + 1], gt[i]) + rng.normal(0, 0.01, 6)
        eu.append(i); ev.append(i + 1); rel.append(noisy)
    # exact loop closure 0 -> n-1
    eu.append(0); ev.append(n - 1)
    rel.append(se3_np.relative(gt[n - 1], gt[0]))
    # initial guess: integrate the noisy odometry
    init = [np.zeros(6)]
    for i in range(n - 1):
        init.append(se3_np.compose(init[-1], rel[i]))
    drift = np.linalg.norm(np.asarray(init[-1][3:]) - gt[-1][3:])

    eu_a = np.zeros(e_pad, np.int32); eu_a[: len(eu)] = eu
    ev_a = np.zeros(e_pad, np.int32); ev_a[: len(ev)] = ev
    rel_a = np.zeros((e_pad, 6), np.float32); rel_a[: len(rel)] = rel
    edge_valid = np.zeros(e_pad, bool); edge_valid[: len(eu)] = True

    poses, c0, c1, iters = optimize_pose_graph(
        jnp.asarray(_pad(init, n_pad)),
        jnp.asarray(np.arange(n_pad) < n),
        jnp.asarray(eu_a), jnp.asarray(ev_a), jnp.asarray(rel_a),
        jnp.asarray(edge_valid), max_iters=25,
    )
    poses = np.asarray(poses)
    assert float(c1) < float(c0) * 0.05
    final_err = np.linalg.norm(poses[n - 1, 3:] - gt[-1][3:])
    assert final_err < drift * 0.5
    assert final_err < 0.05
    # anchor never moves
    np.testing.assert_array_equal(poses[0], np.zeros(6, np.float32))


def test_perfect_edges_zero_cost(rng):
    n, n_pad, e_pad = 6, 8, 16
    gt = [np.zeros(6)]
    for i in range(n - 1):
        gt.append(se3_np.compose(gt[-1], rng.normal(0, 0.3, 6)))
    eu = list(range(n - 1)); ev = list(range(1, n))
    rel = [se3_np.relative(gt[i + 1], gt[i]) for i in range(n - 1)]
    eu_a = np.zeros(e_pad, np.int32); eu_a[: len(eu)] = eu
    ev_a = np.zeros(e_pad, np.int32); ev_a[: len(ev)] = ev
    rel_a = np.zeros((e_pad, 6), np.float32); rel_a[: len(rel)] = rel
    edge_valid = np.zeros(e_pad, bool); edge_valid[: len(eu)] = True
    poses, c0, c1, _ = optimize_pose_graph(
        jnp.asarray(_pad(gt, n_pad)), jnp.asarray(np.arange(n_pad) < n),
        jnp.asarray(eu_a), jnp.asarray(ev_a), jnp.asarray(rel_a),
        jnp.asarray(edge_valid), max_iters=5,
    )
    assert float(c0) < 1e-8
    np.testing.assert_allclose(np.asarray(poses)[:n], np.stack(gt), atol=1e-5)


def test_padding_inert(rng):
    n, n_pad, e_pad = 4, 8, 8
    gt = [np.zeros(6)]
    for i in range(n - 1):
        gt.append(se3_np.compose(gt[-1], rng.normal(0, 0.2, 6)))
    rel = [se3_np.relative(gt[i + 1], gt[i]) + rng.normal(0, 0.02, 6) for i in range(n - 1)]
    eu_a = np.zeros(e_pad, np.int32); ev_a = np.zeros(e_pad, np.int32)
    rel_a = np.zeros((e_pad, 6), np.float32)
    eu_a[:3] = [0, 1, 2]; ev_a[:3] = [1, 2, 3]; rel_a[:3] = rel
    ev_valid = np.zeros(e_pad, bool); ev_valid[:3] = True
    init = jnp.asarray(_pad(gt, n_pad))
    p1 = optimize_pose_graph(init, jnp.asarray(np.arange(n_pad) < n),
                             jnp.asarray(eu_a), jnp.asarray(ev_a),
                             jnp.asarray(rel_a), jnp.asarray(ev_valid), max_iters=6)[0]
    # poison padded edge targets; result identical
    rel_b = rel_a.copy(); rel_b[3:] = 99.0
    p2 = optimize_pose_graph(init, jnp.asarray(np.arange(n_pad) < n),
                             jnp.asarray(eu_a), jnp.asarray(ev_a),
                             jnp.asarray(rel_b), jnp.asarray(ev_valid), max_iters=6)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
