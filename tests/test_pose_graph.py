"""Sim(3) pose-graph optimizer tests (OptimizeEssentialGraph capability).

Synthetic loop trajectories: exact-measurement recovery (solver
correctness) and scale-drift absorption along a closed loop (the actual
loop-closing use case, ``types_seven_dof_expmap.h:152`` EdgeSim3).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.geometry.se3 import so3_exp
from orb_slam_tracking_tpu.geometry.sim3 import (
    Sim3, sim3_compose, sim3_inverse, sim3_log,
)
from orb_slam_tracking_tpu.optim.pose_graph import (
    optimize_pose_graph, relative_sim3,
)


def _circle_poses(K: int, radius: float = 5.0):
    """World->camera Sim(3) poses on a circle, looking inward."""
    s = jnp.ones(K)
    Rs, ts = [], []
    for k in range(K):
        a = 2.0 * np.pi * k / K
        # camera center on the circle
        c = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        R = np.asarray(so3_exp(jnp.array([0.0, 0.0, a])))
        t = -R @ c
        Rs.append(R)
        ts.append(t)
    return Sim3(s=s, R=jnp.array(np.stack(Rs)), t=jnp.array(np.stack(ts)))


def _chain_edges(K: int, close_loop: bool):
    ei = list(range(1, K)) + ([0] if close_loop else [])
    ej = list(range(0, K - 1)) + ([K - 1] if close_loop else [])
    return jnp.array(ei, jnp.int32), jnp.array(ej, jnp.int32)


def _drifted(gt: Sim3, rot_d: float, t_d: float, s_d: float, seed=0):
    """Accumulate per-step multiplicative drift: vertex k gets the GT pose
    left-composed with a random-walk error of k steps."""
    rng = np.random.default_rng(seed)
    K = gt.s.shape[0]
    err = Sim3(s=jnp.ones(()), R=jnp.eye(3), t=jnp.zeros(3))
    out = [Sim3(s=gt.s[0], R=gt.R[0], t=gt.t[0])]
    for k in range(1, K):
        d = Sim3(
            s=jnp.exp(jnp.float32(rng.normal(s_d, s_d / 3))),
            R=so3_exp(jnp.array(rng.normal(0, rot_d, 3), jnp.float32)),
            t=jnp.array(rng.normal(0, t_d, 3), jnp.float32),
        )
        err = sim3_compose(d, err)
        out.append(sim3_compose(err, Sim3(s=gt.s[k], R=gt.R[k], t=gt.t[k])))
    return Sim3(
        s=jnp.stack([g.s for g in out]),
        R=jnp.stack([g.R for g in out]),
        t=jnp.stack([g.t for g in out]),
    )


def _pose_errors(a: Sim3, b: Sim3):
    xi = sim3_log(sim3_compose(a, sim3_inverse(b)))
    return (
        np.abs(np.asarray(xi[:, 0:3])).max(),   # rho (translation-ish)
        np.abs(np.asarray(xi[:, 3:6])).max(),   # rotation
        np.abs(np.asarray(xi[:, 6])).max(),     # log-scale
    )


def test_zero_residual_noop():
    """Consistent graph: optimizer must not move the vertices."""
    K = 8
    gt = _circle_poses(K)
    ei, ej = _chain_edges(K, close_loop=True)
    meas = relative_sim3(
        Sim3(s=gt.s[ei], R=gt.R[ei], t=gt.t[ei]),
        Sim3(s=gt.s[ej], R=gt.R[ej], t=gt.t[ej]),
    )
    fixed = jnp.zeros(K, bool).at[0].set(True)
    res = optimize_pose_graph(
        gt, jnp.ones(K, bool), fixed, ei, ej, meas, jnp.ones(K, jnp.float32),
        iterations=5,
    )
    assert float(res.cost0) < 1e-8
    rho_e, rot_e, s_e = _pose_errors(res.vertices, gt)
    assert rho_e < 1e-4 and rot_e < 1e-5 and s_e < 1e-5


def test_recovers_gt_from_drifted_init():
    """Exact measurements + drifted initial vertices -> GT recovery (up to
    the fixed-vertex gauge)."""
    K = 16
    gt = _circle_poses(K)
    ei, ej = _chain_edges(K, close_loop=True)
    meas = relative_sim3(
        Sim3(s=gt.s[ei], R=gt.R[ei], t=gt.t[ei]),
        Sim3(s=gt.s[ej], R=gt.R[ej], t=gt.t[ej]),
    )
    init = _drifted(gt, rot_d=0.02, t_d=0.05, s_d=0.01)
    fixed = jnp.zeros(K, bool).at[0].set(True)
    rho0, rot0, s0 = _pose_errors(init, gt)
    assert rot0 > 0.05 and s0 > 0.05  # the drift is real
    res = optimize_pose_graph(
        init, jnp.ones(K, bool), fixed, ei, ej, meas,
        jnp.ones(ei.shape[0], jnp.float32), iterations=25,
    )
    rho_e, rot_e, s_e = _pose_errors(res.vertices, gt)
    assert float(res.cost) < 1e-6 * max(float(res.cost0), 1.0)
    assert rho_e < 1e-2 and rot_e < 1e-3 and s_e < 1e-3


def test_scale_drift_absorbed_by_loop_edge():
    """The monocular loop-closing scenario: odometry edges carry the
    drifted relative measurements (chain-consistent, so odometry alone is
    a zero-residual graph), ONE loop edge carries the true constraint.
    The optimizer must spread the accumulated error: endpoint scale error
    shrinks by >5x."""
    K = 20
    gt = _circle_poses(K)
    init = _drifted(gt, rot_d=0.01, t_d=0.03, s_d=0.015, seed=3)
    ei, ej = _chain_edges(K, close_loop=False)
    # odometry measurements from the DRIFTED chain (self-consistent)
    meas = relative_sim3(
        Sim3(s=init.s[ei], R=init.R[ei], t=init.t[ei]),
        Sim3(s=init.s[ej], R=init.R[ej], t=init.t[ej]),
    )
    # one loop edge with the TRUE relative pose (what Sim3-RANSAC yields)
    loop_meas = relative_sim3(
        Sim3(s=gt.s[K - 1], R=gt.R[K - 1], t=gt.t[K - 1]),
        Sim3(s=gt.s[0], R=gt.R[0], t=gt.t[0]),
    )
    ei = jnp.concatenate([ei, jnp.array([K - 1], jnp.int32)])
    ej = jnp.concatenate([ej, jnp.array([0], jnp.int32)])
    meas = Sim3(
        s=jnp.concatenate([meas.s, loop_meas.s[None]]),
        R=jnp.concatenate([meas.R, loop_meas.R[None]]),
        t=jnp.concatenate([meas.t, loop_meas.t[None]]),
    )
    fixed = jnp.zeros(K, bool).at[0].set(True)
    res = optimize_pose_graph(
        init, jnp.ones(K, bool), fixed, ei, ej, meas,
        jnp.ones(ei.shape[0], jnp.float32), iterations=30,
    )
    # endpoint error before vs after
    end_before = sim3_log(sim3_compose(
        Sim3(s=init.s[K - 1], R=init.R[K - 1], t=init.t[K - 1]),
        sim3_inverse(Sim3(s=gt.s[K - 1], R=gt.R[K - 1], t=gt.t[K - 1]))))
    v = res.vertices
    end_after = sim3_log(sim3_compose(
        Sim3(s=v.s[K - 1], R=v.R[K - 1], t=v.t[K - 1]),
        sim3_inverse(Sim3(s=gt.s[K - 1], R=gt.R[K - 1], t=gt.t[K - 1]))))
    s_before = abs(float(end_before[6]))
    s_after = abs(float(end_after[6]))
    assert s_before > 0.1            # drift accumulated to >10% scale
    assert s_after < s_before / 5.0  # loop edge pulled it back


def test_padding_and_invalid_vertices_ignored():
    """Zero-weight edges and invalid vertices must not perturb the solve."""
    K = 8
    gt = _circle_poses(K)
    ei, ej = _chain_edges(K, close_loop=True)
    meas = relative_sim3(
        Sim3(s=gt.s[ei], R=gt.R[ei], t=gt.t[ei]),
        Sim3(s=gt.s[ej], R=gt.R[ej], t=gt.t[ej]),
    )
    init = _drifted(gt, rot_d=0.02, t_d=0.05, s_d=0.01, seed=1)
    # pad with garbage edges at zero weight, into an invalid vertex slot
    Kp = K + 2
    pad = lambda a, fill: jnp.concatenate(
        [a, jnp.full((2,) + a.shape[1:], fill, a.dtype)])
    vertices = Sim3(s=pad(init.s, 1.0),
                    R=jnp.concatenate([init.R, jnp.stack([jnp.eye(3)] * 2)]),
                    t=pad(init.t, 0.0))
    ei_p = jnp.concatenate([ei, jnp.array([K, K + 1], jnp.int32)])
    ej_p = jnp.concatenate([ej, jnp.array([0, 3], jnp.int32)])
    meas_p = Sim3(s=pad(meas.s, 1.0),
                  R=jnp.concatenate([meas.R, jnp.stack([jnp.eye(3)] * 2)]),
                  t=pad(meas.t, 123.0))     # garbage measurement
    w = jnp.concatenate([jnp.ones(ei.shape[0]), jnp.zeros(2)])
    v_valid = jnp.concatenate([jnp.ones(K, bool), jnp.zeros(2, bool)])
    fixed = jnp.zeros(Kp, bool).at[0].set(True)
    res = optimize_pose_graph(
        vertices, v_valid, fixed, ei_p, ej_p, meas_p, w, iterations=25)
    opt_valid = Sim3(s=res.vertices.s[:K], R=res.vertices.R[:K],
                     t=res.vertices.t[:K])
    rho_e, rot_e, s_e = _pose_errors(opt_valid, gt)
    assert rho_e < 1e-2 and rot_e < 1e-3 and s_e < 1e-3
    # invalid vertices untouched
    assert np.allclose(np.asarray(res.vertices.t[K:]), 0.0)
