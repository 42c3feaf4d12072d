"""Sim(3) group ops, closed-form solver, RANSAC, and the OptimizeSim3
LM — the loop-closure capability of the vendored g2o Sim(3) stack
(``types/sim3.h``, ``types_seven_dof_expmap.h``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.geometry.sim3 import (
    Sim3,
    optimize_sim3,
    ransac_sim3,
    sim3_apply,
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
    solve_sim3_horn,
)

K = jnp.asarray(np.array([[450.0, 0, 320], [0, 450, 240], [0, 0, 1]], np.float32))


def _random_sim3(rng, scale_mag=0.3, rot_mag=0.5, t_mag=1.0):
    xi = np.zeros(7, np.float32)
    xi[0:3] = rng.normal(0, t_mag, 3)
    xi[3:6] = rng.normal(0, rot_mag, 3)
    xi[6] = rng.normal(0, scale_mag)
    return sim3_exp(jnp.asarray(xi))


def test_exp_log_roundtrip(rng):
    # rotation magnitudes stay inside the principal domain (|phi| < pi):
    # so3_log is multivalued beyond it, as for any rotation log
    for mag in (1e-7, 1e-3, 0.5):
        xi = np.asarray(rng.normal(0, mag, (10, 7)), np.float32)
        g = sim3_exp(jnp.asarray(xi))
        xi2 = sim3_log(g)
        np.testing.assert_allclose(np.asarray(xi2), xi,
                                   atol=1e-4 * max(mag, 1e-2))
    # a large principal-domain case: |phi| = 2.8, big scale/translation
    xi = np.zeros((1, 7), np.float32)
    xi[0, 0:3] = [1.5, -2.0, 0.7]
    xi[0, 3:6] = np.array([2.0, 1.5, -1.0]) * (2.8 / np.linalg.norm([2.0, 1.5, -1.0]))
    xi[0, 6] = 0.9
    xi2 = np.asarray(sim3_log(sim3_exp(jnp.asarray(xi))))
    np.testing.assert_allclose(xi2, xi, atol=1e-3)


def test_exp_zero_is_identity():
    g = sim3_exp(jnp.zeros(7))
    assert abs(float(g.s) - 1.0) < 1e-6
    np.testing.assert_allclose(np.asarray(g.R), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.t), 0.0, atol=1e-6)


def test_compose_inverse(rng):
    a = _random_sim3(rng)
    b = _random_sim3(rng)
    X = jnp.asarray(rng.normal(0, 1, (20, 3)).astype(np.float32))
    # (a o b)(X) == a(b(X))
    np.testing.assert_allclose(
        np.asarray(sim3_apply(sim3_compose(a, b), X)),
        np.asarray(sim3_apply(a, sim3_apply(b, X))),
        atol=1e-4,
    )
    # g o g^-1 == id
    gi = sim3_compose(a, sim3_inverse(a))
    np.testing.assert_allclose(np.asarray(sim3_apply(gi, X)), np.asarray(X),
                               atol=1e-4)


def test_horn_recovers_exact(rng):
    g = _random_sim3(rng)
    X2 = jnp.asarray(rng.normal(0, 2, (30, 3)).astype(np.float32))
    X1 = sim3_apply(g, X2)
    est = solve_sim3_horn(X1, X2)
    assert abs(float(est.s) - float(g.s)) < 1e-4
    np.testing.assert_allclose(np.asarray(est.R), np.asarray(g.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(est.t), np.asarray(g.t), atol=1e-4)


def test_ransac_sim3_with_outliers(rng):
    g = _random_sim3(rng)
    N = 64
    X2 = rng.normal(0, 2, (N, 3)).astype(np.float32)
    X1 = np.array(sim3_apply(g, jnp.asarray(X2)))
    # 30% outliers
    out = rng.random(N) < 0.3
    X1[out] += rng.normal(0, 2.0, (out.sum(), 3))
    res = ransac_sim3(
        jnp.asarray(X1), jnp.asarray(X2), jnp.ones(N, bool),
        jax.random.PRNGKey(0), iterations=256, tol=0.05,
    )
    assert bool(res.ok)
    # inliers found, outliers rejected
    inl = np.asarray(res.inliers)
    assert inl[~out].mean() > 0.9
    assert inl[out].mean() < 0.2
    assert abs(float(res.g.s) - float(g.s)) < 0.05 * float(g.s)


def test_optimize_sim3_refines_reprojection(rng):
    """From a perturbed initial Sim3, the bidirectional-reprojection LM
    must converge to the ground-truth transform."""
    g_gt = _random_sim3(rng, scale_mag=0.2, rot_mag=0.3, t_mag=0.5)
    N = 80
    # points in frame 2 (in front of both cameras)
    X2 = np.stack([
        rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N), rng.uniform(4, 9, N)
    ], -1).astype(np.float32)
    X1 = np.asarray(sim3_apply(g_gt, jnp.asarray(X2)))

    def proj(P):
        return (P[:, :2] / P[:, 2:]) * np.array([450.0, 450.0]) + np.array([320.0, 240.0])

    uv1 = (proj(X1) + rng.normal(0, 0.3, (N, 2))).astype(np.float32)
    uv2 = (proj(X2) + rng.normal(0, 0.3, (N, 2))).astype(np.float32)
    # perturbed start
    dxi = np.zeros(7, np.float32)
    dxi[0:3] = 0.1
    dxi[3:6] = 0.05
    dxi[6] = 0.08
    g0 = sim3_compose(sim3_exp(jnp.asarray(dxi)), g_gt)
    g, inl = optimize_sim3(
        g0, jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(uv1),
        jnp.asarray(uv2), K, jnp.ones(N, bool), iterations=15,
    )
    assert abs(float(g.s) / float(g_gt.s) - 1.0) < 0.01
    rot_err = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(g.R).T @ np.asarray(g_gt.R)) - 1) / 2, -1, 1)))
    assert rot_err < 0.3
    np.testing.assert_allclose(np.asarray(g.t), np.asarray(g_gt.t), atol=0.03)
    assert np.asarray(inl).mean() > 0.9


def test_optimize_sim3_fix_scale(rng):
    g_gt = _random_sim3(rng, scale_mag=0.0)  # true scale 1
    N = 60
    X2 = np.stack([
        rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N), rng.uniform(4, 9, N)
    ], -1).astype(np.float32)
    X1 = np.asarray(sim3_apply(g_gt, jnp.asarray(X2)))

    def proj(P):
        return (P[:, :2] / P[:, 2:]) * np.array([450.0, 450.0]) + np.array([320.0, 240.0])

    uv1 = proj(X1).astype(np.float32)
    uv2 = proj(X2).astype(np.float32)
    dxi = np.zeros(7, np.float32)
    dxi[0] = 0.1
    g0 = sim3_compose(sim3_exp(jnp.asarray(dxi)), g_gt)
    g, _ = optimize_sim3(
        g0, jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(uv1),
        jnp.asarray(uv2), K, jnp.ones(N, bool), iterations=12, fix_scale=True,
    )
    # scale stayed pinned
    assert abs(float(g.s) - float(g0.s)) < 1e-6
    np.testing.assert_allclose(np.asarray(g.t), np.asarray(g_gt.t), atol=0.02)


def test_optimize_sim3_per_direction_inlier_gate(rng):
    """The inlier gate is per directional edge (g2o OptimizeSim3 erases a
    correspondence only when e12 OR e21 exceeds th2=10): a match with
    ~3 px error in BOTH images (chi2 ~9 per direction, ~18 summed) is an
    inlier. A summed gate would misclassify every such match."""
    N = 64
    X2 = np.stack([
        rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N), rng.uniform(4, 9, N)
    ], -1).astype(np.float32)
    g_id = Sim3(s=jnp.float32(1.0), R=jnp.eye(3), t=jnp.zeros(3))
    X1 = X2.copy()

    def proj(P):
        return (P[:, :2] / P[:, 2:]) * np.array([450.0, 450.0]) \
            + np.array([320.0, 240.0])

    # symmetric random-sign ~2.98 px offsets: no systematic component for
    # the optimizer to absorb, so per-direction chi2 stays ~8.9 (< 10)
    # while the summed chi2 is ~17.8 (> 10)
    s1 = rng.choice([-1.0, 1.0], (N, 2))
    s2 = rng.choice([-1.0, 1.0], (N, 2))
    uv1 = (proj(X1) + 2.98 / np.sqrt(2) * s1).astype(np.float32)
    uv2 = (proj(X2) + 2.98 / np.sqrt(2) * s2).astype(np.float32)
    g, inl = optimize_sim3(
        g_id, jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(uv1),
        jnp.asarray(uv2), K, jnp.ones(N, bool), iterations=8,
    )
    assert np.asarray(inl).mean() > 0.9
