import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.geometry import se3
from orb_slam_tracking_tpu.optim.pose_opt import optimize_pose

K = np.array([[600.0, 0, 376], [0, 600, 240], [0, 0, 1]], np.float32)


def _scene(rng, n=200):
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(2, 8, n)], -1
    ).astype(np.float32)
    return pts


def _project(pts, R, t):
    pc = pts @ R.T + t
    return (pc[:, :2] / pc[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]


def test_recovers_pose_with_outliers(rng):
    n = 200
    pts = _scene(rng, n)
    xi_true = np.array([0.05, -0.03, 0.02, 0.2, -0.1, 0.15], np.float32)
    Rt, tt = se3.se3_exp(jnp.asarray(xi_true))
    uv = _project(pts, np.asarray(Rt), np.asarray(tt))
    uv = (uv + rng.normal(0, 0.5, (n, 2))).astype(np.float32)
    uv[:40] += rng.uniform(20, 80, (40, 2)) * rng.choice([-1, 1], (40, 2))
    xi0 = xi_true + np.array([0.02, 0.01, -0.015, 0.1, 0.05, -0.08], np.float32)
    R0, t0 = se3.se3_exp(jnp.asarray(xi0))
    res = optimize_pose(
        R0, t0, jnp.asarray(pts), jnp.asarray(uv), jnp.ones(n),
        jnp.ones(n, bool), jnp.asarray(K),
    )
    assert int(res.n_inliers) == 160
    inl = np.asarray(res.inlier)
    assert (~inl[:40]).all() and inl[40:].all()
    rerr = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(res.R).T @ np.asarray(Rt)) - 1) / 2, -1, 1))
    )
    assert rerr < 0.1
    assert np.linalg.norm(np.asarray(res.t) - np.asarray(tt)) < 5e-3


def test_large_basin_convergence(rng):
    """Must converge from a 4-degree / large-translation offset (the
    graduated Huber kernel widens the basin; a tight kernel strands the
    pose in a local minimum)."""
    n = 250
    pts = _scene(rng, n)
    uv = (_project(pts, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
          + rng.normal(0, 0.5, (n, 2))).astype(np.float32)
    w = rng.standard_normal(3)
    w = w / np.linalg.norm(w) * np.radians(4.0)
    v = rng.standard_normal(3) * 0.1
    dR, dt = se3.se3_exp(jnp.asarray(np.concatenate([w, v]).astype(np.float32)))
    res = optimize_pose(
        dR, dt, jnp.asarray(pts), jnp.asarray(uv), jnp.ones(n),
        jnp.ones(n, bool), jnp.asarray(K),
    )
    rerr = np.degrees(
        np.arccos(np.clip((np.trace(np.asarray(res.R)) - 1) / 2, -1, 1))
    )
    assert rerr < 0.05
    assert np.linalg.norm(np.asarray(res.t)) < 5e-3


def test_respects_validity_mask(rng):
    n = 100
    pts = _scene(rng, n)
    uv = _project(pts, np.eye(3, dtype=np.float32), np.zeros(3, np.float32)).astype(np.float32)
    # corrupt the masked-out half wildly; they must not affect the result
    uv_bad = uv.copy()
    uv_bad[50:] += 500.0
    valid = np.zeros(n, bool)
    valid[:50] = True
    res = optimize_pose(
        jnp.eye(3), jnp.zeros(3), jnp.asarray(pts), jnp.asarray(uv_bad),
        jnp.ones(n), jnp.asarray(valid), jnp.asarray(K),
    )
    assert int(res.n_inliers) == 50
    assert np.linalg.norm(np.asarray(res.t)) < 1e-4


def test_solve_spd6_matches_generic_solver(rng):
    """The closed-form block-Schur 6x6 path must agree with pivoted LU on
    SPD damped normal equations across conditioning regimes."""
    from orb_slam_tracking_tpu.optim.lm import solve_damped, solve_spd6

    for trial in range(20):
        J = rng.standard_normal((40, 6)).astype(np.float32)
        # skew the column scales to stress conditioning (fx~450 vs unit
        # translation columns is the realistic pose-opt imbalance)
        J *= np.logspace(0, 2 + (trial % 3), 6).astype(np.float32)
        H = (J.T @ J).astype(np.float32)
        b = rng.standard_normal(6).astype(np.float32)
        lam = np.float32(10.0 ** rng.uniform(-5, 0))
        Hd = H + lam * np.eye(6, dtype=np.float32) * np.diag(H)
        x_ref = np.linalg.solve(Hd.astype(np.float64), b.astype(np.float64))
        x = np.asarray(solve_damped(jnp.asarray(H), jnp.asarray(b),
                                    jnp.asarray(lam)))
        x2 = np.asarray(solve_spd6(jnp.asarray(Hd), jnp.asarray(b)))
        scale = np.linalg.norm(x_ref) + 1e-12
        assert np.linalg.norm(x - x_ref) / scale < 5e-3
        assert np.linalg.norm(x2 - x_ref) / scale < 5e-3


def test_solve_spd6_batched(rng):
    from orb_slam_tracking_tpu.optim.lm import solve_spd6

    J = rng.standard_normal((8, 30, 6)).astype(np.float32)
    H = np.einsum("bni,bnj->bij", J, J) + 1e-2 * np.eye(6, dtype=np.float32)
    b = rng.standard_normal((8, 6)).astype(np.float32)
    x = np.asarray(solve_spd6(jnp.asarray(H), jnp.asarray(b)))
    x_ref = np.linalg.solve(
        H.astype(np.float64), b.astype(np.float64)[..., None]
    )[..., 0]
    assert np.abs(x - x_ref).max() < 1e-3 * (np.abs(x_ref).max() + 1.0)


def test_vmapped_batched_solve_matches_unbatched(rng):
    """Under jax.vmap the damped 6x6 solve cannot see the batch axis
    (H traces as 2-D), so vmapped callers pass batched_solve=True to
    keep the closed-form block-Schur path (ADVICE r3). The result must
    be numerically equivalent to running each element unbatched."""
    import jax

    B, n = 4, 120
    pts = np.stack([_scene(rng, n) for _ in range(B)]).astype(np.float32)
    uvs, R0s, t0s = [], [], []
    for b in range(B):
        xi = rng.uniform(-0.05, 0.05, 6).astype(np.float32)
        Rt, tt = se3.se3_exp(jnp.asarray(xi))
        uv = _project(pts[b], np.asarray(Rt), np.asarray(tt))
        uvs.append((uv + rng.normal(0, 0.3, (n, 2))).astype(np.float32))
        R0, t0 = se3.se3_exp(jnp.asarray(
            xi + rng.uniform(-0.01, 0.01, 6).astype(np.float32)))
        R0s.append(np.asarray(R0))
        t0s.append(np.asarray(t0))
    uvs = np.stack(uvs)
    R0s = np.stack(R0s)
    t0s = np.stack(t0s)
    ones = jnp.ones((B, n))
    mask = jnp.ones((B, n), bool)

    def run1(R0, t0, p, uv, w, m):
        return optimize_pose(R0, t0, p, uv, w, m, jnp.asarray(K),
                             batched_solve=True)

    batched = jax.vmap(run1)(jnp.asarray(R0s), jnp.asarray(t0s),
                             jnp.asarray(pts), jnp.asarray(uvs), ones, mask)
    for b in range(B):
        single = optimize_pose(
            jnp.asarray(R0s[b]), jnp.asarray(t0s[b]), jnp.asarray(pts[b]),
            jnp.asarray(uvs[b]), ones[b], mask[b], jnp.asarray(K),
        )
        # the solver backend differs (block-Schur vs LU) so allow small
        # numerical divergence, but the recovered poses must agree
        assert np.abs(np.asarray(batched.R[b]) - np.asarray(single.R)).max() < 1e-3
        assert np.abs(np.asarray(batched.t[b]) - np.asarray(single.t)).max() < 1e-3
