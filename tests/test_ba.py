import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.geometry import se3
from orb_slam_tracking_tpu.optim.ba import bundle_adjust, inv3x3

K = np.array([[450.0, 0, 320], [0, 450, 240], [0, 0, 1]], np.float32)


def test_inv3x3(rng):
    M = rng.standard_normal((32, 3, 3)).astype(np.float32)
    M = M @ np.swapaxes(M, -1, -2) + 0.5 * np.eye(3)  # SPD
    got = np.asarray(inv3x3(jnp.asarray(M)))
    np.testing.assert_allclose(got, np.linalg.inv(M), rtol=2e-3, atol=2e-4)


def _ba_problem(rng, nK=6, nP=150, noise_px=0.5, depth_noise=0.02,
                pose_noise=0.01):
    pts_gt = np.stack(
        [rng.uniform(-2, 2, nP), rng.uniform(-1.5, 1.5, nP), rng.uniform(3, 8, nP)],
        -1,
    ).astype(np.float32)
    kf_R, kf_t = [], []
    for k in range(nK):
        yaw = np.radians(1.5 * k)
        Rwc = np.array(
            [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]],
            np.float32,
        )
        c = np.array([-0.3 * k, 0.02 * k, 0.05 * k], np.float32)
        R = Rwc.T
        kf_R.append(R)
        kf_t.append(-R @ c)
    kf_R = np.stack(kf_R)
    kf_t = np.stack(kf_t)
    obs_kf = np.repeat(np.arange(nK), nP).astype(np.int32)
    obs_pt = np.tile(np.arange(nP), nK).astype(np.int32)
    pc = np.einsum("kij,pj->kpi", kf_R, pts_gt) + kf_t[:, None, :]
    uv = (pc[..., :2] / pc[..., 2:]) * [450, 450] + [320, 240]
    obs_uv = (uv.reshape(-1, 2) + rng.normal(0, noise_px, (nK * nP, 2))).astype(np.float32)
    pts0 = pts_gt * (1 + rng.normal(0, depth_noise, (nP, 1))).astype(np.float32)
    xi = rng.normal(0, pose_noise, (nK, 6)).astype(np.float32)
    xi[0] = 0
    dR, dt = se3.se3_exp(jnp.asarray(xi))
    kf_R0 = np.asarray(dR) @ kf_R
    kf_t0 = np.einsum("kij,kj->ki", np.asarray(dR), kf_t) + np.asarray(dt)
    return (pts_gt, kf_R, kf_t, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv)


def test_ba_converges_to_ground_truth(rng):
    nK, nP = 6, 150
    pts_gt, kf_Rg, kf_tg, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv = _ba_problem(rng)
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    O = len(obs_kf)
    res = bundle_adjust(
        jnp.asarray(kf_R0), jnp.asarray(kf_t0), jnp.asarray(pts0),
        jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.ones(O), jnp.ones(O, bool), jnp.asarray(fixed), jnp.ones(nP, bool),
        jnp.asarray(K), iterations=15,
    )
    assert float(res.cost) < float(res.cost0) / 10
    for k in range(1, nK):
        Re = np.asarray(res.kf_R)[k]
        rerr = np.degrees(
            np.arccos(np.clip((np.trace(Re.T @ kf_Rg[k]) - 1) / 2, -1, 1))
        )
        assert rerr < 0.1, f"cam {k} rot err {rerr}"
    # structure improves substantially
    e0 = np.median(np.linalg.norm(pts0 - pts_gt, axis=-1))
    e1 = np.median(np.linalg.norm(np.asarray(res.pts) - pts_gt, axis=-1))
    assert e1 < e0 * 0.5
    assert int(res.obs_inlier.sum()) == O


def test_fixed_cameras_do_not_move(rng):
    nK, nP = 6, 150
    _, _, _, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv = _ba_problem(rng)
    fixed = np.zeros(nK, bool)
    fixed[:3] = True
    O = len(obs_kf)
    res = bundle_adjust(
        jnp.asarray(kf_R0), jnp.asarray(kf_t0), jnp.asarray(pts0),
        jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.ones(O), jnp.ones(O, bool), jnp.asarray(fixed), jnp.ones(nP, bool),
        jnp.asarray(K), iterations=5,
    )
    np.testing.assert_array_equal(np.asarray(res.kf_R)[:3], kf_R0[:3])
    np.testing.assert_array_equal(np.asarray(res.kf_t)[:3], kf_t0[:3])


def test_invalid_obs_and_points_ignored(rng):
    nK, nP = 4, 80
    _, _, _, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv = _ba_problem(
        rng, nK=nK, nP=nP
    )
    O = len(obs_kf)
    obs_valid = np.ones(O, bool)
    obs_uv_bad = obs_uv.copy()
    obs_uv_bad[obs_valid.nonzero()[0][:50]] += 300  # corrupt 50 obs
    obs_valid[:50] = False                          # ...but mark invalid
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    res_bad = bundle_adjust(
        jnp.asarray(kf_R0), jnp.asarray(kf_t0), jnp.asarray(pts0),
        jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv_bad),
        jnp.ones(O), jnp.asarray(obs_valid), jnp.asarray(fixed),
        jnp.ones(nP, bool), jnp.asarray(K), iterations=8,
    )
    res_ref = bundle_adjust(
        jnp.asarray(kf_R0), jnp.asarray(kf_t0), jnp.asarray(pts0),
        jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.ones(O), jnp.asarray(obs_valid), jnp.asarray(fixed),
        jnp.ones(nP, bool), jnp.asarray(K), iterations=8,
    )
    # corrupting invalid observations must not change the result
    np.testing.assert_allclose(
        np.asarray(res_bad.kf_t), np.asarray(res_ref.kf_t), atol=1e-6
    )


def test_bounded_free_cam_window_matches_full(rng):
    """max_free_cams (the compact Schur coupling) must reproduce the
    unbounded solve when the free-camera count fits the bound."""
    import jax.numpy as jnp

    from orb_slam_tracking_tpu.utils.synthetic import synthetic_ba_problem

    nK, nP = 8, 256
    pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv, K = synthetic_ba_problem(
        7, nK, nP
    )
    O = nK * nP
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    fixed[3] = True  # fixed camera in the middle: exercises rank packing
    args = (
        jnp.asarray(kf_R0), jnp.asarray(kf_t0), jnp.asarray(pts0),
        jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.ones(O), jnp.ones(O, bool), jnp.asarray(fixed),
        jnp.ones(nP, bool), jnp.asarray(K),
    )
    full = bundle_adjust(*args, iterations=8)
    # bound exactly at the free count (6) and above it (7)
    for nf in (6, 7):
        bounded = bundle_adjust(*args, iterations=8, max_free_cams=nf)
        np.testing.assert_allclose(
            np.asarray(bounded.kf_t), np.asarray(full.kf_t), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(bounded.pts), np.asarray(full.pts), atol=1e-5
        )
        # relative: f32 accumulation order differs between the bounded
        # and full programs (different Wb shapes reassociate the sums)
        assert (abs(float(bounded.cost) - float(full.cost))
                < 1e-5 * abs(float(full.cost)))


def test_overflow_free_cams_demoted_to_fixed(rng):
    """Free cameras beyond max_free_cams must be treated as FIXED (zero
    update) — not silently collapsed into the last compact slot (advisor
    finding, round 2): their poses stay exactly at the input, and the
    in-window cameras still improve."""
    import jax.numpy as jnp

    from orb_slam_tracking_tpu.utils.synthetic import synthetic_ba_problem

    nK, nP = 8, 256
    pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv, K = synthetic_ba_problem(
        7, nK, nP
    )
    O = nK * nP
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    args = (
        jnp.asarray(kf_R0), jnp.asarray(kf_t0), jnp.asarray(pts0),
        jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.ones(O), jnp.ones(O, bool), jnp.asarray(fixed),
        jnp.ones(nP, bool), jnp.asarray(K),
    )
    # 7 free cameras, window of 3: free ranks 3.. (cams 4..7) overflow
    res = bundle_adjust(*args, iterations=6, max_free_cams=3)
    # overflow cameras (free ranks >= 3 -> kf indices 4..7) are untouched
    np.testing.assert_array_equal(
        np.asarray(res.kf_R)[4:], kf_R0[4:])
    np.testing.assert_array_equal(
        np.asarray(res.kf_t)[4:], kf_t0[4:])
    # the solve still reduces cost (window cams + points moved)
    assert float(res.cost) < float(res.cost0)


def test_ba_early_stop_gate_matches_ungated(rng):
    """The data-dependent convergence gate (ba.early_stop_rel, the g2o
    "Raul" early-termination capability) must not change WHERE the solve
    converges — only how many scan steps do work. On a well-conditioned
    problem both variants reach the same cost basin and poses."""
    nK, nP = 6, 150
    _, kf_Rg, _, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv = _ba_problem(rng)
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    O = len(obs_kf)
    args = (
        jnp.asarray(kf_R0), jnp.asarray(kf_t0), jnp.asarray(pts0),
        jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.ones(O), jnp.ones(O, bool), jnp.asarray(fixed),
        jnp.ones(nP, bool), jnp.asarray(K),
    )
    ref = bundle_adjust(*args, iterations=15)
    gated = bundle_adjust(*args, iterations=15, early_stop_rel=1e-4)
    # both converge hard; the gate stops within the same basin
    assert float(gated.cost) < float(gated.cost0) / 10
    assert float(gated.cost) <= float(ref.cost) * 1.02 + 1e-3
    assert np.abs(np.asarray(gated.kf_R) - np.asarray(ref.kf_R)).max() < 5e-4
    assert np.abs(np.asarray(gated.kf_t) - np.asarray(ref.kf_t)).max() < 5e-3


def test_ba_early_stop_gate_skips_iterations(rng):
    """Once gated-out, extra iterations are no-ops: running 15 vs 50
    iterations with the gate produces bit-identical results (the scan's
    remaining steps take the identity branch)."""
    nK, nP = 6, 150
    _, _, _, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv = _ba_problem(rng)
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    O = len(obs_kf)
    args = (
        jnp.asarray(kf_R0), jnp.asarray(kf_t0), jnp.asarray(pts0),
        jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.ones(O), jnp.ones(O, bool), jnp.asarray(fixed),
        jnp.ones(nP, bool), jnp.asarray(K),
    )
    a = bundle_adjust(*args, iterations=15, early_stop_rel=1e-3)
    b = bundle_adjust(*args, iterations=50, early_stop_rel=1e-3)
    assert float(a.cost) == float(b.cost)
    assert np.array_equal(np.asarray(a.kf_R), np.asarray(b.kf_R))
    assert np.array_equal(np.asarray(a.pts), np.asarray(b.pts))


def test_ba_gate_survives_midsolve_rejections():
    """Regression (advisor r4 high): the early-stop gate's skip predicate
    read the rejects counter instead of `done`, so the FIRST rejected LM
    step permanently froze the solve. Also guards the round-5 gate
    semantics: a 28-deg-perturbed start with 20% gross outliers produces
    runs of 3-4 consecutive mid-solve rejections (measured: seed 0
    rejects iterations 1-3 then descends 254223 -> 165565 — the buggy
    predicate froze at 254223 and the old rejects>=3 streak terminated
    there too; seed 2 rejects iterations 6-9 mid-descent). The gated
    solve must keep descending through the streaks and land exactly
    where the ungated one does."""
    for seed in (0, 2):  # seed 0: 3-streak early; seed 2: 4-streak mid-solve
        rng = np.random.default_rng(seed)
        nK, nP = 6, 150
        _, _, _, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv = _ba_problem(
            rng, noise_px=1.0, depth_noise=0.2, pose_noise=0.3)
        # gross outliers: 20% of observations displaced up to 250 px
        n_out = int(len(obs_uv) * 0.2)
        idx = rng.choice(len(obs_uv), n_out, replace=False)
        obs_uv = obs_uv.copy()
        obs_uv[idx] += rng.uniform(-250, 250, (n_out, 2)).astype(np.float32)
        fixed = np.zeros(nK, bool)
        fixed[0] = True
        O = len(obs_kf)
        args = (
            jnp.asarray(kf_R0), jnp.asarray(kf_t0), jnp.asarray(pts0),
            jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
            jnp.ones(O), jnp.ones(O, bool), jnp.asarray(fixed),
            jnp.ones(nP, bool), jnp.asarray(K),
        )
        ref = bundle_adjust(*args, iterations=13)
        gated = bundle_adjust(*args, iterations=13, early_stop_rel=1e-4)
        # the buggy predicate froze at the first rejection (cost ~= the
        # 1-2 iteration value, 1.3-1.7x the 13-iter cost on these seeds)
        assert float(gated.cost) <= float(ref.cost) * 1.05 + 1e-3, (
            f"seed {seed}: gated solve froze mid-descent: "
            f"{float(gated.cost)} vs ungated {float(ref.cost)}")


def test_segment_mode_sorted_matches_scatter(rng):
    """The sorted (one-hot matmul + cumsum-difference) segment-sum
    formulation must reproduce the scatter formulation: same converged
    poses/structure to f32-accumulation tolerance, and obs_inlier
    returned in the ORIGINAL observation order."""
    nK, nP = 6, 150
    (pts_gt, kf_Rg, kf_tg, pts0, kf_R0, kf_t0,
     obs_kf, obs_pt, obs_uv) = _ba_problem(rng)
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    O = len(obs_kf)
    # shuffle the observation order so the sort actually permutes
    perm = rng.permutation(O)
    obs_kf, obs_pt, obs_uv = obs_kf[perm], obs_pt[perm], obs_uv[perm]
    valid = np.ones(O, bool)
    valid[::17] = False  # exercise the invalid-obs path through the sort
    common = (jnp.asarray(obs_kf), jnp.asarray(obs_pt),
              jnp.asarray(obs_uv), jnp.ones(O), jnp.asarray(valid),
              jnp.asarray(fixed), jnp.ones(nP, bool), jnp.asarray(K))
    a = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts0), *common, iterations=12)
    b = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts0), *common, iterations=12,
                      segment_mode="sorted")
    assert float(b.cost) < float(b.cost0) / 10
    assert abs(float(a.cost) - float(b.cost)) < 1e-3 * abs(float(a.cost))
    np.testing.assert_allclose(np.asarray(a.kf_t), np.asarray(b.kf_t),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(a.pts), np.asarray(b.pts),
                               atol=5e-3)
    # inlier flags come back in input order: invalid slots stay False
    bi = np.asarray(b.obs_inlier)
    assert not bi[~valid].any()
    ai = np.asarray(a.obs_inlier)
    assert (ai == bi).mean() > 0.99


def test_segment_mode_unique_matches_scatter(rng):
    """The unique-index (one-hot matmul + dense-reduce) formulation must
    reproduce the scatter formulation. (point, keyframe) pairs are
    unique per observation by map construction — the invariant this
    mode rests on."""
    nK, nP = 6, 150
    (pts_gt, kf_Rg, kf_tg, pts0, kf_R0, kf_t0,
     obs_kf, obs_pt, obs_uv) = _ba_problem(rng)
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    O = len(obs_kf)
    valid = np.ones(O, bool)
    valid[::13] = False
    common = (jnp.asarray(obs_kf), jnp.asarray(obs_pt),
              jnp.asarray(obs_uv), jnp.ones(O), jnp.asarray(valid),
              jnp.asarray(fixed), jnp.ones(nP, bool), jnp.asarray(K))
    a = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts0), *common, iterations=12)
    b = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts0), *common, iterations=12,
                      segment_mode="unique")
    assert float(b.cost) < float(b.cost0) / 10
    assert abs(float(a.cost) - float(b.cost)) < 1e-3 * abs(float(a.cost))
    np.testing.assert_allclose(np.asarray(a.kf_t), np.asarray(b.kf_t),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(a.pts), np.asarray(b.pts),
                               atol=5e-3)
    assert (np.asarray(a.obs_inlier) == np.asarray(b.obs_inlier)).mean() > 0.99


def test_segment_mode_factored_matches_scatter(rng):
    """Factored point one-hot segmentation (two matmul stages) must
    match the scatter formulation, including with nP not a multiple of
    the 128 factor base."""
    nK, nP = 6, 150  # 150 deliberately not a multiple of 128
    (_, _, _, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv) = _ba_problem(rng)
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    O = len(obs_kf)
    valid = np.ones(O, bool)
    valid[::11] = False
    common = (jnp.asarray(obs_kf), jnp.asarray(obs_pt),
              jnp.asarray(obs_uv), jnp.ones(O), jnp.asarray(valid),
              jnp.asarray(fixed), jnp.ones(nP, bool), jnp.asarray(K))
    a = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts0), *common, iterations=12)
    b = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts0), *common, iterations=12,
                      segment_mode="factored")
    assert float(b.cost) < float(b.cost0) / 10
    assert abs(float(a.cost) - float(b.cost)) < 1e-3 * abs(float(a.cost))
    np.testing.assert_allclose(np.asarray(a.kf_t), np.asarray(b.kf_t),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(a.pts), np.asarray(b.pts),
                               atol=5e-3)


def test_segment_mode_cammajor_multi_row_camera(rng):
    """cammajor must stay exact when one camera's observation count
    exceeds the Mc row width (default 256): its observations span
    MULTIPLE [Mc] rows and nothing may be dropped. Build a problem
    where camera 0 carries ~300 observations (> 256) plus invalid
    fillers and a fixed camera, and require the scatter optimum."""
    nK, nP = 4, 320
    kf_R0 = np.stack([np.eye(3, dtype=np.float32)] * nK)
    kf_t0 = rng.normal(0, 0.05, (nK, 3)).astype(np.float32)
    kf_t0[:, 2] -= 2.0
    pts = rng.normal(0, 0.8, (nP, 3)).astype(np.float32)
    # camera 0 sees every point (320 obs > Mc); the others see half
    obs_kf, obs_pt = [], []
    for k in range(nK):
        seen = np.arange(nP) if k == 0 else np.arange(0, nP, 2)
        obs_kf.append(np.full(len(seen), k, np.int32))
        obs_pt.append(seen.astype(np.int32))
    obs_kf = np.concatenate(obs_kf)
    obs_pt = np.concatenate(obs_pt)
    O = len(obs_kf)
    # project with the true geometry + noise for a well-posed problem
    fx, fy, cx, cy = K[0][0], K[1][1], K[0][2], K[1][2]
    X = pts[obs_pt] + kf_t0[obs_kf]
    obs_uv = np.stack([fx * X[:, 0] / X[:, 2] + cx,
                       fy * X[:, 1] / X[:, 2] + cy], 1).astype(np.float32)
    obs_uv += rng.normal(0, 0.5, obs_uv.shape).astype(np.float32)
    valid = np.ones(O, bool)
    valid[::13] = False
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    common = (jnp.asarray(obs_kf), jnp.asarray(obs_pt),
              jnp.asarray(obs_uv), jnp.ones(O), jnp.asarray(valid),
              jnp.asarray(fixed), jnp.ones(nP, bool), jnp.asarray(K))
    a = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts), *common, iterations=10,
                      segment_mode="scatter")
    b = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts), *common, iterations=10,
                      segment_mode="cammajor")
    assert float(b.cost) < float(b.cost0)
    assert abs(float(a.cost) - float(b.cost)) < 1e-3 * abs(float(a.cost))
    np.testing.assert_allclose(np.asarray(a.kf_t), np.asarray(b.kf_t),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(a.pts), np.asarray(b.pts),
                               atol=5e-3)
    # the inlier mask must come back in the ORIGINAL observation order
    assert np.asarray(b.obs_inlier).shape == (O,)
    assert not np.asarray(b.obs_inlier)[~valid].any()
    assert (np.asarray(a.obs_inlier) == np.asarray(b.obs_inlier)).mean() \
        > 0.99


def test_segment_mode_unique_bounded_window(rng):
    """unique mode with a bounded free-camera window: out-of-window
    couplings must drop exactly as the scatter path's dump slot drops
    them."""
    nK, nP = 6, 150
    (_, _, _, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv) = _ba_problem(rng)
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    O = len(obs_kf)
    common = (jnp.asarray(obs_kf), jnp.asarray(obs_pt),
              jnp.asarray(obs_uv), jnp.ones(O), jnp.ones(O, bool),
              jnp.asarray(fixed), jnp.ones(nP, bool), jnp.asarray(K))
    a = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts0), *common, iterations=8,
                      max_free_cams=3)
    b = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts0), *common, iterations=8,
                      max_free_cams=3, segment_mode="unique")
    np.testing.assert_allclose(np.asarray(a.kf_t), np.asarray(b.kf_t),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(a.pts), np.asarray(b.pts),
                               atol=5e-3)


def test_segment_modes_with_map_filler_padding(rng):
    """Fixed-capacity maps pad unused observation slots with
    (obs_kf=0, obs_pt=0, valid=False) — slam/map.py. Every segment mode
    must be exact under MANY such duplicate fillers (review finding r5:
    the sorted window once dropped point 0's real observations; the
    unique mode once made a false uniqueness promise)."""
    nK, nP = 6, 150
    (_, _, _, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv) = _ba_problem(rng)
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    O_real = len(obs_kf)
    n_fill = 400  # far more fillers than the per-point window (nK)
    obs_kf = np.concatenate([obs_kf, np.zeros(n_fill, np.int32)])
    obs_pt = np.concatenate([obs_pt, np.zeros(n_fill, np.int32)])
    obs_uv = np.concatenate([obs_uv, np.zeros((n_fill, 2), np.float32)])
    valid = np.concatenate([np.ones(O_real, bool), np.zeros(n_fill, bool)])
    O = O_real + n_fill
    common = (jnp.asarray(obs_kf), jnp.asarray(obs_pt),
              jnp.asarray(obs_uv), jnp.ones(O), jnp.asarray(valid),
              jnp.asarray(fixed), jnp.ones(nP, bool), jnp.asarray(K))
    ref = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                        jnp.asarray(pts0), *common, iterations=10,
                        segment_mode="scatter")
    for mode in ("sorted", "unique", "factored", "cammajor"):
        got = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                            jnp.asarray(pts0), *common, iterations=10,
                            segment_mode=mode)
        assert abs(float(ref.cost) - float(got.cost)) \
            < 1e-3 * abs(float(ref.cost)), mode
        np.testing.assert_allclose(np.asarray(ref.kf_t),
                                   np.asarray(got.kf_t), atol=5e-4,
                                   err_msg=mode)
        # point 0 must actually move together with the reference (the
        # sorted-window bug left it nearly untouched)
        np.testing.assert_allclose(np.asarray(ref.pts)[0],
                                   np.asarray(got.pts)[0], atol=5e-3,
                                   err_msg=mode)


def test_segment_mode_unknown_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="segment_mode"):
        bundle_adjust(
            jnp.eye(3)[None], jnp.zeros((1, 3)), jnp.zeros((4, 3)),
            jnp.zeros(8, jnp.int32), jnp.zeros(8, jnp.int32),
            jnp.zeros((8, 2)), jnp.ones(8), jnp.ones(8, bool),
            jnp.zeros(1, bool), jnp.ones(4, bool), jnp.asarray(K),
            iterations=1, segment_mode="factred")


def test_segment_mode_auto_resolves_per_backend(monkeypatch):
    """'auto' must resolve to scatter on CPU (tests run there) and the
    string must reach the cammajor path on TPU — pinned by checking the
    resolution logic directly."""
    import jax

    assert jax.default_backend() == "cpu"
    # on CPU, auto == scatter: results must be bitwise-identical
    rng = np.random.default_rng(3)
    nK, nP = 4, 64
    (_, _, _, pts0, kf_R0, kf_t0, obs_kf, obs_pt, obs_uv) = _ba_problem(
        rng, nK=nK, nP=nP)
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    O = len(obs_kf)
    common = (jnp.asarray(obs_kf), jnp.asarray(obs_pt),
              jnp.asarray(obs_uv), jnp.ones(O), jnp.ones(O, bool),
              jnp.asarray(fixed), jnp.ones(nP, bool), jnp.asarray(K))
    a = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts0), *common, iterations=4,
                      segment_mode="auto")
    b = bundle_adjust(jnp.asarray(kf_R0), jnp.asarray(kf_t0),
                      jnp.asarray(pts0), *common, iterations=4,
                      segment_mode="scatter")
    np.testing.assert_array_equal(np.asarray(a.kf_t), np.asarray(b.kf_t))
    np.testing.assert_array_equal(np.asarray(a.pts), np.asarray(b.pts))
