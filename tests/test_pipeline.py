"""Pipeline-parallel tracking (parallel/pipeline.py): the 2-stage
extract|track stream must produce the SAME per-frame poses as the
sequential fused step with the identical constant-velocity carry
(SURVEY.md §2.3's optional PP strategy, realized as ppermute stages)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.config import (
    CameraConfig,
    MatcherConfig,
    OrbConfig,
    TrackerConfig,
)
from orb_slam_tracking_tpu.ops.extractor import orb_extract
from orb_slam_tracking_tpu.parallel.pipeline import (
    make_pipelined_tracker,
    make_pp_mesh,
)
from orb_slam_tracking_tpu.slam.fused_step import make_tracking_step
from orb_slam_tracking_tpu.utils.synthetic import (
    CornerField,
    make_trajectory,
    render_frame,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _build_scene(rng, cam, ocfg, T):
    field = CornerField(rng, n=500)
    poses = make_trajectory(16, "strafe")
    frames = np.stack([
        render_frame(field, cam, R, t) for R, t in poses[:T]
    ]).astype(np.float32)
    kps = orb_extract(jnp.asarray(frames[0]), ocfg)
    kxy = np.asarray(kps.xy)
    kval = np.asarray(kps.valid)
    R0, t0 = poses[0]
    pc = field.pts @ R0.T + t0
    proj = (pc[:, :2] / pc[:, 2:]) * [cam.fx, cam.fy] + [cam.cx, cam.cy]
    P = 512
    map_pts = np.zeros((P, 3), np.float32)
    map_desc = np.zeros((P, 8), np.uint32)
    map_valid = np.zeros(P, bool)
    n = 0
    for i in np.where(kval)[0]:
        d = np.linalg.norm(proj - kxy[i], axis=1)
        j = int(np.argmin(d))
        if d[j] < 3.0 and n < P:
            map_pts[n] = field.pts[j]
            map_desc[n] = np.asarray(kps.desc[i])
            map_valid[n] = True
            n += 1
    assert n > 60
    return frames, map_pts, map_desc, map_valid, poses, P


def test_pipeline_matches_sequential(rng):
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    ocfg = OrbConfig(n_features=300)
    mcfg, tcfg = MatcherConfig(), TrackerConfig()
    T = 5
    frames, map_pts, map_desc, map_valid, poses, P = _build_scene(
        rng, cam, ocfg, T)
    R0, t0 = poses[0]
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                 np.float32)
    zeros_n = jnp.zeros((P, 3), jnp.float32)
    dmin = jnp.zeros(P, jnp.float32)
    dmax = jnp.zeros(P, jnp.float32)

    # ---- sequential reference: fused step + the same CV carry ----
    step = make_tracking_step(cam, ocfg, mcfg, tcfg)
    R = jnp.asarray(R0, jnp.float32)
    t = jnp.asarray(t0, jnp.float32)
    vel_R, vel_t, have_vel = jnp.eye(3), jnp.zeros(3), False
    seq_R, seq_t, seq_inl = [], [], []
    for f in range(T):
        R_pred = vel_R @ R if have_vel else R
        t_pred = vel_R @ t + vel_t if have_vel else t
        r = step(jnp.asarray(frames[f]), jnp.asarray(map_pts),
                 jnp.asarray(map_desc), jnp.asarray(map_valid),
                 zeros_n, dmin, dmax,
                 R_pred, t_pred, R, t, jnp.asarray(K))
        vel_R = r.R @ R.T
        vel_t = r.t - vel_R @ t
        have_vel = True
        R, t = r.R, r.t
        seq_R.append(np.asarray(r.R))
        seq_t.append(np.asarray(r.t))
        seq_inl.append(int(r.n_inliers))

    # ---- pipelined: 2-stage pp mesh ----
    mesh = make_pp_mesh()
    run = make_pipelined_tracker(mesh, cam, ocfg, mcfg, tcfg)
    out = run(jnp.asarray(frames), jnp.asarray(map_pts),
              jnp.asarray(map_desc), jnp.asarray(map_valid),
              zeros_n, dmin, dmax,
              jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
              jnp.asarray(K))
    assert out.R.shape == (T, 3, 3)
    for f in range(T):
        np.testing.assert_allclose(np.asarray(out.R)[f], seq_R[f],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.t)[f], seq_t[f],
                                   atol=1e-4)
        assert int(out.n_inliers[f]) == seq_inl[f], f
        assert int(out.n_inliers[f]) >= 10, f

    # and the stream still tracks ground truth
    for f in range(T):
        Rg, tg = poses[f]
        rerr = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(out.R)[f].T @ Rg) - 1) / 2, -1, 1)))
        assert rerr < 1.5, (f, rerr)
        assert np.linalg.norm(np.asarray(out.t)[f] - tg) < 0.08, f


def test_pp_mesh_requires_two_stages():
    from jax.sharding import Mesh

    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    with pytest.raises(ValueError):
        make_pipelined_tracker(
            Mesh(np.asarray(jax.devices()[:1]), ("pp",)),
            cam, OrbConfig(), MatcherConfig(), TrackerConfig())
