"""DP multi-sequence tracking with GROWING per-sequence maps: the
device-side local-mapping loop under vmap + dp sharding
(``parallel.multiseq.make_multiseq_mapping_runner``)."""

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
from orb_slam_tracking_tpu.parallel.multiseq import (
    make_dp_mesh,
    make_multiseq_mapping_runner,
)
from orb_slam_tracking_tpu.slam.map import empty_map, update_normal_and_depth
from orb_slam_tracking_tpu.utils.synthetic import (
    CornerField,
    make_trajectory,
    render_frame,
)

CAM = CameraConfig(fx=120.0, fy=120.0, cx=64.0, cy=48.0,
                   width=128, height=96)
OCFG = OrbConfig(n_features=64, n_levels=3, select_cell_size=8,
                 max_keypoints=64)
TCFG = TrackerConfig(
    max_map_points=256, max_keyframes=8, ba_window=3, ba_iterations=2,
    min_frames=0, max_frames=3, min_tracked_inliers=8,
    covis_min_shared=8, use_loop_closing=False, use_bow=False,
    # the 128x96 render localizes keypoints to ~2px; the default 3px
    # tight-rematch radius is too strict at this miniature scale
    local_map_radius=6.0,
)


def _gt_seeded_map(field, frame0, R0, t0):
    """A SlamMap seeded from ground truth: frame-0 keypoints associated
    to the nearest projected field point (the oracle version of two-view
    init, so the test isolates the device mapping loop itself)."""
    kps = jax.jit(lambda im: orb_extract(im, OCFG))(jnp.asarray(frame0))
    kxy = np.asarray(kps.xy)
    kv = np.asarray(kps.valid)
    pc = field.pts @ R0.T + t0
    uv = pc[:, :2] / pc[:, 2:] * [CAM.fx, CAM.fy] + [CAM.cx, CAM.cy]
    m = empty_map(TCFG, kp_capacity=OCFG.max_keypoints)

    kp_pt = np.full(OCFG.max_keypoints, -1, np.int32)
    pts, descs = [], []
    for i in np.where(kv)[0]:
        d2 = np.sum((uv - kxy[i]) ** 2, -1)
        j = int(np.argmin(d2))
        if d2[j] < 4.0 and pc[j, 2] > 0.3:
            kp_pt[i] = len(pts)
            pts.append(field.pts[j])
            descs.append(np.asarray(kps.desc)[i])
    n = len(pts)
    assert n >= 20, f"too few seeded points: {n}"
    sel = np.arange(n)
    kp_rows = np.where(kp_pt >= 0)[0]
    m = m._replace(
        pts=m.pts.at[sel].set(jnp.asarray(np.stack(pts))),
        desc=m.desc.at[sel].set(jnp.asarray(np.stack(descs))),
        pt_valid=m.pt_valid.at[sel].set(True),
        n_obs=m.n_obs.at[sel].set(2),
        kf_R=m.kf_R.at[0].set(jnp.asarray(R0)),
        kf_t=m.kf_t.at[0].set(jnp.asarray(t0)),
        kf_valid=m.kf_valid.at[0].set(True),
        kf_frame_id=m.kf_frame_id.at[0].set(0),
        kf_kp_xy=m.kf_kp_xy.at[0].set(kps.xy),
        kf_kp_desc=m.kf_kp_desc.at[0].set(kps.desc),
        kf_kp_octave=m.kf_kp_octave.at[0].set(kps.octave),
        kf_kp_angle=m.kf_kp_angle.at[0].set(kps.angle_deg),
        kf_kp_valid=m.kf_kp_valid.at[0].set(kps.valid),
        kf_kp_pt=m.kf_kp_pt.at[0].set(jnp.asarray(kp_pt)),
        obs_kf=m.obs_kf.at[:n].set(0),
        obs_pt=m.obs_pt.at[:n].set(jnp.asarray(sel.astype(np.int32))),
        obs_kp=m.obs_kp.at[:n].set(jnp.asarray(kp_rows.astype(np.int32))),
        obs_uv=m.obs_uv.at[:n].set(jnp.asarray(kxy[kp_rows])),
        obs_inv_sigma2=m.obs_inv_sigma2.at[:n].set(1.0),
        obs_valid=m.obs_valid.at[:n].set(True),
    )
    return update_normal_and_depth(m, OCFG.scale_factor, OCFG.n_levels), n


def test_multiseq_mapping_runner(rng):
    field = CornerField(rng, n=300, x=(-2.5, 2.5), y=(-2.0, 2.0),
                        z=(2.5, 5.0))
    T = 6
    # gentle per-frame motion: a 7-frame slice of a 24-frame strafe
    # (the full 1.2-unit strafe in 7 frames overruns this tiny FOV)
    poses = make_trajectory(24, "strafe")[: T + 1]
    frames = [render_frame(field, CAM, R, t) for R, t in poses]
    R0, t0 = poses[0]
    m1, n_seed = _gt_seeded_map(field, frames[0], R0, t0)

    mesh = make_dp_mesh()
    B = len(jax.devices())
    run = make_multiseq_mapping_runner(
        mesh, CAM, OCFG, MatcherConfig(), TCFG, tri_cap=32, obs_cap=64)

    # replicate the single sequence across the dp axis
    mB = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape).copy(), m1)
    images = jnp.broadcast_to(
        jnp.asarray(np.stack(frames[1:]).astype(np.float32)),
        (B, T, CAM.height, CAM.width)).copy()
    RB = jnp.broadcast_to(jnp.asarray(R0), (B, 3, 3)).copy()
    tB = jnp.broadcast_to(jnp.asarray(t0), (B, 3)).copy()
    K = jnp.asarray(np.array(
        [[CAM.fx, 0, CAM.cx], [0, CAM.fy, CAM.cy], [0, 0, 1]], np.float32))
    ones = jnp.ones((B,), jnp.int32)
    m_out, outs = run(images, mB, RB, tB, K, ones, ones,
                      jnp.full((B,), n_seed, jnp.int32))

    lost = np.asarray(outs.lost)
    assert lost.sum() == 0, f"lost frames: {lost}"
    ins = np.asarray(outs.inserted_kf)
    assert ins[0].sum() >= 1, f"no keyframes inserted: {ins[0]}"

    # all replicated sequences produce the identical result
    R_all = np.asarray(outs.R)
    for b in range(1, B):
        np.testing.assert_array_equal(R_all[b], R_all[0])
    np.testing.assert_array_equal(
        np.asarray(m_out.pt_valid)[1], np.asarray(m_out.pt_valid)[0])

    # pose accuracy vs GT on the tracked span
    for k in range(T):
        Rg, _ = poses[1 + k]
        err = np.degrees(np.arccos(np.clip(
            (np.trace(R_all[0][k].T @ Rg) - 1) / 2, -1, 1)))
        assert err < 3.0, (k, err)

    # maps grew beyond the seed in every sequence
    n_pts = np.asarray(m_out.pt_valid).sum(axis=1)
    assert (n_pts >= n_seed).all(), n_pts
