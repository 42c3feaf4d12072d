"""Fused tracking-step stage breakdown on TPU (chained two-point timing).

Four jits (kept low for the relay): extract-only; extract+match1;
extract+match1+opt1; full two-stage step. Deltas attribute time to the
projection match and the pose LM stages at the bench's exact shapes
(1000 kp, 8192-point map).
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.config import (
    CameraConfig,
    MatcherConfig,
    OrbConfig,
    TrackerConfig,
)
from orb_slam_tracking_tpu.geometry import camera
from orb_slam_tracking_tpu.ops.extractor import orb_extract
from orb_slam_tracking_tpu.ops.proj_matcher import search_by_projection
from orb_slam_tracking_tpu.optim.pose_opt import optimize_pose

SCAN = 8
rng = np.random.default_rng(0)
base = rng.uniform(0, 255, (480, 640)).astype(np.float32)
cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                   width=640, height=480)
ocfg = OrbConfig(n_features=1000)
mcfg = MatcherConfig()
tcfg = TrackerConfig()

kps0 = jax.jit(lambda im: orb_extract(im, ocfg))(jnp.asarray(base))
kx = np.asarray(kps0.xy)
kd = np.asarray(kps0.desc)
sel = np.where(np.asarray(kps0.valid))[0]
P = 8192
rep = np.concatenate([sel, rng.choice(sel, P - len(sel))])
z = rng.uniform(4.0, 9.0, P).astype(np.float32)
map_pts = jnp.asarray(np.stack([
    (kx[rep, 0] - cam.cx) / cam.fx * z,
    (kx[rep, 1] - cam.cy) / cam.fy * z,
    z,
], -1))
map_desc = jnp.asarray(kd[rep].copy())
map_valid = jnp.ones(P, bool)
zn = jnp.zeros((P, 3), jnp.float32)
zd = jnp.zeros((P,), jnp.float32)
K = jnp.asarray(np.array(
    [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float32))
scale = ocfg.scale_factor


def probe_all(kps):
    return (
        jnp.sum(kps.response) + jnp.sum(kps.angle_deg) + jnp.sum(kps.xy)
        + jnp.sum(kps.desc.astype(jnp.float32))
        + jnp.sum(kps.valid.astype(jnp.float32)) + jnp.sum(kps.size)
        + jnp.sum(kps.octave.astype(jnp.float32))
    )


def part_step(n_stages, with_opt1, with_match1):
    def step(image, R, t):
        kps = orb_extract(image, ocfg)
        xy_un = camera.undistort_pixels(cam, kps.xy)
        probe = probe_all(kps) + jnp.sum(xy_un)

        def match(Rm, tm, rad):
            return search_by_projection(
                map_pts, map_desc, map_valid, Rm, tm, K,
                kps.desc, xy_un, kps.valid, rad, mcfg,
                cam.width, cam.height,
                kp_octave=kps.octave, scale_factor=scale,
                pt_normal=zn, pt_dmin=zd, pt_dmax=zd,
                n_levels=ocfg.n_levels,
            )

        def optimize(Ro, to, pm):
            kp_idx = pm.kp_for_point
            matched = kp_idx >= 0
            safe = jnp.clip(kp_idx, 0)
            inv_s2 = 1.0 / scale ** (
                2.0 * kps.octave[safe].astype(jnp.float32))
            return optimize_pose(
                Ro, to, map_pts, xy_un[safe], inv_s2, matched, K,
                rounds=tcfg.pose_opt_rounds,
                iters_per_round=tcfg.pose_opt_iters)

        if with_match1:
            pm1 = match(R, t, tcfg.projection_radius)
            probe = probe + jnp.sum(pm1.kp_for_point) + pm1.n_matches \
                + jnp.sum(pm1.visible)
            if with_opt1:
                r1 = optimize(R, t, pm1)
                probe = probe + jnp.sum(r1.R) + jnp.sum(r1.t) \
                    + r1.n_inliers + jnp.sum(r1.inlier)
                R, t = r1.R, r1.t
                if n_stages == 2:
                    pm2 = match(R, t, tcfg.local_map_radius)
                    r2 = optimize(R, t, pm2)
                    probe = probe + jnp.sum(r2.R) + jnp.sum(r2.t) \
                        + r2.n_inliers + jnp.sum(pm2.kp_for_point) \
                        + pm2.n_matches + jnp.sum(r2.inlier) \
                        + jnp.sum(pm2.visible)
                    R, t = r2.R, r2.t
        return probe, R, t

    @jax.jit
    def scan_fn(carry):
        def body(c, _):
            img, R, t = c
            probe, R, t = step(img, R, t)
            return (img + probe.astype(jnp.float32) * 1e-12, R, t), None
        out, _ = jax.lax.scan(body, carry, None, length=SCAN)
        return out

    return scan_fn


def timed(name, fn):
    arg = (jnp.asarray(base), jnp.eye(3), jnp.zeros(3))
    try:
        y = fn(arg)
        _ = float(y[0][0, 0])
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:2000]}",
              flush=True)
        return
    xx = arg
    for _ in range(2):
        xx = fn(xx)
    _ = float(xx[0][0, 0])
    xx = arg
    t0 = time.time()
    for _ in range(4):
        xx = fn(xx)
    _ = float(xx[0][0, 0])
    ta = time.time() - t0
    xx = arg
    t0 = time.time()
    for _ in range(12):
        xx = fn(xx)
    _ = float(xx[0][0, 0])
    tb = time.time() - t0
    ms = (tb - ta) / (8 * SCAN) * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)


timed("extract_only", part_step(0, False, False))
timed("extract+match1", part_step(1, False, True))
timed("extract+match1+opt1", part_step(1, True, True))
timed("full_two_stage", part_step(2, True, True))
print("done", flush=True)
