"""One-process TPU measurement session: extraction + fused tracking step.

Chained two-point protocol (see BASELINE.md): scan-fused bodies so the
per-call dispatch amortizes over 8 frames; a drain chain runs before any
timing (the relay's first post-warmup fetch carries one-time cost).
"""

import sys

sys.path.insert(0, "/root/repo")

import json
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
from orb_slam_tracking_tpu.ops.extractor import orb_extract
from orb_slam_tracking_tpu.slam.fused_step import make_tracking_step

rng = np.random.default_rng(0)
base = rng.uniform(0, 255, (480, 640)).astype(np.float32)

# --- extraction: 2000 kp operating point (BASELINE config[1]) ---
ecfg = OrbConfig(n_features=2000, max_keypoints=2048)


def probe_all(kps):
    return (jnp.sum(kps.response) + jnp.sum(kps.angle_deg) + jnp.sum(kps.xy)
            + jnp.sum(kps.desc.astype(jnp.float32))
            + jnp.sum(kps.valid.astype(jnp.float32)) + jnp.sum(kps.size)
            + jnp.sum(kps.octave.astype(jnp.float32)))


@jax.jit
def extract_scan8(x):
    def body(c, _):
        kps = orb_extract(c, ecfg)
        return c + probe_all(kps) * 1e-12, None
    out, _ = jax.lax.scan(body, x, None, length=8)
    return out


# --- tracking step: 1000 kp + 8192-pt map (anchor-matched shape) ---
CAM = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)
tcfg = TrackerConfig()
ocfg1 = OrbConfig(n_features=1000)
step = make_tracking_step(CAM, ocfg1, MatcherConfig(), tcfg)

# map from back-projected keypoints of the base image (same recipe as
# native/tracking_anchor.cpp)
kps0 = jax.jit(lambda im: orb_extract(im, ocfg1))(jnp.asarray(base))
kx = np.asarray(kps0.xy)
kd = np.asarray(kps0.desc)
kv = np.asarray(kps0.valid)
P = 8192
sel = np.where(kv)[0]
rep = np.concatenate([sel, rng.choice(sel, P - len(sel))])
z = rng.uniform(4.0, 9.0, P).astype(np.float32)
X = (kx[rep, 0] - CAM.cx) / CAM.fx * z
Y = (kx[rep, 1] - CAM.cy) / CAM.fy * z
map_pts = jnp.asarray(np.stack([X, Y, z], -1))
md = kd[rep].copy()
# jitter replica descriptors a little, like the anchor
flip = rng.integers(0, 256, (P, 5))
for i in range(len(sel), P):
    for b in flip[i]:
        md[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
map_desc = jnp.asarray(md)
map_valid = jnp.ones(P, bool)
K = jnp.asarray(np.array([[450.0, 0, 320], [0, 450, 240], [0, 0, 1]], np.float32))
eye = jnp.eye(3)
zero = jnp.zeros(3)


@jax.jit
def track_scan8(carry):
    x, R, t = carry

    def body(c, _):
        img, R, t = c
        r = step(img, map_pts, map_desc, map_valid, R, t, R, t, K)
        probe = (
            jnp.sum(r.R) + jnp.sum(r.t) + r.n_inliers + r.n_matches1
            + r.n_matches2 + r.n_kps + jnp.sum(r.kp_for_point)
            + jnp.sum(r.inlier) + jnp.sum(r.visible)
            + probe_all(r.kps) + jnp.sum(r.xy_un)
        )
        img2 = img + probe.astype(jnp.float32) * 1e-12
        return (img2, r.R, r.t), None

    out, _ = jax.lax.scan(body, (x, R, t), None, length=8)
    return out


def timeit(fn, arg, n1, n2, fpc, fetch):
    xx = arg
    t0 = time.time()
    for _ in range(n1):
        xx = fn(xx)
    _ = fetch(xx)
    ta = time.time() - t0
    xx = arg
    t0 = time.time()
    for _ in range(n2):
        xx = fn(xx)
    _ = fetch(xx)
    tb = time.time() - t0
    per = (tb - ta) / ((n2 - n1) * fpc)
    return per, ta, tb


def main():
    x = jnp.asarray(base)
    y = extract_scan8(x)
    _ = float(y[0, 0])
    print("warm extract done", flush=True)
    c = track_scan8((x, eye, zero))
    _ = float(c[0][0, 0])
    print("warm track done", flush=True)
    # drains
    xx = x
    for _ in range(4):
        xx = extract_scan8(xx)
    _ = float(xx[0, 0])
    cc = (x, eye, zero)
    for _ in range(4):
        cc = track_scan8(cc)
    _ = float(cc[0][0, 0])
    print("drain done", flush=True)

    per, ta, tb = timeit(extract_scan8, x, 4, 12, 8, lambda v: float(v[0, 0]))
    print(json.dumps({"what": "extraction", "ms": per * 1e3,
                      "fps": 1.0 / per, "ta": ta, "tb": tb}), flush=True)
    per, ta, tb = timeit(track_scan8, (x, eye, zero), 4, 12, 8,
                         lambda v: float(v[0][0, 0]))
    print(json.dumps({"what": "tracking_step", "ms": per * 1e3,
                      "fps": 1.0 / per, "ta": ta, "tb": tb}), flush=True)


if __name__ == "__main__":
    main()
