"""One-process A/B: atlas vs per-level extraction at the bench operating
point (2000 kp, 8 levels, 640x480). Chained two-point protocol."""

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.config import OrbConfig
from orb_slam_tracking_tpu.ops.extractor import orb_extract

rng = np.random.default_rng(0)
base = rng.uniform(0, 255, (480, 640)).astype(np.float32)
SCAN = 8


def probe_all(kps):
    return (jnp.sum(kps.response) + jnp.sum(kps.angle_deg) + jnp.sum(kps.xy)
            + jnp.sum(kps.desc.astype(jnp.float32))
            + jnp.sum(kps.valid.astype(jnp.float32)) + jnp.sum(kps.size)
            + jnp.sum(kps.octave.astype(jnp.float32)))


def make_scan(cfg):
    @jax.jit
    def scan(x):
        def body(c, _):
            kps = orb_extract(c, cfg)
            return c + probe_all(kps) * 1e-12, None
        out, _ = jax.lax.scan(body, x, None, length=SCAN)
        return out
    return scan


def measure(fn, arg, n1=4, n2=12):
    y = fn(arg)
    _ = float(y[0, 0])
    xx = arg
    for _i in range(3):
        xx = fn(xx)
    _ = float(xx[0, 0])
    xx = arg
    t0 = time.time()
    for _i in range(n1):
        xx = fn(xx)
    _ = float(xx[0, 0])
    ta = time.time() - t0
    xx = arg
    t0 = time.time()
    for _i in range(n2):
        xx = fn(xx)
    _ = float(xx[0, 0])
    tb = time.time() - t0
    per = (tb - ta) / ((n2 - n1) * SCAN)
    return 1.0 / max(per, 1e-9), ta, tb


x = jnp.asarray(base)
for name, cfg in [
    ("atlas", OrbConfig(n_features=2000, max_keypoints=2048, use_atlas=True)),
    ("perlevel", OrbConfig(n_features=2000, max_keypoints=2048,
                           use_atlas=False)),
]:
    fps, ta, tb = measure(make_scan(cfg), x)
    print(f"{name}: {fps:.1f} fps  (t4={ta:.3f}s t12={tb:.3f}s)", flush=True)
