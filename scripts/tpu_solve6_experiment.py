#!/usr/bin/env python
"""A/B the 6x6 damped-solve formulations inside the pose-LM chain.

The fused tracking step runs 24 sequential damped 6x6 solves; this
script times the REAL ``optimize_pose`` chain (1024 observations,
rounds=2 x iters=6, the flagship operating point) with

  a) the closed-form SPD block-Schur solve (``lm.solve_spd6``), and
  b) the generic pivoted-LU path (``jnp.linalg.solve``),

as two jitted programs in ONE process (within the <=2-remote-compile
wedge protocol), chained two-point timing per BASELINE.md methodology.
Usage: python scripts/tpu_solve6_experiment.py [--cpu]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import orb_slam_tracking_tpu.optim.pose_opt as pose_opt_mod
from orb_slam_tracking_tpu.geometry import se3

N = 1024
SCAN = 8
rng = np.random.default_rng(0)

pts = np.stack([
    rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(4, 9, N),
], -1).astype(np.float32)
K = np.array([[450.0, 0, 320.0], [0, 450.0, 240.0], [0, 0, 1]], np.float32)


def project(pts, R, t):
    pc = pts @ R.T + t
    return (pc[:, :2] / pc[:, 2:]) * np.array([450.0, 450.0]) + np.array(
        [320.0, 240.0])


uv = (project(pts, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
      + rng.normal(0, 0.7, (N, 2))).astype(np.float32)
w = rng.standard_normal(3)
w = w / np.linalg.norm(w) * np.radians(2.0)
v = rng.standard_normal(3) * 0.05
dR, dt = se3.se3_exp(jnp.asarray(np.concatenate([w, v]).astype(np.float32)))


def lu_solve_damped(H, b, lam):
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    eye = jnp.eye(H.shape[-1], dtype=H.dtype)
    return jnp.linalg.solve(H + lam * eye * diag[..., None, :], b)


def chain_of(tag):
    @jax.jit
    def run(carry):
        def body(c, _):
            R, t = c
            res = pose_opt_mod.optimize_pose.__wrapped__(
                R, t, jnp.asarray(pts), jnp.asarray(uv), jnp.ones(N),
                jnp.ones(N, bool), jnp.asarray(K), rounds=2,
                iters_per_round=6)
            # chain: feed the optimized pose forward, perturbed so the
            # next iteration does real work
            return (res.R, res.t + 1e-6 * res.chi2), None
        out, _ = jax.lax.scan(body, carry, None, length=SCAN)
        return out

    return run


def timed(name, fn):
    arg = (dR, dt)
    y = fn(arg)
    _ = float(y[1][0])
    xx = arg
    for _ in range(2):
        xx = fn(xx)
    _ = float(xx[1][0])
    xx = arg
    t0 = time.time()
    for _ in range(3):
        xx = fn(xx)
    _ = float(xx[1][0])
    ta = time.time() - t0
    xx = arg
    t0 = time.time()
    for _ in range(9):
        xx = fn(xx)
    _ = float(xx[1][0])
    tb = time.time() - t0
    per = (tb - ta) / ((9 - 3) * SCAN) * 1e3
    print(f"{name}: {per:.3f} ms per optimize_pose(2x6) "
          f"[{per / 12 * 1e3:.1f} us/LM-iter]", flush=True)
    return per


orig = pose_opt_mod.solve_damped

# a) current dispatch (solve_spd6 for 6-dim)
t_spd = timed("block-Schur spd6", chain_of("spd6"))

# b) generic LU
pose_opt_mod.solve_damped = lu_solve_damped
t_lu = timed("pivoted LU      ", chain_of("lu"))
pose_opt_mod.solve_damped = orig

print(f"speedup spd6 vs LU: {t_lu / t_spd:.2f}x", flush=True)
