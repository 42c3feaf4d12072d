#!/usr/bin/env python
"""Canonical local-BA benchmark problem (BASELINE config[3]) and its
measurement harness.

The SAME synthetic problem feeds two solvers:

- ``--dump FILE``: write the problem as a flat binary for the CPU anchor
  ``native/ba_anchor.cpp``, which runs it through the reference's own
  vendored g2o (``BlockSolver_6_3`` + ``OptimizationAlgorithmLevenberg``,
  ``Thirdparty/g2o/g2o/core/block_solver.h:150-155``,
  ``optimization_algorithm_levenberg.cpp:61-164``) — the exact CPU
  competitor the reference ships for bundle adjustment.
- ``--run``: measure this framework's ``optim.ba.bundle_adjust`` on the
  current backend (chained two-point timing, 10-iteration solves).

Canonical problem (``--shape local20``): 20 keyframes strafing along x,
5120 points in a frustum box, each point observed by 4 consecutive
cameras = 20480 observations; 0.5 px observation noise; initial
estimates perturbed (rot ~1.5 deg, trans 0.05, points 2%); keyframes 0
and 1 fixed (gauge + scale).

Scale study shapes (round 4 — the 20-KF number is a LATENCY
measurement; these are the THROUGHPUT ones where the MXU should pull
away from the CPU anchor):
  ``local64``  — 64 KF / 16384 pts / 65536 obs (large local window)
  ``global96`` — 96 KF / 24576 pts / 98304 obs (global-BA scale)
"""

import argparse
import json
import struct
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SHAPES = {
    "local20": (20, 5120, 4),
    "local64": (64, 16384, 4),
    "global96": (96, 24576, 4),
    "global128": (128, 32768, 4),
}
FX = FY = 450.0
CX, CY = 320.0, 240.0
ITERS = 10


def make_problem(seed=0, shape="local20"):
    N_KF, N_PT, OBS_PER_PT = SHAPES[shape]
    rng = np.random.default_rng(seed)
    # ground-truth cameras: strafe along +x, slight look-at jitter
    kf_t_gt = np.stack([
        np.array([-0.3 * k, 0.0, 0.0]) for k in range(N_KF)
    ]).astype(np.float64)          # world-to-camera translation
    kf_R_gt = np.broadcast_to(np.eye(3), (N_KF, 3, 3)).copy()

    pts_gt = np.stack([
        rng.uniform(-4, 4 + 0.3 * N_KF, N_PT),
        rng.uniform(-3, 3, N_PT),
        rng.uniform(6, 14, N_PT),
    ], -1).astype(np.float64)

    # observations: each point seen by OBS_PER_PT consecutive cameras
    start = rng.integers(0, N_KF - OBS_PER_PT + 1, N_PT)
    obs_kf = (start[:, None] + np.arange(OBS_PER_PT)[None, :]).reshape(-1)
    obs_pt = np.repeat(np.arange(N_PT), OBS_PER_PT)
    pc = np.einsum("oij,oj->oi", kf_R_gt[obs_kf], pts_gt[obs_pt]) \
        + kf_t_gt[obs_kf]
    uv = pc[:, :2] / pc[:, 2:] * [FX, FY] + [CX, CY]
    uv += rng.normal(0, 0.5, uv.shape)

    # perturbed initial estimates
    def rot_noise(n, deg):
        w = rng.normal(0, np.radians(deg), (n, 3))
        th = np.linalg.norm(w, axis=-1, keepdims=True)
        k = w / np.maximum(th, 1e-12)
        K = np.zeros((n, 3, 3))
        K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
        K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
        K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
        s, c = np.sin(th)[..., None], np.cos(th)[..., None]
        return np.eye(3) + s * K + (1 - c) * (K @ K)

    kf_fixed = np.zeros(N_KF, bool)
    kf_fixed[:2] = True
    pert_R = rot_noise(N_KF, 1.5)
    pert_R[kf_fixed] = np.eye(3)
    kf_R0 = pert_R @ kf_R_gt
    kf_t0 = kf_t_gt + rng.normal(0, 0.05, (N_KF, 3))
    kf_t0[kf_fixed] = kf_t_gt[kf_fixed]
    pts0 = pts_gt * (1 + rng.normal(0, 0.02, (N_PT, 3)))

    return dict(
        kf_R0=kf_R0, kf_t0=kf_t0, kf_fixed=kf_fixed, pts0=pts0,
        obs_kf=obs_kf.astype(np.int32), obs_pt=obs_pt.astype(np.int32),
        obs_uv=uv.astype(np.float64),
    )


def dump(path, p):
    N_KF, N_PT = len(p["kf_fixed"]), len(p["pts0"])
    with open(path, "wb") as f:
        f.write(b"BABM")
        f.write(struct.pack("<iii", N_KF, N_PT, len(p["obs_kf"])))
        f.write(struct.pack("<dddd", FX, FY, CX, CY))
        f.write(np.ascontiguousarray(p["kf_R0"], np.float64).tobytes())
        f.write(np.ascontiguousarray(p["kf_t0"], np.float64).tobytes())
        f.write(p["kf_fixed"].astype(np.uint8).tobytes())
        f.write(np.ascontiguousarray(p["pts0"], np.float64).tobytes())
        f.write(p["obs_kf"].tobytes())
        f.write(p["obs_pt"].tobytes())
        f.write(np.ascontiguousarray(p["obs_uv"], np.float64).tobytes())


def run(p, platform=None, repeats_a=2, repeats_b=6, shape="local20",
        segment_mode="auto"):
    N_KF, N_PT = len(p["kf_fixed"]), len(p["pts0"])
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from orb_slam_tracking_tpu.optim.ba import bundle_adjust

    K = jnp.asarray(np.array(
        [[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32))
    args = dict(
        obs_kf=jnp.asarray(p["obs_kf"]),
        obs_pt=jnp.asarray(p["obs_pt"]),
        obs_uv=jnp.asarray(p["obs_uv"].astype(np.float32)),
        obs_inv_sigma2=jnp.ones(len(p["obs_kf"]), jnp.float32),
        obs_valid=jnp.ones(len(p["obs_kf"]), bool),
        kf_fixed=jnp.asarray(p["kf_fixed"]),
        pt_valid=jnp.ones(N_PT, bool),
        K=K, iterations=ITERS, max_free_cams=None,
        segment_mode=segment_mode,
    )
    R0 = jnp.asarray(p["kf_R0"].astype(np.float32))
    t0 = jnp.asarray(p["kf_t0"].astype(np.float32))
    X0 = jnp.asarray(p["pts0"].astype(np.float32))

    @jax.jit
    def solve_chained(carry):
        # chained: each solve starts from the previous solution shifted
        # back toward the perturbed init, so no solve can be elided
        R, t, X = carry
        res = bundle_adjust(0.5 * (R + R0), 0.5 * (t + t0),
                            0.5 * (X + X0), **args)
        return res.kf_R, res.kf_t, res.pts

    def fetch(c):
        return float(c[0][0, 0, 0] + c[1][0, 0] + c[2][0, 0])

    carry = (R0, t0, X0)
    carry = solve_chained(carry)
    _ = fetch(carry)
    carry = solve_chained(carry)
    _ = fetch(carry)

    carry = (R0, t0, X0)
    t0_ = time.time()
    for _ in range(repeats_a):
        carry = solve_chained(carry)
    _ = fetch(carry)
    ta = time.time() - t0_
    carry = (R0, t0, X0)
    t0_ = time.time()
    for _ in range(repeats_b):
        carry = solve_chained(carry)
    _ = fetch(carry)
    tb = time.time() - t0_
    per_solve = (tb - ta) / (repeats_b - repeats_a)
    if tb <= ta or per_solve <= 0:
        per_solve = tb / repeats_b

    # convergence check (honesty: the timed thing must actually solve)
    from orb_slam_tracking_tpu.optim.ba import bundle_adjust as ba
    res = ba(R0, t0, X0, **args)
    return {
        "metric": f"ba_{shape}_{N_KF}kf_{N_PT}pt_lm_iters_per_s",
        "value": round(ITERS / per_solve, 2),
        "unit": "LM iters/s",
        "ms_per_10iter_solve": round(per_solve * 1e3, 2),
        "cost0": float(res.cost0),
        "cost": float(res.cost),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", metavar="FILE")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    ap.add_argument("--shape", default="local20", choices=sorted(SHAPES))
    ap.add_argument("--segment-mode", default="auto",
                    choices=["auto", "scatter", "sorted", "unique", "factored", "cammajor"])
    a = ap.parse_args()
    p = make_problem(shape=a.shape)
    if a.dump:
        dump(a.dump, p)
        print(f"wrote {a.dump}", file=sys.stderr)
    if a.run:
        print(json.dumps(run(p, a.platform, shape=a.shape,
                             segment_mode=a.segment_mode)))


if __name__ == "__main__":
    main()
