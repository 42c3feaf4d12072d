#!/usr/bin/env python
"""Multi-chip scaling-efficiency evidence (VERDICT r4 #6).

Two measurements on the virtual CPU mesh (honestly labeled as such — the
container exposes ONE physical TPU chip, so mesh scaling can only be
executed on `jax_num_cpu_devices` virtual devices sharing 4 host cores)
plus the ANALYTIC communication model that carries the ICI claim:

1. STRONG scaling, point-sharded Schur BA (`parallel/ba_sharded.py`):
   fixed problem (20 KF / 8192 pts / 40960 obs), point axis sharded over
   N ∈ {1,2,4,8} devices. Per-iteration collectives are camera-sized
   only (psum of U [K,6,6], g_c [K,6], S [nF,6,nF,6], rhs [nF,6], and
   2 scalars) — the per-shard observation work drops as 1/N while the
   psum payload is CONSTANT in N.

2. WEAK scaling, DP multi-sequence tracking
   (`parallel/multiseq.make_multiseq_sequence_runner`): one sequence
   per device, B = N. Ideal weak scaling = flat wall-clock as N grows
   (aggregate throughput ∝ N). There are NO collectives in this path —
   sequences are independent; the only cross-device cost is program
   launch.

The analytic model (printed at the end) converts the measured per-shard
compute and the exactly-countable psum payload into an ICI-efficiency
bound for a real v5e pod slice.

Run: python scripts/scaling_efficiency.py [--json OUT]
(The parent spawns one child per N so each gets a fresh backend with the
right device count.)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NKF = 20
NPTS = 8192
OBS_PER_PT = 5
SEED = 0

MS_B_FRAMES = 24         # multiseq frames per sequence
MS_HW = (240, 320)       # small frames: the trend, not the absolute, matters
MS_FEATURES = 256
MS_MAP = 512


def _ba_problem(rng):
    import numpy as np
    pts = np.stack([rng.uniform(-4, 4, NPTS), rng.uniform(-3, 3, NPTS),
                    rng.uniform(4, 12, NPTS)], -1).astype(np.float32)
    kf_R, kf_t = [], []
    for k in range(NKF):
        yaw = np.radians(2.0 * k)
        Rwc = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                        [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
        c = np.array([-0.25 * k, 0.02 * k, 0.04 * k], np.float32)
        R = Rwc.T
        kf_R.append(R)
        kf_t.append(-R @ c)
    kf_R = np.stack(kf_R)
    kf_t = np.stack(kf_t)
    obs_kf = np.concatenate(
        [rng.choice(NKF, OBS_PER_PT, replace=False) for _ in range(NPTS)]
    ).astype(np.int32)
    obs_pt = np.repeat(np.arange(NPTS), OBS_PER_PT).astype(np.int32)
    pc = np.einsum("oij,oj->oi", kf_R[obs_kf], pts[obs_pt]) + kf_t[obs_kf]
    uv = pc[:, :2] / pc[:, 2:] * [450.0, 450.0] + [320.0, 240.0]
    obs_uv = (uv + rng.normal(0, 0.5, uv.shape)).astype(np.float32)
    pts0 = (pts * (1 + rng.normal(0, 0.02, (NPTS, 1)))).astype(np.float32)
    return kf_R, kf_t, pts0, obs_kf, obs_pt, obs_uv


def child_ba(n_dev: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_dev)
    import jax.numpy as jnp
    import numpy as np
    from orb_slam_tracking_tpu.parallel.ba_sharded import (
        bucket_observations, bundle_adjust_sharded, make_ba_mesh)

    rng = np.random.default_rng(SEED)
    kf_R, kf_t, pts0, obs_kf, obs_pt, obs_uv = _ba_problem(rng)
    O = len(obs_kf)
    mesh = make_ba_mesh()
    per = O // n_dev + 256  # shard capacity with slack for imbalance
    b_kf, b_pt, b_uv, b_w, b_v = bucket_observations(
        obs_kf, obs_pt, obs_uv, np.ones(O, np.float32), np.ones(O, bool),
        NPTS, n_dev, per)
    fixed = np.zeros(NKF, bool)
    fixed[:2] = True
    K = np.array([[450.0, 0, 320], [0, 450, 240], [0, 0, 1]], np.float32)
    args = (jnp.asarray(kf_R), jnp.asarray(kf_t), jnp.asarray(pts0),
            jnp.asarray(b_kf), jnp.asarray(b_pt), jnp.asarray(b_uv),
            jnp.asarray(b_w), jnp.asarray(b_v),
            jnp.asarray(fixed), jnp.ones(NPTS, bool), jnp.asarray(K))

    R, t, X, cost = bundle_adjust_sharded(mesh, *args, iterations=10)
    jax.block_until_ready((R, t, X, cost))  # compile + first run
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = bundle_adjust_sharded(mesh, *args, iterations=10)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "bench": "ba_strong", "n": n_dev, "ms_per_solve": dt * 1e3,
        "iters_per_s": 10.0 / dt, "final_cost": float(cost),
    }), flush=True)


def child_multiseq(n_dev: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_dev)
    import jax.numpy as jnp
    import numpy as np
    from orb_slam_tracking_tpu.config import (
        CameraConfig, MatcherConfig, OrbConfig, TrackerConfig)
    from orb_slam_tracking_tpu.parallel.multiseq import (
        make_dp_mesh, make_multiseq_sequence_runner)

    h, w = MS_HW
    cam = CameraConfig(fx=300.0, fy=300.0, cx=w / 2, cy=h / 2,
                       width=w, height=h, fps=30.0)
    orb = OrbConfig(n_features=MS_FEATURES, n_levels=4)
    rng = np.random.default_rng(SEED)
    B, T = n_dev, MS_B_FRAMES
    imgs = rng.uniform(0, 255, (B, T, h, w)).astype(np.float32)
    P = MS_MAP
    pts = np.stack([rng.uniform(-3, 3, (B, P)), rng.uniform(-2, 2, (B, P)),
                    rng.uniform(3, 9, (B, P))], -1).astype(np.float32)
    desc = rng.integers(0, 2 ** 32, (B, P, 8), dtype=np.uint32)
    valid = np.ones((B, P), bool)
    R0 = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
    t0_ = np.zeros((B, 3), np.float32)
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                 np.float32)

    mesh = make_dp_mesh()
    run = make_multiseq_sequence_runner(
        mesh, cam, orb, MatcherConfig(), TrackerConfig())
    out = run(jnp.asarray(imgs), jnp.asarray(pts), jnp.asarray(desc),
              jnp.asarray(valid), jnp.asarray(R0), jnp.asarray(t0_),
              jnp.asarray(K))
    jax.block_until_ready(out)
    reps = 3
    tstart = time.perf_counter()
    for _ in range(reps):
        out = run(jnp.asarray(imgs), jnp.asarray(pts), jnp.asarray(desc),
                  jnp.asarray(valid), jnp.asarray(R0), jnp.asarray(t0_),
                  jnp.asarray(K))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - tstart) / reps
    print(json.dumps({
        "bench": "multiseq_weak", "n": n_dev, "ms_per_run": dt * 1e3,
        "aggregate_fps": B * T / dt,
    }), flush=True)


def analytic_model(nF=NKF, nK=NKF):
    """ICI efficiency bound for the point-sharded BA on a real v5e slice.

    psum payload per LM iteration (floats), exactly countable from
    parallel/ba_sharded.py:
      S    [nF,6,nF,6] -> 36 nF^2
      U    [nK,6,6]    -> 36 nK
      g_c  [nK,6]      ->  6 nK
      rhs  [nF,6]      ->  6 nF
      cost + predp scalars -> 2
    A psum moves ~2 (D-1)/D x payload over the slowest link
    (reduce-scatter + all-gather decomposition); v5e ICI ~45 GB/s per
    direction per link, ~1 us collective launch.
    """
    floats = 36 * nF * nF + 36 * nK + 6 * nK + 6 * nF + 2
    payload = floats * 4
    ici_bw = 45e9
    launch = 4e-6  # 4 psums x ~1 us
    rows = []
    for d in (2, 4, 8, 16):
        t_comm = 2 * (d - 1) / d * payload / ici_bw + launch
        rows.append((d, payload, t_comm * 1e6))
    return payload, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", choices=["ba", "multiseq"])
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-multiseq", action="store_true")
    args = ap.parse_args()

    if args.child == "ba":
        return child_ba(args.n)
    if args.child == "multiseq":
        return child_multiseq(args.n)

    results = []
    for bench in (["ba"] if args.skip_multiseq else ["ba", "multiseq"]):
        for n in (1, 2, 4, 8):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child", bench, "--n", str(n)]
            print(f"[scaling] {bench} n={n} ...", flush=True)
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=1800, cwd=REPO)
            line = [l for l in p.stdout.splitlines()
                    if l.startswith("{")]
            if p.returncode != 0 or not line:
                print(f"  FAILED rc={p.returncode}: {p.stderr[-500:]}",
                      flush=True)
                continue
            rec = json.loads(line[-1])
            results.append(rec)
            print(f"  {rec}", flush=True)

    ba = {r["n"]: r for r in results if r["bench"] == "ba_strong"}
    ms = {r["n"]: r for r in results if r["bench"] == "multiseq_weak"}
    print("\n== STRONG scaling: point-sharded Schur BA "
          f"({NKF} KF / {NPTS} pts / {NPTS * OBS_PER_PT} obs, "
          "10 LM iters) — virtual CPU mesh (4 host cores!) ==")
    if 1 in ba:
        base = ba[1]["ms_per_solve"]
        for n in sorted(ba):
            r = ba[n]
            sp = base / r["ms_per_solve"]
            print(f"  N={n}: {r['ms_per_solve']:8.1f} ms/solve  "
                  f"speedup {sp:4.2f}x  efficiency {sp / n * 100:5.1f}%  "
                  f"cost {r['final_cost']:.1f}")
    print("\n== WEAK scaling: DP multiseq tracking (B = N sequences, "
          f"{MS_B_FRAMES} frames each, {MS_HW[0]}x{MS_HW[1]}) — "
          "virtual CPU mesh ==")
    if 1 in ms:
        base = ms[1]["ms_per_run"]
        for n in sorted(ms):
            r = ms[n]
            eff = base / r["ms_per_run"]
            print(f"  N={n}: {r['ms_per_run']:8.1f} ms/run  "
                  f"(ideal: flat)  efficiency {eff * 100:5.1f}%  "
                  f"aggregate {r['aggregate_fps']:6.1f} fps")

    payload, rows = analytic_model()
    print(f"\n== Analytic ICI model (real v5e): psum payload/LM iter = "
          f"{payload} B ({payload / 1024:.1f} KB) ==")
    meas_iter_ms = 6.33  # measured single-chip: 63.3 ms / 10 iters (r3)
    for d, pl_, t_us in rows:
        eff = meas_iter_ms * 1e3 / (meas_iter_ms * 1e3 + t_us) * 100
        print(f"  D={d:2d}: comm {t_us:6.1f} us/iter vs compute "
              f"{meas_iter_ms * 1e3:.0f} us/iter -> efficiency bound "
              f"{eff:.2f}% (compute does NOT shrink: latency-bound chain)")
    print("  (the serialized LM chain is latency-bound at ~6 ms/iter on "
          "chip; the psum adds <0.1% — the >=90% 1->N target holds with "
          "two orders of magnitude of margin on ICI. The binding limit "
          "is the REPLICATED camera solve, constant in D.)")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"results": results,
                       "psum_payload_bytes": payload}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
