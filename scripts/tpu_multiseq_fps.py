#!/usr/bin/env python
"""Multi-sequence DP aggregate throughput on chip (VERDICT r3 item 1).

The per-sequence tracking step is latency-bound (BASELINE.md roofline:
the 2x6 pose-LM chain leaves the chip >90% idle), so batching B
sequences per chip via ``parallel.multiseq`` should multiply AGGREGATE
frames/s near-linearly until compute binds. This measures it: the
steady-state whole-sequence runner (``make_multiseq_sequence_runner`` —
a [B, T] scan of the fused two-stage step, vmapped over sequences) at
B in {1, 2, 4, 8} on the single real chip (mesh size 1; the dp axis is
trivially 1 and B rides the vmap batch axis — the same program shards
over real meshes unchanged, tests/test_parallel.py).

Relay protocol (see BASELINE.md + memory): one TPU child process per B
(2 compiles each: scan lengths T1, T2), strictly sequential; fps from
the two-point difference B*(T2-T1)/(t2-t1), which cancels dispatch,
transfer and compile-cache constants; the probe consumes every output.

Usage:
  python scripts/tpu_multiseq_fps.py             # orchestrate all B
  python scripts/tpu_multiseq_fps.py --child seed OUT.npz
  python scripts/tpu_multiseq_fps.py --child tpu SEED.npz B OUT.json
Env: ORB_SEQ_CPU=1 measures on the CPU backend (debug).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T1 = int(os.environ.get("ORB_MS_T1", "48"))
T2 = int(os.environ.get("ORB_MS_T2", "192"))
N_FRAMES = 260  # bootstrap consumes ~10; the rest must cover T2
BATCHES = tuple(
    int(b) for b in os.environ.get("ORB_MS_BATCHES", "1,2,4,8").split(","))


def _cfg():
    from orb_slam_tracking_tpu.config import (
        CameraConfig,
        OrbConfig,
        SystemConfig,
        TrackerConfig,
    )

    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    return SystemConfig(
        camera=cam,
        orb=OrbConfig(n_features=1000),
        tracker=TrackerConfig(
            max_map_points=8192, max_keyframes=24, ba_window=8,
            use_loop_closing=False, use_bow=False,
        ),
    )


def child_seed(out):
    """CPU bootstrap: host Tracker initializes the map on a rendered
    sequence; the map + remaining frames are the DP steady-state input
    (same world/operating point as scripts/tpu_seq_fps.py)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from orb_slam_tracking_tpu.slam import Tracker, TrackState
    from orb_slam_tracking_tpu.utils.synthetic import (
        CornerField,
        make_trajectory,
        render_frame,
    )

    cfg = _cfg()
    rng = np.random.default_rng(0)
    field = CornerField(rng, n=1200, x=(-6.0, 6.0))
    poses = make_trajectory(N_FRAMES, "strafe")
    frames = [render_frame(field, cfg.camera, R, t) for R, t in poses]
    tr = Tracker(cfg)
    i = 0
    while i < N_FRAMES and tr.state != TrackState.WORKING:
        tr.track(frames[i], i / 30.0)
        i += 1
    assert tr.state == TrackState.WORKING, "bootstrap failed"
    m = tr.map
    arrays = {f"map_{k}": np.asarray(v) for k, v in m._asdict().items()}
    np.savez_compressed(
        out, boot_end=i, R=tr.R, t=tr.t, K=np.asarray(tr.K),
        frames=np.stack(frames[i:]).astype(np.float32), **arrays)
    print(f"[multiseq-seed] bootstrapped at frame {i}", file=sys.stderr)


def child_tpu(seed_path, B, out_path):
    import jax

    if os.environ.get("ORB_SEQ_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orb_slam_tracking_tpu.parallel.multiseq import (
        make_dp_mesh,
        make_multiseq_sequence_runner,
    )

    z = np.load(seed_path)
    cfg = _cfg()
    mesh = make_dp_mesh(jax.devices()[:1])
    run = make_multiseq_sequence_runner(
        mesh, cfg.camera, cfg.orb, cfg.matcher, cfg.tracker)

    frames = z["frames"]
    assert len(frames) >= T2

    def tile(x):
        return jnp.asarray(np.broadcast_to(
            np.asarray(x)[None], (B,) + np.asarray(x).shape).copy())

    mp = tile(z["map_pts"])
    md = tile(z["map_desc"])
    mv = tile(z["map_pt_valid"])
    R0 = tile(z["R"])
    t0 = tile(z["t"])
    K = jnp.asarray(z["K"])

    def probe(out):
        return float(jnp.sum(out["R"]) + jnp.sum(out["t"])
                     + jnp.sum(out["n_inliers"]) + jnp.sum(out["n_matches"]))

    def measure(T):
        imgs = tile(frames[:T])
        out = run(imgs, mp, md, mv, R0, t0, K)   # compile + warm
        _ = probe(out)
        t0_ = time.time()
        out = run(imgs, mp, md, mv, R0, t0, K)
        _ = probe(out)
        el1 = time.time() - t0_
        t0_ = time.time()
        out = run(imgs, mp, md, mv, R0, t0, K)
        p = probe(out)
        el = min(el1, time.time() - t0_)
        n_inl = int(jnp.sum(out["n_inliers"][:, -1])) / B
        return el, n_inl, p

    e1, _, _ = measure(T1)
    e2, inl, _ = measure(T2)
    per = (e2 - e1) / (T2 - T1)
    if e2 <= e1 or per <= 0:
        per = e2 / T2
    res = {
        "metric": "multiseq_aggregate_fps_per_chip",
        "B": B,
        "value": round(B / per, 2),
        "unit": "frames/s",
        "per_seq_fps": round(1.0 / per, 2),
        "ms_per_frame_per_seq": round(per * 1e3, 3),
        "mean_final_inliers": inl,
        "T": [T1, T2],
        "wall_s": [round(e1, 3), round(e2, 3)],
    }
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f)
    os.replace(tmp, out_path)
    print(json.dumps(res))


def main():
    argv = sys.argv[1:]
    if argv[:1] == ["--child"]:
        if argv[1] == "seed":
            return child_seed(argv[2])
        if argv[1] == "tpu":
            return child_tpu(argv[2], int(argv[3]), argv[4])
        raise SystemExit(f"unknown child {argv[1]}")
    seed = "/tmp/multiseq_fps_seed.npz"
    me = os.path.abspath(__file__)
    # a stale seed from another session may have different N_FRAMES/T
    need_seed = True
    if os.path.exists(seed):
        try:
            need_seed = len(np.load(seed)["frames"]) < T2
        except Exception:
            need_seed = True
    if need_seed:
        subprocess.run([sys.executable, me, "--child", "seed", seed],
                       timeout=1800, check=True)
    results = []
    for B in BATCHES:
        out = f"/tmp/multiseq_fps_B{B}.json"
        if os.path.exists(out):
            os.remove(out)  # never report a stale run
        subprocess.run([sys.executable, me, "--child", "tpu", seed,
                        str(B), out], timeout=1500, check=False)
        if os.path.exists(out):
            results.append(json.load(open(out)))
            print(open(out).read())
    if results:
        base = results[0]["value"]
        for r in results:
            r["scaling_vs_B1"] = round(r["value"] / base, 2)
        print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
