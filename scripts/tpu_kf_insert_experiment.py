#!/usr/bin/env python
"""Where do the ~65 ms of a device keyframe insert go? (round 4)

`tpu_seq_fps.py` puts the honest sequence number at 80 fps: a keyframe
frame costs ~65 ms on top of the 4.7 ms steady step, and the BA
early-stop gate recovered only ~8 ms of it. This experiment times the
`make_device_insert_keyframe` program ALONE, chained insert->insert on
the real bootstrap map, under config variants that remove one suspect
at a time:

  full     ba_iterations=10, gate 1e-4, covis_keyframes=3  (production)
  nogate   ba_iterations=10, gate off                       (gate win)
  noba     ba_iterations=0                                  (BA share)
  nb1      covis_keyframes=1                                (covis share)

One child process per variant (relay discipline: <=2 remote compiles
each — the same insert-scan program at two repeat counts; two-point
chained timing cancels dispatch+fetch).

Usage:
  python scripts/tpu_kf_insert_experiment.py            # orchestrate
  python scripts/tpu_kf_insert_experiment.py --child VARIANT OUT.json
Requires the seed map from tpu_seq_fps.py (/tmp/seq_fps_seed.npz).
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

SEED = "/tmp/seq_fps_seed.npz"
VARIANTS = ["full", "nogate", "noba", "nb1"]
N1, N2 = 4, 16


def _cfg(variant):
    from orb_slam_tracking_tpu.config import (
        CameraConfig,
        OrbConfig,
        SystemConfig,
        TrackerConfig,
    )

    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    tr = TrackerConfig(max_map_points=8192, max_keyframes=24, ba_window=8,
                       use_loop_closing=False, use_bow=False)
    if variant == "nogate":
        tr = dataclasses.replace(tr, ba_early_stop_rel=0.0)
    elif variant == "noba":
        tr = dataclasses.replace(tr, ba_iterations=0)
    elif variant == "nb1":
        tr = dataclasses.replace(tr, covis_keyframes=1)
    elif variant != "full":
        raise SystemExit(f"unknown variant {variant}")
    return SystemConfig(camera=cam, orb=OrbConfig(n_features=1000),
                        tracker=tr)


def child(variant, out_path):
    import jax

    if os.environ.get("ORB_SEQ_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orb_slam_tracking_tpu.slam.device_mapping import (
        make_device_insert_keyframe,
    )
    from orb_slam_tracking_tpu.slam.map import SlamMap

    z = np.load(SEED)
    m = SlamMap(**{k: jnp.asarray(z[f"map_{k}"]) for k in SlamMap._fields})
    cfg = _cfg(variant)
    insert = make_device_insert_keyframe(
        cfg.camera, cfg.orb, cfg.matcher, cfg.tracker,
        tri_cap=128, obs_cap=512)

    # Re-insert the newest existing snapshot as if it were a fresh frame:
    # zero extra compiles, realistic keypoint/association density.
    Kc = int(m.kf_capacity)
    P = int(m.point_capacity)
    fids = np.where(np.asarray(m.kf_valid), np.asarray(m.kf_frame_id), -1)
    s0 = int(np.argmax(fids))
    kp_pt = np.asarray(m.kf_kp_pt[s0])                       # [N]
    kp_for_point = np.full((P,), -1, np.int32)
    sel = kp_pt >= 0
    kp_for_point[kp_pt[sel]] = np.nonzero(sel)[0]
    inlier = kp_for_point >= 0

    K = jnp.asarray(z["K"])
    args = (m.kf_R[s0], m.kf_t[s0], K,
            jnp.int32(int(fids[s0]) + 1), jnp.int32(int(z["kf_count"])),
            m.kf_kp_desc[s0], m.kf_kp_octave[s0], m.kf_kp_angle[s0],
            m.kf_kp_valid[s0], m.kf_kp_xy[s0],
            jnp.asarray(kp_for_point), jnp.asarray(inlier))

    def make_chain(reps):
        @jax.jit
        def chain(m0):
            def body(mc, _):
                m2, _slot, n = insert(mc, *args)
                return m2, n
            mf, ns = jax.lax.scan(body, m0, None, length=reps)
            return mf, ns
        return chain

    def probe(mf, ns):
        return float(jnp.sum(mf.pts) + jnp.sum(mf.obs_valid)
                     + jnp.sum(ns) + jnp.sum(mf.kf_t))

    def measure(reps):
        chain = make_chain(reps)
        mf, ns = chain(m)                 # compile + warm
        _ = probe(mf, ns)
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            mf, ns = chain(m)
            _ = probe(mf, ns)
            best = min(best, time.time() - t0)
        return best

    e1 = measure(N1)
    e2 = measure(N2)
    per = (e2 - e1) / (N2 - N1)
    if e2 <= e1 or per <= 0:
        per = e2 / N2
    res = {"variant": variant, "ms_per_insert": round(per * 1e3, 3),
           "wall_s": [round(e1, 3), round(e2, 3)], "reps": [N1, N2]}
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f)
    os.replace(tmp, out_path)
    print(json.dumps(res))


def main():
    argv = sys.argv[1:]
    if argv[:1] == ["--child"]:
        return child(argv[1], argv[2])
    if not os.path.exists(SEED):
        raise SystemExit(f"run scripts/tpu_seq_fps.py first to write {SEED}")
    me = os.path.abspath(__file__)
    for v in (argv or VARIANTS):
        out = f"/tmp/kf_insert_{v}.json"
        subprocess.run([sys.executable, me, "--child", v, out],
                       timeout=1200, check=False)
        if os.path.exists(out):
            print(open(out).read())


if __name__ == "__main__":
    main()
