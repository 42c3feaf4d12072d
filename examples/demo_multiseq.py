#!/usr/bin/env python
"""Multi-sequence data-parallel tracking demo.

Runs B independent synthetic sequences through the SPMD tracking step
(extraction -> projection matching -> pose-only LM) sharded over the
device mesh, then a distributed bundle adjustment of one shared map —
the scaling configuration of BASELINE.json config[4] exercised on
whatever devices are available (use JAX_NUM_CPU_DEVICES / the virtual CPU
mesh for a laptop run).

Usage: python examples/demo_multiseq.py [--cpu] [--batch B]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--devices", type=int, default=0,
                    help="virtual CPU devices (0 = use what exists)")
    ap.add_argument("--batch", type=int, default=0, help="sequences (default = n_devices)")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.devices:
            jax.config.update("jax_num_cpu_devices", args.devices)

    import jax.numpy as jnp
    import numpy as np

    from orb_slam_tracking_tpu.config import CameraConfig, MatcherConfig, OrbConfig
    from orb_slam_tracking_tpu.parallel.ba_sharded import (
        bucket_observations, bundle_adjust_sharded,
    )
    from orb_slam_tracking_tpu.parallel.multiseq import make_dp_mesh, make_multiseq_step
    from orb_slam_tracking_tpu.utils.synthetic import CornerField, render_frame

    n_dev = len(jax.devices())
    B = args.batch or n_dev
    if B % n_dev:
        print(f"error: batch {B} must be a multiple of {n_dev} devices", file=sys.stderr)
        return 2
    print(f"devices: {n_dev}, sequences: {B}")
    mesh = make_dp_mesh()

    rng = np.random.default_rng(0)
    cam = CameraConfig(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240)
    ocfg = OrbConfig(n_features=256, n_levels=4, select_cell_size=10)
    step = make_multiseq_step(mesh, ocfg, MatcherConfig(), cam.width, cam.height)

    # per-sequence worlds + maps (ground truth map, tracking-only demo)
    fields = [CornerField(rng, n=250, x=(-2, 2), y=(-1.5, 1.5), z=(2, 6)) for _ in range(B)]
    Pcap = 256
    K = jnp.asarray(np.array(
        [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], np.float32))
    map_pts = np.zeros((B, Pcap, 3), np.float32)
    map_desc = rng.integers(0, 2 ** 32, (B, Pcap, 8), dtype=np.uint32)
    map_valid = np.zeros((B, Pcap), bool)
    R = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t = np.zeros((B, 3), np.float32)

    # seed maps with each field's points and descriptors extracted from a
    # first rendered frame (projection-matched by position)
    from orb_slam_tracking_tpu.ops import orb_extract
    for b, field in enumerate(fields):
        img = render_frame(field, cam, R[b], t[b])
        kps = orb_extract(jnp.asarray(img), ocfg)
        xy = np.asarray(kps.xy)
        valid = np.asarray(kps.valid)
        pc = field.pts
        uv = (pc[:, :2] / pc[:, 2:]) * [cam.fx, cam.fy] + [cam.cx, cam.cy]
        n = 0
        for i, p in enumerate(field.pts):
            if n >= Pcap:
                break
            d = np.linalg.norm(xy - uv[i], axis=1)
            j = int(np.argmin(np.where(valid, d, 1e9)))
            if d[j] < 3.0:
                map_pts[b, n] = p
                map_desc[b, n] = np.asarray(kps.desc)[j]
                map_valid[b, n] = True
                n += 1
        print(f"  seq {b}: map seeded with {n} points")

    t0 = time.time()
    for s in range(args.steps):
        imgs = np.stack([
            render_frame(fields[b], cam, R[b], t[b] + np.array([0.01 * (s + 1), 0, 0], np.float32))
            for b in range(B)
        ])
        out = step(
            jnp.asarray(imgs), jnp.asarray(map_pts), jnp.asarray(map_desc),
            jnp.asarray(map_valid), jnp.asarray(R), jnp.asarray(t), K,
        )
        R = np.asarray(out.R)
        t = np.asarray(out.t)
        print(f"step {s}: inliers per sequence = {np.asarray(out.n_inliers).tolist()}")
    print(f"{args.steps} steps x {B} sequences in {time.time()-t0:.1f}s")

    # distributed BA smoke over sequence 0's map
    nK = 4
    nP = Pcap
    obs_kf = np.repeat(np.arange(nK), nP).astype(np.int32)
    obs_pt = np.tile(np.arange(nP), nK).astype(np.int32)
    pts0 = map_pts[0]
    kf_R = np.tile(np.eye(3, dtype=np.float32), (nK, 1, 1))
    kf_t = np.stack([np.array([-0.05 * k, 0, 0], np.float32) for k in range(nK)])
    pc = np.einsum("kij,pj->kpi", kf_R, pts0) + kf_t[:, None, :]
    z = np.where(np.abs(pc[..., 2]) < 0.5, 0.5, pc[..., 2])
    uv = (pc[..., :2] / z[..., None]) * [cam.fx, cam.fy] + [cam.cx, cam.cy]
    obs_uv = uv.reshape(-1, 2).astype(np.float32)
    obs_valid = np.tile(map_valid[0], nK)
    O = nK * nP
    per = O // n_dev + 32
    bk, bp, buv, bw, bv = bucket_observations(
        obs_kf, obs_pt, obs_uv, np.ones(O, np.float32), obs_valid, nP, n_dev, per)
    fixed = np.zeros(nK, bool)
    fixed[0] = True
    _, _, _, cost = bundle_adjust_sharded(
        mesh, jnp.asarray(kf_R), jnp.asarray(kf_t), jnp.asarray(pts0),
        jnp.asarray(bk), jnp.asarray(bp), jnp.asarray(buv), jnp.asarray(bw),
        jnp.asarray(bv), jnp.asarray(fixed), jnp.asarray(map_valid[0]), K,
        iterations=5,
    )
    print(f"distributed BA over {n_dev} shards: final cost {float(cost):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
