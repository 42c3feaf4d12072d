#!/usr/bin/env python
"""Validate + time the per-keypoint moments kernel on REAL hardware.

Two jits (relay protocol: keep jit count minimal):
  jit A — extraction scan with the DENSE canvas moments (the r3 path)
  jit B — extraction scan with ORB_TPU_KP_MOMENTS=1 (moments_at_pallas)

Correctness: descriptors/angles/xy of the two paths on the bench image
(angles within f32 sum-order tolerance; descriptor bits may flip only
where an angle lands exactly on a cvRound boundary — count them).
Performance: chained two-point timing of both scans, same protocol as
bench.py.

Usage: python scripts/tpu_moments_validate.py OUT.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_SCAN = int(os.environ.get("ORB_MOMENTS_SCAN", "8"))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/moments_val.json"
    import jax
    import jax.numpy as jnp

    if os.environ.get("ORB_MOMENTS_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from orb_slam_tracking_tpu.config import OrbConfig
    from orb_slam_tracking_tpu.ops.extractor import orb_extract

    # the bench.py image (same distribution, fixed seed)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    x = jnp.asarray(img)

    ecfg = OrbConfig(n_features=2000, max_keypoints=2048)

    def build(flag):
        os.environ["ORB_TPU_KP_MOMENTS"] = flag

        @jax.jit
        def scan_fn(xc):
            def body(c, _):
                kps = orb_extract(c, ecfg)
                probe = (jnp.sum(kps.response) + jnp.sum(kps.angle_deg)
                         + jnp.sum(kps.xy)
                         + jnp.sum(kps.desc.astype(jnp.float32))
                         + jnp.sum(kps.valid.astype(jnp.float32)))
                return c + probe * 1e-12, None
            out, _ = jax.lax.scan(body, xc, None, length=_SCAN)
            return out

        @jax.jit
        def once(xc):
            return orb_extract(xc, ecfg)

        return scan_fn, once

    def measure(fn, arg,
                n1=int(os.environ.get("ORB_MOMENTS_N1", "4")),
                n2=int(os.environ.get("ORB_MOMENTS_N2", "12"))):
        y = fn(arg)
        _ = float(y[0, 0])
        xx = arg
        for _ in range(3):
            xx = fn(xx)
        _ = float(xx[0, 0])
        xx = arg
        t0 = time.time()
        for _ in range(n1):
            xx = fn(xx)
        _ = float(xx[0, 0])
        ta = time.time() - t0
        xx = arg
        t0 = time.time()
        for _ in range(n2):
            xx = fn(xx)
        _ = float(xx[0, 0])
        tb = time.time() - t0
        per = (tb - ta) / ((n2 - n1) * _SCAN)
        fps = 1.0 / max(per, 1e-9)
        if tb <= ta or fps > 1e6:
            fps = (n2 * _SCAN) / max(tb, 1e-9)
        return fps

    # NOTE: env is read at TRACE time inside orb_extract_atlas, so each
    # build() must fully trace before the flag flips: calling scan_fn
    # once inside measure() does that. Build+measure strictly in order.
    results = {}
    scan0, once0 = build("0")
    kps0 = jax.tree.map(np.asarray, once0(x))
    results["fps_dense"] = round(measure(scan0, x), 2)
    scan1, once1 = build("1")
    kps1 = jax.tree.map(np.asarray, once1(x))
    results["fps_kp_moments"] = round(measure(scan1, x), 2)

    v = kps0.valid & kps1.valid
    same_xy = bool(np.array_equal(kps0.xy[v], kps1.xy[v]))
    dang = np.abs(kps0.angle_deg[v] - kps1.angle_deg[v])
    dang = np.minimum(dang, 360.0 - dang)
    desc_diff_bits = np.unpackbits(
        (kps0.desc[v] ^ kps1.desc[v]).view(np.uint8), axis=-1).sum(-1)
    results.update({
        "n_valid": int(v.sum()),
        "same_xy": same_xy,
        "angle_max_deg": float(dang.max()) if v.any() else None,
        "desc_bits_changed_total": int(desc_diff_bits.sum()),
        "desc_kps_changed": int((desc_diff_bits > 0).sum()),
    })
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
