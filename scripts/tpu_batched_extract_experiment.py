"""Does batching frames beat single-stream extraction on one chip?

Round-1 finding: vmap over frames did NOT beat single-stream (the
extractor was compute-bound with per-level op overhead). The atlas
rebuild collapsed the 8 per-level programs into fused whole-canvas ops,
which shrinks per-op fixed cost — this re-checks whether a batch
dimension now amortizes anything (roadmap #4).

Chained-timing protocol per BASELINE.md (the relay's block_until_ready
lies): every output probed, two-point chained measurement.

RESULT (v5e, post-atlas): still compute-bound — batch=2 costs
2.54 ms/frame vs 1.59 ms single-stream; batching remains a dead lever.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import time

import numpy as np

_SCAN = 25


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("ORB_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from orb_slam_tracking_tpu.config import OrbConfig
    from orb_slam_tracking_tpu.ops.extractor import orb_extract

    rng = np.random.default_rng(0)
    ecfg = OrbConfig(n_features=2000, max_keypoints=2048)

    def probe_all(kps):
        return (
            jnp.sum(kps.response) + jnp.sum(kps.angle_deg) + jnp.sum(kps.xy)
            + jnp.sum(kps.desc.astype(jnp.float32))
            + jnp.sum(kps.valid.astype(jnp.float32)) + jnp.sum(kps.size)
            + jnp.sum(kps.octave.astype(jnp.float32))
        )

    def make_scan(batch):
        if batch == 1:
            def body(c, _):
                kps = orb_extract(c, ecfg)
                return c + probe_all(kps) * 1e-12, None
        else:
            ex = jax.vmap(lambda im: orb_extract(im, ecfg))

            def body(c, _):
                kps = ex(c)
                return c + probe_all(kps) * 1e-12, None

        @jax.jit
        def scan(x):
            out, _ = jax.lax.scan(body, x, None, length=_SCAN)
            return out
        return scan

    def measure(fn, arg, fetch, n1=2, n2=6):
        y = fn(arg)
        _ = fetch(y)
        xx = arg
        for _ in range(2):
            xx = fn(xx)
        _ = fetch(xx)
        xx = arg
        t0 = time.time()
        for _ in range(n1):
            xx = fn(xx)
        _ = fetch(xx)
        t_a = time.time() - t0
        xx = arg
        t0 = time.time()
        for _ in range(n2):
            xx = fn(xx)
        _ = fetch(xx)
        t_b = time.time() - t0
        per = (t_b - t_a) / ((n2 - n1) * _SCAN)
        if t_b <= t_a:
            per = t_b / (n2 * _SCAN)
        return per

    base = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    results = {}
    for batch in (1, 2, 4):
        if batch == 1:
            arg = jnp.asarray(base)
        else:
            arg = jnp.asarray(
                np.stack([np.roll(base, 3 * i, axis=1) for i in range(batch)]))
        scan = make_scan(batch)
        per_step = measure(scan, arg, lambda v: float(np.ravel(v)[0]))
        per_frame = per_step / batch
        results[f"batch{batch}_ms_per_frame"] = round(per_frame * 1e3, 3)
        results[f"batch{batch}_fps"] = round(1.0 / per_frame, 1)
        print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
