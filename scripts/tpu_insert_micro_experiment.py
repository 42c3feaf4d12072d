#!/usr/bin/env python
"""Micro-timing of the keyframe-insert sub-stages (round 4).

`tpu_kf_insert_experiment.py` split the 69 ms insert into BA (47 ms) and
a 22 ms remainder (~6.5 ms per covisibility neighbor). This experiment
times the remainder's candidate sub-stages in isolation on the real
bootstrap map, chained, to decide WHAT to restructure:

  fusemath  the [N, P] fuse check (project + window + Hamming + argmin)
  scatter   _scatter_obs_rows + _scatter_new_rows (the .at[].set chains)
  compact   the _compact mask-compaction helper (cumsum + scatter)

Usage:
  python scripts/tpu_insert_micro_experiment.py            # all variants
  python scripts/tpu_insert_micro_experiment.py --child V OUT.json
Requires /tmp/seq_fps_seed.npz (scripts/tpu_seq_fps.py).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

SEED = "/tmp/seq_fps_seed.npz"
VARIANTS = ["fusemath", "scatter", "compact"]
N1, N2 = 4, 16


def child(variant, out_path):
    import jax

    if os.environ.get("ORB_SEQ_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orb_slam_tracking_tpu.ops.hamming import hamming_matrix
    from orb_slam_tracking_tpu.slam.device_mapping import (
        _compact,
        _scatter_new_rows,
        _scatter_obs_rows,
    )
    from orb_slam_tracking_tpu.slam.map import SlamMap

    z = np.load(SEED)
    m = SlamMap(**{k: jnp.asarray(z[f"map_{k}"]) for k in SlamMap._fields})
    K = jnp.asarray(z["K"])
    P = int(m.point_capacity)
    N = int(m.kp_capacity)
    Kc = int(m.kf_capacity)
    fids = np.where(np.asarray(m.kf_valid), np.asarray(m.kf_frame_id), -1)
    slot = int(np.argmax(fids))
    nb = int(np.argsort(fids)[-2])
    rng = np.random.default_rng(0)
    i2s = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    tri_cap = 128

    if variant == "fusemath":
        R_cur, t_cur = m.kf_R[slot], m.kf_t[slot]

        from functools import partial

        @partial(jax.jit, static_argnames=("reps",))
        def chain(eps, reps):
            def body(e, _):
                pc = (m.pts + e) @ R_cur.T + t_cur
                zc = pc[:, 2]
                zi = jnp.where(jnp.abs(zc) < 1e-9, 1e-9, zc)
                proj = jnp.stack([K[0, 0] * pc[:, 0] / zi + K[0, 2],
                                  K[1, 1] * pc[:, 1] / zi + K[1, 2]], -1)
                proj_ok = m.pt_valid & (zc > 0.05)
                x2 = m.kf_kp_xy[slot][i2s]
                d2 = jnp.sum((x2[:, None, :] - proj[None, :, :]) ** 2, -1)
                hd = hamming_matrix(m.kf_kp_desc[slot][i2s], m.desc)
                good = (d2 <= 25.0) & proj_ok[None, :]
                Dm = jnp.where(good, hd, 999)
                tgt = jnp.argmin(Dm, axis=1)
                hit = jnp.min(Dm, axis=1) <= 50
                return e + 1e-9 * (jnp.sum(tgt) + jnp.sum(hit)), None
            e, _ = jax.lax.scan(body, eps, None, length=reps)
            return e
    elif variant == "scatter":
        rows = jnp.asarray(rng.integers(0, 12000, tri_cap).astype(np.int32))
        tgt = jnp.asarray(rng.integers(0, P, tri_cap).astype(np.int32))
        kp = jnp.asarray(rng.integers(0, N, tri_cap).astype(np.int32))
        uv = jnp.asarray(rng.uniform(0, 640, (tri_cap, 2)).astype(np.float32))
        inv = jnp.ones((tri_cap,), jnp.float32)
        ok = jnp.ones((tri_cap,), bool)
        pts_n = jnp.asarray(
            rng.uniform(-3, 3, (tri_cap, 3)).astype(np.float32))

        from functools import partial

        @partial(jax.jit, static_argnames=("reps",))
        def chain(m0, reps):
            def body(mc, _):
                mc = _scatter_obs_rows(mc, slot, rows, tgt, kp, uv, inv,
                                       ok, 1)
                mc = _scatter_new_rows(
                    mc, slot, nb, tgt, rows, rows, kp, kp, pts_n, uv, uv,
                    inv, inv, jnp.full((tri_cap,), 3, jnp.int32), ok)
                return mc, None
            mf, _ = jax.lax.scan(body, m0, None, length=reps)
            return jnp.sum(mf.pts) + jnp.sum(mf.obs_valid) + jnp.sum(
                mf.n_obs)
    elif variant == "compact":
        mask0 = jnp.asarray(rng.random(P) < 0.3)

        from functools import partial

        @partial(jax.jit, static_argnames=("reps",))
        def chain(x, reps):
            def body(c, _):
                lanes, ok = _compact(c ^ (jnp.arange(P) % 7 == 0), tri_cap)
                lanes2, ok2 = _compact(~c, 2 * tri_cap)
                flip = jnp.zeros(P, bool).at[
                    jnp.where(ok, lanes, P)].set(True, mode="drop")
                flip = flip.at[jnp.where(ok2, lanes2, P)].set(
                    True, mode="drop")
                return c ^ flip, None
            c, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(c)
    else:
        raise SystemExit(f"unknown variant {variant}")

    if variant == "fusemath":
        first = jnp.float32(0.0)
    elif variant == "scatter":
        first = m
    else:
        first = mask0

    def measure(reps):
        import functools
        fn = functools.partial(chain, reps=reps)
        r = fn(first)
        _ = float(jnp.sum(r)) if hasattr(r, "shape") else float(r)
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            r = fn(first)
            _ = float(jnp.sum(r)) if hasattr(r, "shape") else float(r)
            best = min(best, time.time() - t0)
        return best

    e1 = measure(N1)
    e2 = measure(N2)
    per = (e2 - e1) / (N2 - N1)
    if e2 <= e1 or per <= 0:
        per = e2 / N2
    res = {"variant": variant, "ms_per_rep": round(per * 1e3, 3),
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
    me = os.path.abspath(__file__)
    for v in (argv or VARIANTS):
        out = f"/tmp/insert_micro_{v}.json"
        subprocess.run([sys.executable, me, "--child", v, out],
                       timeout=1200, check=False)
        if os.path.exists(out):
            print(open(out).read())


if __name__ == "__main__":
    main()
