#!/usr/bin/env python
"""Per-stage roofline measurements on the real chip (v5e).

Each hot stage runs in its OWN subprocess with 1-2 remote compiles (the
relay wedges on >=3-jit processes — see BASELINE.md methodology) and
chained two-point timing. Alongside the measured time, each stage
carries an ANALYTIC work model (FLOPs and HBM bytes from the static
shapes), so the output table reports achieved fraction of the v5e
compute/bandwidth rooflines — the "profiled to speed-of-light" evidence
BASELINE.json's north star asks for.

v5e peaks used: 197 TFLOP/s bf16 matmul, ~49 TFLOP/s f32 vector,
819 GB/s HBM.

Usage:
  python scripts/tpu_roofline.py --all [--outdir DIR]   # orchestrate
  python scripts/tpu_roofline.py --stage fast OUT.json  # one child
Stages: fast, moments, blur, brief, hamming, ba.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

SCAN = 8
PEAK_BF16 = 197e12          # v5e MXU bf16
PEAK_F32 = 3.9e12           # v5e VPU f32 (8x128 lanes x 4 ALUs x ~0.94 GHz)
PEAK_HBM = 819e9            # v5e HBM bandwidth


def timed(fn, arg, fetch, n1=4, n2=12):
    y = fn(arg)
    _ = fetch(y)
    xx = arg
    for _ in range(3):
        xx = fn(xx)
    _ = fetch(xx)
    xx = arg
    t0 = time.time()
    for _ in range(n1):
        xx = fn(xx)
    _ = fetch(xx)
    ta = time.time() - t0
    xx = arg
    t0 = time.time()
    for _ in range(n2):
        xx = fn(xx)
    _ = fetch(xx)
    tb = time.time() - t0
    per = (tb - ta) / ((n2 - n1) * SCAN)
    if tb <= ta or per <= 0:
        per = tb / (n2 * SCAN)
    return per


def _stage(name):
    """Build (chained_fn, arg, fetch, flops, bytes, flavor) for a stage."""
    import jax
    import jax.numpy as jnp

    from orb_slam_tracking_tpu.config import OrbConfig

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    cfg = OrbConfig(n_features=2000, max_keypoints=2048)

    if name in ("fast", "moments", "blur"):
        from orb_slam_tracking_tpu.ops import atlas as A

        lay = A.atlas_layout(480, 640, cfg)
        canvas = jax.jit(lambda im: A.build_atlas(im, cfg))(base)
        px = canvas.size
        if name == "fast":
            from orb_slam_tracking_tpu.ops.fast import fast_score
            from orb_slam_tracking_tpu.ops.atlas import _PAD

            def stage(c):
                if jax.default_backend() == "tpu":
                    from orb_slam_tracking_tpu.ops.pallas_kernels import (
                        fast_score_pallas,
                    )

                    return fast_score_pallas(c, _PAD)
                return fast_score(c, _PAD)

            # 16 ring diffs x2 polarities + 2x(16 mins x 8 + max) ~ 190
            flops, flavor = px * 190, "f32"
            nbytes = 4 * (px + px)
        elif name == "moments":
            from orb_slam_tracking_tpu.ops.orientation import moment_maps

            def stage(c):
                m10, m01 = moment_maps(c)
                return m10 + m01

            # incremental disc decomposition ~95 shifted adds x 2 moments
            flops, flavor = px * 190, "f32"
            nbytes = 4 * (px + 2 * px)
        else:
            from orb_slam_tracking_tpu.ops.pyramid import gaussian_blur

            def stage(c):
                return gaussian_blur(c)

            flops, flavor = px * 14, "f32"   # 7+7 separable shifted adds
            nbytes = 4 * (px + px)

        @jax.jit
        def chained(c):
            def body(x, _):
                y = stage(x)
                return x + jnp.sum(y) * 1e-20, None
            out, _ = jax.lax.scan(body, c, None, length=SCAN)
            return out

        return chained, canvas, lambda v: float(v[0, 0]), flops, nbytes, flavor

    if name == "brief":
        from orb_slam_tracking_tpu.ops import atlas as A
        from orb_slam_tracking_tpu.ops.brief import descriptors_at
        from orb_slam_tracking_tpu.ops.pyramid import gaussian_blur

        canvas = jax.jit(
            lambda im: gaussian_blur(A.build_atlas(im, cfg)))(base)
        N = cfg.max_keypoints
        xy = jnp.asarray(
            np.stack([rng.uniform(40, 600, N), rng.uniform(40, 440, N)],
                     -1).astype(np.float32))
        ang = jnp.asarray(rng.uniform(0, 360, N).astype(np.float32))

        @jax.jit
        def chained(carry):
            c, x = carry
            def body(cx, _):
                c_, x_ = cx
                d = descriptors_at(c_, x_, ang)
                bump = (jnp.sum(d.astype(jnp.float32)) * 1e-20)
                return (c_ + bump, x_ + bump), None
            out, _ = jax.lax.scan(body, (c, x), None, length=SCAN)
            return out

        # per kp: 48x128 patch DMA (f32) + 2 one-hot contractions
        # (48->256 row-select [256,48]x[48,128] + col reduce) in bf16
        flops = N * (2 * 256 * 48 * 128) * 2
        nbytes = N * (48 * 128 * 4 + 256 * 4)
        return (chained, (canvas, xy), lambda v: float(v[1][0, 0]),
                flops, nbytes, "bf16")

    if name == "hamming":
        from orb_slam_tracking_tpu.ops.hamming import hamming_matrix

        Nq, Nm = 8192, 1024
        d1 = jnp.asarray(rng.integers(0, 2**32, (Nq, 8), dtype=np.uint32))
        d2 = jnp.asarray(rng.integers(0, 2**32, (Nm, 8), dtype=np.uint32))

        @jax.jit
        def chained(x):
            def body(c, _):
                D = hamming_matrix(
                    jnp.bitwise_xor(d1, c.astype(jnp.uint32)), d2)
                return (c + jnp.sum(D).astype(jnp.float32) * 1e-20) % 2, None
            out, _ = jax.lax.scan(
                body, x, None, length=SCAN)
            return out

        # ONE {0,1} bf16 matmul over the 256-bit planes (hamming =
        # pop(a) + pop(b) - 2 a.b, see hamming_matrix_bf16)
        flops = 2 * Nq * Nm * 256
        nbytes = (Nq * 256 + Nm * 256) * 2 + Nq * Nm * 4
        return chained, jnp.float32(0.0), float, flops, nbytes, "bf16"

    if name == "ba":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from ba_bench import make_problem, run

        res = run(make_problem())  # does its own chained measurement
        return res  # special-cased by the child

    raise SystemExit(f"unknown stage {name!r}")


def child(name, out_path):
    if os.environ.get("ORB_BENCH_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if name == "ba":
        res = _stage("ba")
        res["stage"] = "ba"
    else:
        fn, arg, fetch, flops, nbytes, flavor = _stage(name)
        per = timed(fn, arg, fetch)
        peak = PEAK_BF16 if flavor == "bf16" else PEAK_F32
        res = {
            "stage": name,
            "ms": round(per * 1e3, 4),
            "gflops": round(flops / 1e9, 2),
            "gbytes": round(nbytes / 1e9, 4),
            "achieved_tflops": round(flops / per / 1e12, 2),
            "achieved_gbs": round(nbytes / per / 1e9, 1),
            "pct_compute_roofline": round(100 * flops / per / peak, 1),
            "pct_hbm_roofline": round(100 * nbytes / per / PEAK_HBM, 1),
            "flavor": flavor,
        }
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f)
    os.replace(tmp, out_path)
    print(json.dumps(res), file=sys.stderr, flush=True)


STAGES = ["fast", "moments", "blur", "brief", "hamming", "ba"]


def orchestrate(outdir, stages):
    os.makedirs(outdir, exist_ok=True)
    for i, s in enumerate(stages):
        out = os.path.join(outdir, f"{s}.json")
        if os.path.exists(out):
            print(f"[roofline] {s}: cached", file=sys.stderr)
            continue
        if i:
            time.sleep(20)  # relay breathing room between processes
        cmd = [sys.executable, os.path.abspath(__file__), "--stage", s, out]
        print(f"[roofline] {s}...", file=sys.stderr, flush=True)
        try:
            subprocess.run(cmd, timeout=540, check=False)
        except subprocess.TimeoutExpired:
            print(f"[roofline] {s}: TIMEOUT", file=sys.stderr, flush=True)
    rows = []
    for s in stages:
        p = os.path.join(outdir, f"{s}.json")
        if os.path.exists(p):
            rows.append(json.load(open(p)))
    print(json.dumps(rows, indent=1))


def analytic():
    """Print the analytic work model per stage (no device needed): FLOPs,
    HBM bytes, and the v5e roofline-minimum time max(compute, bandwidth).
    Shapes come from the real atlas layout at the benchmark operating
    point, so the numbers are exact for the programs the bench runs."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from orb_slam_tracking_tpu.config import OrbConfig
    from orb_slam_tracking_tpu.ops import atlas as A

    cfg = OrbConfig(n_features=2000, max_keypoints=2048)
    lay = A.atlas_layout(480, 640, cfg)
    px = (lay.canvas_h + 2 * A._PAD) * (lay.canvas_w + 2 * A._PAD)
    N = cfg.max_keypoints
    rows = []

    def add(stage, flops, nbytes, flavor, note):
        peak = PEAK_BF16 if flavor == "bf16" else PEAK_F32
        t_c = flops / peak
        t_b = nbytes / PEAK_HBM
        rows.append({
            "stage": stage, "gflops": round(flops / 1e9, 3),
            "mbytes": round(nbytes / 1e6, 2),
            "roofline_min_us": round(max(t_c, t_b) * 1e6, 1),
            "bound": "compute" if t_c > t_b else "bandwidth",
            "flavor": flavor, "note": note,
        })

    add("fast", px * 190, 8 * px, "f32",
        "16 ring taps x2 polarities + 9-window arc reduction per px")
    add("moments", px * 190, 12 * px, "f32",
        "incremental disc sums, ~95 shifted adds x2 moments")
    add("blur", px * 14, 8 * px, "f32", "7x7 separable shifted adds")
    add("brief", N * 2 * 2 * 256 * 48 * 128, N * (48 * 128 * 4 + 256 * 4),
        "bf16", "per-kp 48x128 patch DMA + hi/lo one-hot contractions")
    add("hamming", 2 * 8192 * 1024 * 256,
        (8192 + 1024) * 256 * 2 + 8192 * 1024 * 4, "bf16",
        "one {0,1} bit-plane matmul at the tracking shape")
    print(json.dumps({"canvas_px": px, "v5e_peaks":
                      {"bf16_tflops": PEAK_BF16 / 1e12,
                       "f32_vpu_tflops": PEAK_F32 / 1e12,
                       "hbm_gbs": PEAK_HBM / 1e9},
                      "stages": rows}, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--analytic", action="store_true")
    ap.add_argument("--stage")
    ap.add_argument("out", nargs="?")
    ap.add_argument("--outdir", default="/tmp/roofline")
    ap.add_argument("--stages", default=",".join(STAGES))
    a = ap.parse_args()
    if a.analytic:
        analytic()
    elif a.stage:
        child(a.stage, a.out or os.path.join(a.outdir, a.stage + ".json"))
    elif a.all:
        orchestrate(a.outdir, a.stages.split(","))
    else:
        ap.error("--all or --stage required")


if __name__ == "__main__":
    main()
