#!/usr/bin/env python
"""Headline benchmark: full tracking-step throughput (frames/s/chip),
with ORB-extraction throughput as a secondary field.

Metrics (BASELINE.json):
- tracking step (config[2] shape): 1000-kp ORB extraction + projection
  matching of an 8192-point map + two-stage pose-only LM — ONE fused
  jitted program (slam/fused_step.py). CPU anchor: the reference's own
  ORBextractor + grid projection-matcher + ORB-SLAM's 4x10 Huber LM,
  single thread, same synthetic frame/map recipe
  (native/tracking_anchor.cpp): 20.36 frames/s on this host.
- extraction (config[1]): 8 levels, 2000 keypoints, 640x480. CPU anchor:
  the reference C++ ORBextractor at the same operating point: 115.975
  frames/s on this host.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N,
   "extraction_frames_per_s": N, "extraction_vs_cpu": N,
   "sequence_fps_with_keyframes": N, ...}

The sequence field is a best-effort third metric (leftover-budget-gated):
end-to-end throughput INCLUDING the keyframe lifecycle, measured by
scripts/tpu_seq_fps.py's children (device-side mapping loop as one
jitted scan, slam/device_mapping.py).

Wedge-resilient architecture (the round-2 official run died at TPU
backend init, BENCH_r02.json): the top-level process imports NO jax.
It orchestrates short-lived children:

  1. a CPU child precomputes the tracking map seed (so no TPU process
     ever needs more than the metric's own single jitted program),
  2. one TPU child measures tracking then extraction (2 jits total),
     writing each metric's JSON to disk the moment it is measured,
  3. on failure/timeout, a bounded quiet period then per-metric retry
     children (1 jit each),

all under a global deadline; SIGTERM/SIGINT print whatever metrics have
landed so far. The final line is emitted with whatever succeeded and the
exit code is 0 whenever the line parses — a partial number beats rc=1.

Measurement notes: the TPU relay's block_until_ready/fetch latencies are
unreliable, so each metric is measured with *chained* scan-fused steps
(every frame's input depends on the previous result and the probe
consumes EVERY output, so nothing can be dead-code-eliminated or
reordered), a drain chain before timing (the first post-warmup fetch
carries one-time cost), and a two-point (N1, N2) wall-time difference
that cancels constant dispatch/fetch overhead.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REF_TRACKING_CPU_FPS = 20.36   # native/tracking_anchor.cpp, this host
REF_EXTRACT_CPU_FPS = 115.975  # reference C++ ORBextractor, this host

_SCAN = 8  # frames fused per device call

# Camera for the tracking metric (must match native/tracking_anchor.cpp)
_CAM = dict(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)
_MAP_POINTS = 8192


def _bench_image():
    import numpy as np

    rng = np.random.default_rng(0)
    return rng.uniform(0, 255, (480, 640)).astype(np.float32), rng


# --------------------------------------------------------------------------
# children
# --------------------------------------------------------------------------

def _child_seed(out_path):
    """CPU-only child: extract keypoints from the bench image and expand
    them into the 8192-point synthetic map the tracking metric consumes.
    Runs entirely on the CPU backend so the TPU children stay at <=2
    remote compiles each."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from orb_slam_tracking_tpu.config import OrbConfig
    from orb_slam_tracking_tpu.ops.extractor import orb_extract

    base, rng = _bench_image()
    ocfg = OrbConfig(n_features=1000)
    kps = jax.jit(lambda im: orb_extract(im, ocfg))(jnp.asarray(base))
    kx = np.asarray(kps.xy)
    kd = np.asarray(kps.desc)
    sel = np.where(np.asarray(kps.valid))[0]
    P = _MAP_POINTS
    rep = np.concatenate([sel, rng.choice(sel, P - len(sel))])
    z = rng.uniform(4.0, 9.0, P).astype(np.float32)
    map_pts = np.stack([
        (kx[rep, 0] - _CAM["cx"]) / _CAM["fx"] * z,
        (kx[rep, 1] - _CAM["cy"]) / _CAM["fy"] * z,
        z,
    ], -1).astype(np.float32)
    md = kd[rep].copy()
    flips = rng.integers(0, 256, (P, 5))
    for i in range(len(sel), P):
        for b in flips[i]:
            md[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    np.savez(out_path, map_pts=map_pts, map_desc=md)
    return 0


def _synthetic_seed(out_path):
    """Numpy-only fallback seed (no jax): random in-frustum points and
    random descriptors. Identical workload shape — the match stage's cost
    is shape-determined (8192x1024 Hamming matmul) and the LM budget is
    fixed — so throughput is unaffected; only match content differs."""
    import numpy as np

    _, rng = _bench_image()
    P = _MAP_POINTS
    u = rng.uniform(40, _CAM["width"] - 40, P)
    v = rng.uniform(40, _CAM["height"] - 40, P)
    z = rng.uniform(4.0, 9.0, P).astype(np.float32)
    map_pts = np.stack([
        (u - _CAM["cx"]) / _CAM["fx"] * z,
        (v - _CAM["cy"]) / _CAM["fy"] * z,
        z,
    ], -1).astype(np.float32)
    md = rng.integers(0, 2**32, (P, 8), dtype=np.uint32)
    np.savez(out_path, map_pts=map_pts, map_desc=md)


def _probe_all(jnp, kps):
    return (
        jnp.sum(kps.response) + jnp.sum(kps.angle_deg) + jnp.sum(kps.xy)
        + jnp.sum(kps.desc.astype(jnp.float32))
        + jnp.sum(kps.valid.astype(jnp.float32)) + jnp.sum(kps.size)
        + jnp.sum(kps.octave.astype(jnp.float32))
    )


def _measure(fn, arg, fetch, n1=4, n2=12):
    # warm + drain
    y = fn(arg)
    _ = fetch(y)
    xx = arg
    for _ in range(3):
        xx = fn(xx)
    _ = fetch(xx)
    # two-point chained timing
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
    fps = 1.0 / max(per, 1e-9)
    # degenerate relay readings: fall back to the long-chain mean
    if t_b <= t_a or fps > 1e6:
        fps = (n2 * _SCAN) / max(t_b, 1e-9)
    return fps


def _child_tpu(outdir, metrics, seed_path):
    """TPU child: measure the requested metrics (order preserved) and
    write <outdir>/<metric>.json the moment each lands, so a later hang
    cannot erase an earlier success."""
    import jax

    if os.environ.get("ORB_BENCH_CPU") == "1":
        # debug/CI escape hatch; the real bench runs on the default (TPU)
        # backend
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from orb_slam_tracking_tpu.config import (
        CameraConfig,
        MatcherConfig,
        OrbConfig,
        TrackerConfig,
    )
    from orb_slam_tracking_tpu.ops.extractor import orb_extract
    from orb_slam_tracking_tpu.slam.fused_step import make_tracking_step

    base, _ = _bench_image()
    x = jnp.asarray(base)
    # ORB_BENCH_ATLAS=0 measures the per-level extraction path (A/B)
    use_atlas = os.environ.get("ORB_BENCH_ATLAS", "1") != "0"

    def emit(name, payload):
        path = os.path.join(outdir, name + ".json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        print(f"[bench-child] {name} = {payload}", file=sys.stderr,
              flush=True)

    for metric in metrics:
        if metric == "track":
            cam = CameraConfig(**_CAM)
            ocfg1 = OrbConfig(n_features=1000, use_atlas=use_atlas)
            step = make_tracking_step(
                cam, ocfg1, MatcherConfig(), TrackerConfig())
            seed = np.load(seed_path)
            map_pts = jnp.asarray(seed["map_pts"])
            map_desc = jnp.asarray(seed["map_desc"])
            P = map_pts.shape[0]
            map_valid = jnp.ones(P, bool)
            # no viewing statistics in the bench map: zero dmax disables
            # the per-point frustum gates (matching the CPU anchor)
            map_normal = jnp.zeros((P, 3), jnp.float32)
            map_dzero = jnp.zeros((P,), jnp.float32)
            K = jnp.asarray(np.array(
                [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                np.float32))

            @jax.jit
            def track_scan(carry):
                def body(c, _):
                    img, R, t = c
                    r = step(img, map_pts, map_desc, map_valid,
                             map_normal, map_dzero, map_dzero,
                             R, t, R, t, K)
                    probe = (
                        jnp.sum(r.R) + jnp.sum(r.t) + r.n_inliers
                        + r.n_matches1 + r.n_matches2 + r.n_kps
                        + jnp.sum(r.kp_for_point) + jnp.sum(r.inlier)
                        + jnp.sum(r.visible) + _probe_all(jnp, r.kps)
                        + jnp.sum(r.xy_un)
                    )
                    return (img + probe.astype(jnp.float32) * 1e-12,
                            r.R, r.t), None
                out, _ = jax.lax.scan(body, carry, None, length=_SCAN)
                return out

            fps = _measure(track_scan, (x, jnp.eye(3), jnp.zeros(3)),
                           lambda v: float(v[0][0, 0]))
            emit("track", {"frames_per_s": round(fps, 2)})
        elif metric == "extract":
            ecfg = OrbConfig(n_features=2000, max_keypoints=2048,
                             use_atlas=use_atlas)

            @jax.jit
            def extract_scan(xc):
                def body(c, _):
                    kps = orb_extract(c, ecfg)
                    return c + _probe_all(jnp, kps) * 1e-12, None
                out, _ = jax.lax.scan(body, xc, None, length=_SCAN)
                return out

            fps = _measure(extract_scan, x, lambda v: float(v[0, 0]))
            emit("extract", {"frames_per_s": round(fps, 2)})
        else:
            raise SystemExit(f"unknown metric {metric!r}")
    return 0


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

class _Orchestrator:
    def __init__(self):
        self.outdir = tempfile.mkdtemp(prefix="orb_bench_")
        # 2100 s default: the 650 s combined child wedges at backend
        # init ~50% of runs (r4/r5 observation), and 1500 s left no
        # leftover budget for the third (sequence) metric after the
        # per-metric retries that actually land results
        budget = float(os.environ.get("ORB_BENCH_BUDGET_S", "2100"))
        self.deadline = time.time() + budget
        self.errors = []
        self.emitted = False
        signal.signal(signal.SIGTERM, self._on_signal)
        signal.signal(signal.SIGINT, self._on_signal)

    # -- child management ---------------------------------------------------
    def _remaining(self, reserve=45.0):
        return self.deadline - time.time() - reserve

    def _run_child(self, args, want, label, script=None):
        """Run `python bench.py <args>` (or `python <script> <args>`)
        with a deadline-aware timeout; True iff the child exited 0
        within budget."""
        budget = min(want, self._remaining())
        if budget < 60:
            self.errors.append(f"{label}: skipped (deadline)")
            return False
        cmd = [sys.executable, script or os.path.abspath(__file__)] + args
        print(f"[bench] {label}: {' '.join(args)} (timeout {budget:.0f}s)",
              file=sys.stderr, flush=True)
        try:
            proc = subprocess.run(
                cmd, timeout=budget, stdout=sys.stderr, stderr=sys.stderr,
                start_new_session=True,
            )
            if proc.returncode != 0:
                self.errors.append(f"{label}: rc={proc.returncode}")
                return False
            return True
        except subprocess.TimeoutExpired:
            self.errors.append(f"{label}: timeout after {budget:.0f}s")
            return False
        except Exception as e:  # noqa: BLE001 - report and continue
            self.errors.append(f"{label}: {type(e).__name__}: {e}")
            return False

    def _read(self, name):
        path = os.path.join(self.outdir, name + ".json")
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                return json.load(f)
        except Exception:
            return None

    def _sleep_quiet(self, want):
        """Bounded quiet period before retrying a wedged relay."""
        t = max(0.0, min(want, self._remaining() - 90))
        if t > 0:
            print(f"[bench] quiet period {t:.0f}s before retry",
                  file=sys.stderr, flush=True)
            time.sleep(t)

    def _relay_up(self):
        """True iff something listens on the axon relay's first port.
        When the relay process is absent (observed: it is spawned
        outside the container and can disappear), every TPU client
        hangs at backend init forever — burning child timeouts is
        pointless; cheap socket polling is the right wait."""
        import socket

        if os.environ.get("ORB_BENCH_CPU") == "1":
            return True  # CPU debug mode needs no relay
        try:
            with socket.create_connection(("127.0.0.1", 8082), timeout=2):
                return True
        except OSError:
            return False

    def _wait_for_relay(self, reserve=700.0):
        """If the relay is down, poll until it appears or only
        `reserve` seconds of budget remain. Returns relay state."""
        if self._relay_up():
            return True
        print("[bench] relay port 8082 not listening — polling",
              file=sys.stderr, flush=True)
        self.errors.append("relay absent at start")
        while self.deadline - time.time() > reserve:
            time.sleep(20)
            if self._relay_up():
                self.errors.append("relay came back")
                return True
        return self._relay_up()

    def _warn_other_python(self):
        """The relay wedges when two clients race; warn if another python
        process is alive (we cannot kill it — patterns lie)."""
        me = os.getpid()
        others = []
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/comm") as f:
                    comm = f.read().strip()
                if comm.startswith("python"):
                    others.append(pid)
            except OSError:
                continue
        if others:
            print(f"[bench] WARNING: other python processes alive: "
                  f"{others} — relay contention possible",
                  file=sys.stderr, flush=True)

    # -- output --------------------------------------------------------------
    def _merge(self):
        track = self._read("track")
        extract = self._read("extract")
        out = None
        if track is not None:
            v = track["frames_per_s"]
            out = {
                "metric": "tracking_step_1000kp_8192pt_frames_per_s_per_chip",
                "value": v,
                "unit": "frames/s",
                "vs_baseline": round(v / REF_TRACKING_CPU_FPS, 3),
            }
            if extract is not None:
                e = extract["frames_per_s"]
                out["extraction_frames_per_s"] = e
                out["extraction_vs_cpu"] = round(e / REF_EXTRACT_CPU_FPS, 3)
            seq = self._read("seq")
            if seq is not None and seq.get("value"):
                out["sequence_fps_with_keyframes"] = seq["value"]
                out["sequence_keyframes_in_window"] = seq.get(
                    "keyframes_in_T2")
                out["sequence_lost_frames"] = seq.get("lost_in_T2")
                if seq.get("ate_cm_T2") is not None:
                    out["sequence_ate_cm"] = seq["ate_cm_T2"]
        elif extract is not None:
            e = extract["frames_per_s"]
            out = {
                "metric": "orb_extraction_2000kp_frames_per_s_per_chip",
                "value": e,
                "unit": "frames/s",
                "vs_baseline": round(e / REF_EXTRACT_CPU_FPS, 3),
            }
        else:
            out = {
                "metric": "tracking_step_1000kp_8192pt_frames_per_s_per_chip",
                "value": None,
                "unit": "frames/s",
                "vs_baseline": None,
            }
        if self.errors:
            out["errors"] = self.errors[:6]
        return out

    def _emit(self):
        if self.emitted:
            return
        self.emitted = True
        print(json.dumps(self._merge()), flush=True)

    def _on_signal(self, signum, frame):
        self.errors.append(f"signal {signum}")
        self._emit()
        os._exit(0)

    # -- main flow -----------------------------------------------------------
    def run(self):
        self._warn_other_python()
        if os.environ.get("ORB_BENCH_CPU") == "1":
            # debug mode: the seq child honors its own env knob
            os.environ["ORB_SEQ_CPU"] = "1"
        seed_path = os.path.join(self.outdir, "seed.npz")
        if not self._run_child(["--child", "seed", seed_path], 420,
                               "seed(cpu)"):
            _synthetic_seed(seed_path)
            print("[bench] using synthetic fallback seed",
                  file=sys.stderr, flush=True)

        # build the sequence-metric seed NOW (CPU-only, no relay): the
        # third metric's gate then only needs one TPU child of leftover
        # budget instead of seed+child (r4: the seq metric never landed
        # because the seed build alone outlasted what the retries left)
        seq_script = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "scripts", "tpu_seq_fps.py")
        seq_seed = os.path.join(self.outdir, "seq_seed.npz")
        # only spend the seed's CPU time when enough budget remains for
        # the primary TPU metrics PLUS a seq child afterwards — a small
        # ORB_BENCH_BUDGET_S override must not bleed primary-retry
        # budget into the tertiary metric
        seq_seed_ok = (os.path.exists(seq_script)
                       and self._remaining() > 1500
                       and self._run_child(["--child", "seed", seq_seed],
                                           420, "seq seed(cpu)",
                                           script=seq_script))

        # don't burn child timeouts against an absent relay — poll the
        # socket until it listens or the budget is nearly gone
        if not self._wait_for_relay():
            self.errors.append("relay never came up — no TPU attempt")
            self._emit()
            return 0

        # primary attempt: both metrics, one TPU process, 2 jits
        self._run_child(
            ["--child", "tpu", self.outdir, "--metrics", "track,extract",
             "--seed", seed_path], 650, "tpu(track+extract)")

        # retries, per-metric (1 jit each), after a quiet period
        if (self._read("track") is None and self._remaining() > 240
                and self._relay_up()):
            self._sleep_quiet(150)
            self._run_child(
                ["--child", "tpu", self.outdir, "--metrics", "track",
                 "--seed", seed_path], 520, "tpu(track retry)")
        if (self._read("extract") is None and self._remaining() > 240
                and self._relay_up()):
            self._sleep_quiet(90)
            self._run_child(
                ["--child", "tpu", self.outdir, "--metrics", "extract",
                 "--seed", seed_path], 450, "tpu(extract retry)")

        # best-effort THIRD metric: end-to-end sequence throughput WITH
        # keyframe work (the honest number — tracking + the whole
        # keyframe lifecycle as one jitted scan, scripts/tpu_seq_fps.py).
        # Strictly leftover-budget-gated: only attempted once the primary
        # metrics have landed, and a failure here cannot erase them.
        if (self._read("track") is not None
                and self._read("seq") is None
                and seq_seed_ok
                and self._remaining() > 560 and self._relay_up()):
            seq_out = os.path.join(self.outdir, "seq.json")
            self._sleep_quiet(120)
            self._run_child(["--child", "tpu", seq_seed, seq_out],
                            520, "tpu(seq fps)", script=seq_script)

        self._emit()
        return 0


def main(argv):
    if len(argv) >= 2 and argv[1] == "--child":
        kind = argv[2]
        if kind == "seed":
            return _child_seed(argv[3])
        if kind == "tpu":
            outdir = argv[3]
            metrics = []
            seed_path = None
            i = 4
            while i < len(argv):
                if argv[i] == "--metrics":
                    metrics = argv[i + 1].split(",")
                    i += 2
                elif argv[i] == "--seed":
                    seed_path = argv[i + 1]
                    i += 2
                else:
                    raise SystemExit(f"unknown arg {argv[i]!r}")
            return _child_tpu(outdir, metrics, seed_path)
        raise SystemExit(f"unknown child {kind!r}")
    return _Orchestrator().run()


if __name__ == "__main__":
    sys.exit(main(sys.argv))
