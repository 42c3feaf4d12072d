"""Stage-level extraction breakdown on the atlas path (chained timing).

Each stage is timed as its own scan-fused chained program: the stage's
scalar probe feeds back into its input so no iteration can be elided or
overlapped, and a two-point (4, 12) difference cancels constant
dispatch/fetch cost. 6 jits total.
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.config import OrbConfig
from orb_slam_tracking_tpu.ops import atlas as A
from orb_slam_tracking_tpu.ops.brief import descriptors_at
from orb_slam_tracking_tpu.ops.orientation import angles_at, moment_maps
from orb_slam_tracking_tpu.ops.pyramid import gaussian_blur
from orb_slam_tracking_tpu.ops.select import select_level

cfg = OrbConfig(n_features=2000, max_keypoints=2048, use_atlas=True)
rng = np.random.default_rng(0)
base = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
SCAN = 8

lay = A.atlas_layout(480, 640, cfg)
print(f"canvas {lay.canvas_h}x{lay.canvas_w} = "
      f"{lay.canvas_h * lay.canvas_w / 1e6:.2f} Mpx", flush=True)

canvas = jax.jit(lambda im: A.build_atlas(im, cfg))(base)
budgets = cfg.features_per_level()


def timed(name, fn, arg, fetch):
    y = fn(arg)
    _ = fetch(y)
    xx = arg
    for _i in range(3):
        xx = fn(xx)
    _ = fetch(xx)
    xx = arg
    t0 = time.time()
    for _i in range(4):
        xx = fn(xx)
    _ = fetch(xx)
    ta = time.time() - t0
    xx = arg
    t0 = time.time()
    for _i in range(12):
        xx = fn(xx)
    _ = fetch(xx)
    tb = time.time() - t0
    ms = (tb - ta) / (8 * SCAN) * 1e3
    print(f"{name}: {ms:.3f} ms  (t4={ta:.3f} t12={tb:.3f})", flush=True)


def scan_of(stage):
    @jax.jit
    def f(x):
        def body(c, _):
            return c + stage(c) * 1e-12, None
        out, _ = jax.lax.scan(body, x, None, length=SCAN)
        return out
    return f


# 1. atlas build (resize cascade + pads)
timed("build_atlas", scan_of(lambda im: jnp.sum(A.build_atlas(im, cfg))),
      base, lambda v: float(v[0, 0]))

# 2. FAST score over the canvas (Pallas on TPU)
if jax.default_backend() == "tpu":
    from orb_slam_tracking_tpu.ops.pallas_kernels import fast_score_pallas

    timed("fast_score(canvas)",
          scan_of(lambda c: jnp.sum(fast_score_pallas(c, A._PAD))),
          canvas, lambda v: float(v[0, 0]))

# 3. detect slices + select (needs a score map; reuse canvas as a stand-in
#    score with the same shape/dtype — identical op structure)
def det_sel(score_c):
    acc = jnp.float32(0)
    for lvl, ((hl, wl), off) in enumerate(
            zip(lay.level_shapes, lay.row_offsets)):
        s = jax.lax.slice(score_c, (off, 0), (off + hl, wl))
        det = A._detect_slice(s, cfg.ini_th_fast, cfg.min_th_fast,
                              cfg.fast_cell_size)
        xy_l, resp, valid = select_level(det, budgets[lvl],
                                         cfg.select_cell_size)
        acc += jnp.sum(xy_l) + jnp.sum(resp) + jnp.sum(valid)
    return acc

timed("detect+select", scan_of(det_sel), canvas, lambda v: float(v[0, 0]))

# 4. moments + angles at 2048 canvas points
xy_c = jnp.asarray(
    rng.uniform(40, 180, (sum(budgets), 2)).astype(np.float32))

def mom_ang(c):
    m10, m01 = moment_maps(c)
    return jnp.sum(angles_at(m10, m01, xy_c))

timed("moments+angles", scan_of(mom_ang), canvas, lambda v: float(v[0, 0]))

# 5. blur
timed("blur", scan_of(lambda c: jnp.sum(gaussian_blur(c))),
      canvas, lambda v: float(v[0, 0]))

# 6. brief sampling at 2048 points
ang = jnp.asarray(rng.uniform(0, 360, (sum(budgets),)).astype(np.float32))

def brief(c):
    d = descriptors_at(c, xy_c, ang)
    return jnp.sum(d.astype(jnp.float32))

timed("brief", scan_of(brief), canvas, lambda v: float(v[0, 0]))
