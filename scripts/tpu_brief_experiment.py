"""BRIEF-kernel experiment: narrow patches + hi/lo K-packing, image
pinned to HBM so DMA origins need not be 128-aligned. Two variants:
  A: [48, 64] patches, 8-aligned col origin
  B: [48, 128] patches, 64-aligned col origin (fallback)
Checks exactness vs the production kernel, then times all three."""

import sys

sys.path.insert(0, "/root/repo")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam_tracking_tpu.ops.pallas_kernels import brief_sample_pallas

G = 16
ROWS = 48
S = 512


def make_kernel(COLS, CALIGN):
    def _kernel(rs_ref, cs_ref, ly_ref, lx_ref, img_ref, out_ref,
                patch_ref, sems):
        i = pl.program_id(0)
        n_steps = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)

        def dma_for(step, buf, j):
            k = step * G + j
            rs = pl.multiple_of(rs_ref[k], 8)
            cs = pl.multiple_of(cs_ref[k], CALIGN)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(rs, ROWS), pl.ds(cs, COLS)],
                patch_ref.at[buf, j],
                sems.at[buf, j],
            )

        @pl.when(i == 0)
        def _():
            for j in range(G):
                dma_for(i, slot, j).start()

        @pl.when(i + 1 < n_steps)
        def _():
            nxt = jax.lax.rem(i + 1, 2)
            for j in range(G):
                dma_for(i + 1, nxt, j).start()

        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (G, S, 2 * ROWS), 2)
        cols_iota = jax.lax.broadcasted_iota(jnp.int32, (G, S, COLS), 2)
        for j in range(G):
            dma_for(i, slot, j).wait()
        patches = patch_ref[slot]
        hi = patches.astype(jnp.bfloat16)
        lo = (patches - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        stacked = jnp.concatenate([hi, lo], axis=1)  # [G, 2R, C]
        ly = ly_ref[...]
        lx = lx_ref[...]
        rowhot = ((rows_iota == ly[:, :, None])
                  | (rows_iota == (ly[:, :, None] + ROWS))
                  ).astype(jnp.bfloat16)
        colhot = (cols_iota == lx[:, :, None]).astype(jnp.float32)
        dn = (((2,), (1,)), ((0,), (0,)))
        tmp = jax.lax.dot_general(rowhot, stacked, dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
        out_ref[...] = jnp.sum(tmp * colhot, axis=2)

    return _kernel


def make_brief(COLS, CALIGN):
    kern = make_kernel(COLS, CALIGN)

    def brief(img_padded, sy, sx):
        n0 = sy.shape[0]
        n = ((n0 + G - 1) // G) * G
        if n != n0:
            sy = jnp.concatenate(
                [sy, jnp.broadcast_to(sy[:1], (n - n0, S))])
            sx = jnp.concatenate(
                [sx, jnp.broadcast_to(sx[:1], (n - n0, S))])
        hp, wp = img_padded.shape
        rows_pad = ((hp + 7) // 8) * 8 + ROWS
        cols_pad = ((wp + 127) // 128) * 128 + COLS
        img = jnp.pad(img_padded, ((0, rows_pad - hp), (0, cols_pad - wp)))
        y0 = jnp.min(sy, axis=1)
        x0 = jnp.min(sx, axis=1)
        rs = jnp.clip((y0 - 2) & ~7, 0,
                      rows_pad - ROWS).astype(jnp.int32)
        cs = jnp.clip((x0 - 2) & ~(CALIGN - 1), 0,
                      cols_pad - COLS).astype(jnp.int32)
        ly = (sy - rs[:, None]).astype(jnp.int32)
        lx = (sx - cs[:, None]).astype(jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n // G,),
            in_specs=[
                pl.BlockSpec((G, S), lambda i, rs, cs: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, S), lambda i, rs, cs: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((G, S), lambda i, rs, cs: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, G, ROWS, COLS), jnp.float32),
                pltpu.SemaphoreType.DMA((2, G)),
            ],
        )
        out = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((n, S), jnp.float32),
            grid_spec=grid_spec)(rs, cs, ly, lx, img)
        return out[:n0]

    return brief


rng = np.random.default_rng(0)
H, W = 2514, 768
img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
N = 2048
cy = rng.uniform(40, H - 40, N)
cx = rng.uniform(40, W - 40, N)
offs = rng.integers(-18, 19, (N, S, 2))
sy = jnp.asarray((cy[:, None] + offs[..., 0]).astype(np.int32))
sx = jnp.asarray((cx[:, None] + offs[..., 1]).astype(np.int32))

brief_a = make_brief(64, 8)
brief_b = make_brief(128, 64)

a_ref = jax.jit(brief_sample_pallas)(img, sy, sx)
for name, f in [("A(64col)", brief_a), ("B(128col)", brief_b)]:
    try:
        b = jax.jit(f)(img, sy, sx)
        diff = float(jnp.max(jnp.abs(a_ref - b)))
        print(f"{name}: max diff = {diff}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:4000]}",
              flush=True)

SCAN = 8


def scan_of(f):
    @jax.jit
    def g(x):
        def body(c, _):
            return c + jnp.sum(f(c, sy, sx)) * 1e-12, None
        out, _ = jax.lax.scan(body, x, None, length=SCAN)
        return out
    return g


def timed(name, fn, arg):
    try:
        y = fn(arg)
        _ = float(y[0, 0])
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:4000]}",
              flush=True)
        return
    xx = arg
    for _i in range(3):
        xx = fn(xx)
    _ = float(xx[0, 0])
    xx = arg
    t0 = time.time()
    for _i in range(4):
        xx = fn(xx)
    _ = float(xx[0, 0])
    ta = time.time() - t0
    xx = arg
    t0 = time.time()
    for _i in range(12):
        xx = fn(xx)
    _ = float(xx[0, 0])
    tb = time.time() - t0
    ms = (tb - ta) / (8 * SCAN) * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)


timed("old(256col,2xK48)", scan_of(brief_sample_pallas), img)
timed("A(64col,K96)", scan_of(brief_a), img)
timed("B(128col,K96)", scan_of(brief_b), img)
