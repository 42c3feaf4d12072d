"""BRIEF-kernel experiment round 2: integer-valued blurred image.

The reference blurs into 8U, so sample values are integers in [0, 255] —
exactly representable in bf16. That licenses:
  v1: single bf16 contraction (drop the hi/lo pair), f32 patch DMA, G=16
  v2: v1 + bf16 tmp/colhot + G=32, S_CHUNK=128 (fewer grid steps)
  v3: bf16 image in HBM (half the DMA bytes), 16-aligned row origins,
      ROWS=64, G=32

Exactness is checked against a plain gather on an integer image; timing
uses the chained-scan two-point protocol (relay's block_until_ready is
fake).
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam_tracking_tpu.ops.pallas_kernels import brief_sample_pallas

S = 512


def make_variant(G, ROWS, COLS, S_CHUNK, compute_bf16, img_bf16, RALIGN):
    def _kernel(rs_ref, cs_ref, ly_ref, lx_ref, img_ref, out_ref,
                patch_ref, sems):
        i = pl.program_id(0)
        n_steps = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)

        def dma_for(step, buf, j):
            k = step * G + j
            rs = pl.multiple_of(rs_ref[k], RALIGN)
            cs = pl.multiple_of(cs_ref[k], 128)
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

        rows_iota = jax.lax.broadcasted_iota(
            jnp.int32, (G, S_CHUNK, ROWS), 2)
        cols_iota = jax.lax.broadcasted_iota(
            jnp.int32, (G, S_CHUNK, COLS), 2)
        for j in range(G):
            dma_for(i, slot, j).wait()
        patches = patch_ref[slot].astype(jnp.bfloat16)
        dn = (((2,), (1,)), ((0,), (0,)))
        for c0 in range(0, S, S_CHUNK):
            ly = ly_ref[:, c0: c0 + S_CHUNK]
            lx = lx_ref[:, c0: c0 + S_CHUNK]
            rowhot = (rows_iota == ly[:, :, None]).astype(jnp.bfloat16)
            tmp = jax.lax.dot_general(
                rowhot, patches, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )  # [G, S_CHUNK, COLS] integer-valued
            if compute_bf16:
                tmpb = tmp.astype(jnp.bfloat16)
                colhot = (cols_iota == lx[:, :, None]).astype(jnp.bfloat16)
                sel = (tmpb * colhot).astype(jnp.float32)
            else:
                colhot = (cols_iota == lx[:, :, None]).astype(jnp.float32)
                sel = tmp * colhot
            out_ref[:, c0: c0 + S_CHUNK] = jnp.sum(sel, axis=2)

    patch_dtype = jnp.bfloat16 if img_bf16 else jnp.float32

    def brief(img_padded, sy, sx):
        n0 = sy.shape[0]
        n = ((n0 + G - 1) // G) * G
        if n != n0:
            sy = jnp.concatenate([sy, jnp.broadcast_to(sy[:1], (n - n0, S))])
            sx = jnp.concatenate([sx, jnp.broadcast_to(sx[:1], (n - n0, S))])
        hp, wp = img_padded.shape
        rows_pad = ((hp + RALIGN - 1) // RALIGN) * RALIGN + ROWS
        cols_pad = ((wp + 127) // 128) * 128 + COLS
        img = jnp.pad(img_padded, ((0, rows_pad - hp), (0, cols_pad - wp)))
        if img_bf16:
            img = img.astype(jnp.bfloat16)
        y0 = jnp.min(sy, axis=1)
        x0 = jnp.min(sx, axis=1)
        rs = jnp.clip((y0 - 2) & ~(RALIGN - 1), 0,
                      rows_pad - ROWS).astype(jnp.int32)
        cs = jnp.clip((x0 - 2) & ~127, 0, cols_pad - COLS).astype(jnp.int32)
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
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((G, S), lambda i, rs, cs: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, G, ROWS, COLS), patch_dtype),
                pltpu.SemaphoreType.DMA((2, G)),
            ],
        )
        out = pl.pallas_call(
            _kernel, out_shape=jax.ShapeDtypeStruct((n, S), jnp.float32),
            grid_spec=grid_spec)(rs, cs, ly, lx, img)
        return out[:n0]

    return brief


rng = np.random.default_rng(0)
H, W = 2514, 768
img_np = np.floor(rng.uniform(0, 256, (H, W))).astype(np.float32)
img = jnp.asarray(img_np)
N = 2048
cy = rng.uniform(40, H - 40, N)
cx = rng.uniform(40, W - 40, N)
offs = rng.integers(-18, 19, (N, S, 2))
sy_np = (cy[:, None] + offs[..., 0]).astype(np.int32)
sx_np = (cx[:, None] + offs[..., 1]).astype(np.int32)
sy = jnp.asarray(sy_np)
sx = jnp.asarray(sx_np)
want = img_np[sy_np, sx_np]

variants = {
    "v1(G16,f32dma,1pass)": make_variant(16, 48, 256, 256, False, False, 8),
    "v2(G32,f32dma,bf16sel,S128)": make_variant(32, 48, 256, 128, True,
                                                False, 8),
    "v3(G32,bf16dma,R64)": make_variant(32, 64, 256, 128, True, True, 16),
}

for name, f in variants.items():
    try:
        got = np.asarray(jax.jit(f)(img, sy, sx))
        diff = float(np.abs(got - want).max())
        print(f"{name}: max diff = {diff}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:3000]}",
              flush=True)
        variants[name] = None

SCAN = 8


def scan_of(f):
    @jax.jit
    def g(im):
        def body(c, _):
            out = f(c, sy, sx)
            return c + jnp.sum(out) * 1e-20, None
        fin, _ = jax.lax.scan(body, im, None, length=SCAN)
        return fin
    return g


def timed(name, f):
    fn = scan_of(f)
    try:
        xx = fn(img)
        _ = float(xx[0, 0])
    except Exception as e:
        print(f"{name}: scan FAILED {type(e).__name__}: {str(e)[:2000]}",
              flush=True)
        return
    xx = img
    t0 = time.time()
    for _i in range(4):
        xx = fn(xx)
    _ = float(xx[0, 0])
    ta = time.time() - t0
    xx = img
    t0 = time.time()
    for _i in range(12):
        xx = fn(xx)
    _ = float(xx[0, 0])
    tb = time.time() - t0
    ms = (tb - ta) / (8 * SCAN) * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)


timed("prod(hi/lo,G16)", brief_sample_pallas)
for name, f in variants.items():
    if f is not None:
        timed(name, f)
print("done", flush=True)
