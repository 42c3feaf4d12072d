"""BRIEF-kernel cost attribution: timing was flat across pass-count/
group/DMA-byte variants, so ablate each kernel stage to find the real
bottleneck. All variants share the v1 structure (G16, S256, single-pass
bf16) and differ in ONE removed stage; outputs stay shape-compatible and
data-dependent so nothing is DCE'd.

  full      : complete v1 kernel
  no_dma    : patches read from an undefined scratch slot (DMAs never
              started) -> isolates DMA cost
  no_colsel : skip colhot construction + mask-reduce; out = row-slice
              sums of tmp -> isolates col-select cost
  no_matmul : skip the rowhot matmul; tmp = broadcast patch rows ->
              isolates MXU cost
  floor     : DMAs + trivial store only -> grid/step overhead floor
"""

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 16
ROWS = 48
COLS = 256
S = 512
S_CHUNK = 256


def make_variant(mode):
    def _kernel(rs_ref, cs_ref, ly_ref, lx_ref, img_ref, out_ref,
                patch_ref, sems):
        i = pl.program_id(0)
        n_steps = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)

        def dma_for(step, buf, j):
            k = step * G + j
            rs = pl.multiple_of(rs_ref[k], 8)
            cs = pl.multiple_of(cs_ref[k], 128)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(rs, ROWS), pl.ds(cs, COLS)],
                patch_ref.at[buf, j],
                sems.at[buf, j],
            )

        if mode != "no_dma":
            @pl.when(i == 0)
            def _():
                for j in range(G):
                    dma_for(i, slot, j).start()

            @pl.when(i + 1 < n_steps)
            def _():
                nxt = jax.lax.rem(i + 1, 2)
                for j in range(G):
                    dma_for(i + 1, nxt, j).start()

            for j in range(G):
                dma_for(i, slot, j).wait()

        if mode == "floor":
            out_ref[...] = (
                patch_ref[slot, :, :, 0]
                .reshape(G, ROWS)[:, :1]
                * jnp.ones((G, S), jnp.float32)
            )
            return

        rows_iota = jax.lax.broadcasted_iota(
            jnp.int32, (G, S_CHUNK, ROWS), 2)
        cols_iota = jax.lax.broadcasted_iota(
            jnp.int32, (G, S_CHUNK, COLS), 2)
        patches = patch_ref[slot].astype(jnp.bfloat16)
        dn = (((2,), (1,)), ((0,), (0,)))
        for c0 in range(0, S, S_CHUNK):
            ly = ly_ref[:, c0: c0 + S_CHUNK]
            lx = lx_ref[:, c0: c0 + S_CHUNK]
            if mode == "no_matmul":
                # stand-in for tmp with the same shape/dtype, no MXU
                tmp = (
                    patches[:, :1, :]
                    * ly[:, :, None].astype(jnp.bfloat16)
                ).astype(jnp.float32)
            else:
                rowhot = (rows_iota == ly[:, :, None]).astype(jnp.bfloat16)
                tmp = jax.lax.dot_general(
                    rowhot, patches, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
            if mode == "no_colsel":
                out_ref[:, c0: c0 + S_CHUNK] = tmp[:, :, 0]
            else:
                tmpb = tmp.astype(jnp.bfloat16)
                colhot = (cols_iota == lx[:, :, None]).astype(jnp.bfloat16)
                out_ref[:, c0: c0 + S_CHUNK] = jnp.sum(
                    (tmpb * colhot).astype(jnp.float32), axis=2)

    def brief(img_padded, sy, sx):
        n0 = sy.shape[0]
        n = ((n0 + G - 1) // G) * G
        hp, wp = img_padded.shape
        rows_pad = ((hp + 7) // 8) * 8 + ROWS
        cols_pad = ((wp + 127) // 128) * 128 + COLS
        img = jnp.pad(img_padded, ((0, rows_pad - hp), (0, cols_pad - wp)))
        y0 = jnp.min(sy, axis=1)
        x0 = jnp.min(sx, axis=1)
        rs = jnp.clip((y0 - 2) & ~7, 0, rows_pad - ROWS).astype(jnp.int32)
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
                pltpu.VMEM((2, G, ROWS, COLS), jnp.float32),
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
img = jnp.asarray(np.floor(rng.uniform(0, 256, (H, W))).astype(np.float32))
N = 2048
cy = rng.uniform(40, H - 40, N)
cx = rng.uniform(40, W - 40, N)
offs = rng.integers(-18, 19, (N, S, 2))
sy = jnp.asarray((cy[:, None] + offs[..., 0]).astype(np.int32))
sx = jnp.asarray((cx[:, None] + offs[..., 1]).astype(np.int32))

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
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:2000]}",
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


for mode in ["full", "no_dma", "no_colsel", "no_matmul", "floor"]:
    timed(mode, make_variant(mode))
print("done", flush=True)
