"""Pallas TPU kernels for the hot compute paths.

Two kernels, each an alternative backend to an existing XLA formulation
(numerics are identical, verified against the XLA paths by tests running
the kernels in interpret mode):

1. ``hamming_matrix_pallas`` — blocked XOR+popcount all-pairs Hamming
   distance. The MXU bit-matmul in hamming.py is the throughput champion
   for large all-pairs products; this kernel keeps the [B1, B2, 8] XOR
   intermediate entirely in VMEM instead of materializing unpacked bit
   planes in HBM, which wins for small/medium tiles and for fusing with
   masking.

2. ``fast_score_pallas`` — fused FAST-9/16 corner score: the 16 ring
   taps, the 9-wide cyclic arc min/max reduction and the score all happen
   in one VMEM-resident pass per row tile (the XLA path in fast.py
   materializes a [16, H, W] ring stack in HBM). Tiles carry a 3-pixel
   halo; halo'd tiles are staged as a [n_tiles, ROWS+6, W] stack so block
   boundaries stay non-overlapping (Pallas block offsets are in units of
   the block shape).

Both kernels follow the TPU tiling rules (last-dim 128 alignment, static
shapes, no data-dependent control flow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import RING_OFFSETS, _ARC
from .pattern import HALF_PATCH_SIZE, umax_table

__all__ = ["hamming_matrix_pallas", "fast_score_pallas",
           "brief_sample_pallas", "moments_at_pallas"]


# ---------------------------------------------------------------------------
# Hamming distance
# ---------------------------------------------------------------------------

_HB = 128  # tile edge (lane-aligned)


def _hamming_kernel(a_ref, b_ref, out_ref):
    a = a_ref[:]                       # [HB, 8] uint32
    b = b_ref[:]                       # [HB, 8] uint32
    x = a[:, None, :] ^ b[None, :, :]  # [HB, HB, 8]
    out_ref[:] = jnp.sum(
        jax.lax.population_count(x).astype(jnp.int32), axis=-1
    )


def hamming_matrix_pallas(d1: jnp.ndarray, d2: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """[N1, 8] x [N2, 8] uint32 -> [N1, N2] int32 Hamming distances.

    N1 and N2 must be multiples of 128 (keypoint capacities already are:
    OrbConfig.max_keypoints rounds up to 256).
    """
    n1, n2 = d1.shape[0], d2.shape[0]
    assert n1 % _HB == 0 and n2 % _HB == 0, (n1, n2)
    grid = (n1 // _HB, n2 // _HB)
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_HB, 8), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_HB, 8), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_HB, _HB), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(d1, d2)


# ---------------------------------------------------------------------------
# FAST-9/16 corner score
# ---------------------------------------------------------------------------

_ROWS = 64  # interior rows computed per grid step


_HALO = 4  # row halo (>=3 for the ring; 4 keeps tiles 8-sublane aligned)


def _fast_kernel(tile_ref, out_ref):
    """tile_ref: [1, ROWS + 2*HALO, C]; out_ref: [1, ROWS, C].

    Column taps use jnp.roll (slice+concat on the lane axis); the tile
    keeps the level image's own reflect apron on both sides, so wrapped
    lanes only ever land in the cropped-away alignment padding — the
    result is exact.
    """
    tile = tile_ref[0]
    rows = out_ref.shape[1]

    def tap(dx, dy):
        shifted = jnp.roll(tile, -dx, axis=1) if dx else tile
        return shifted[_HALO + dy: _HALO + dy + rows, :]

    c = tile[_HALO: _HALO + rows, :]
    ring = [tap(dx, dy) for (dx, dy) in RING_OFFSETS]

    def windowed_min_max(diffs):
        # max over the 16 cyclic 9-windows of the per-window min
        acc = list(diffs)
        for k in range(1, _ARC):
            rot = diffs[k:] + diffs[:k]
            acc = [jnp.minimum(a, r) for a, r in zip(acc, rot)]
        best = acc[0]
        for a in acc[1:]:
            best = jnp.maximum(best, a)
        return best

    diff_b = [r - c for r in ring]
    diff_d = [c - r for r in ring]
    out_ref[:] = jnp.maximum(
        windowed_min_max(diff_b), windowed_min_max(diff_d)
    )[None]


# ---------------------------------------------------------------------------
# rBRIEF descriptor sampling
# ---------------------------------------------------------------------------

_P_ROWS = 48   # patch rows DMA'd per keypoint (8-aligned; local row ids
               # land in [2, 47] given the 8-aligned origin)
_P_COLS = 256  # patch cols (2 lanes; local col ids land in [2, 167])


_KP_GROUP = 16  # keypoints per grid step (sublane-aligned blocks)
_S_CHUNK = 256  # sample-axis chunk (bounds the [G, S, COLS] VMEM buffers)

# integer-image fast path (values exactly representable in bf16);
# G16/S256 measured best (G32 within noise)
_KP_GROUP_INT = 16
_S_CHUNK_INT = 256


def _brief_kernel(rs_ref, cs_ref, ly_ref, lx_ref, img_ref, out_ref,
                  patch_ref, sems):
    """A group of keypoints per grid step, DOUBLE-BUFFERED.

    rs/cs: prefetched aligned patch origins [N]; ly/lx: [G, 512] local
    sample coordinates inside each keypoint's patch; img: full padded
    level image in ANY/HBM; out: [G, 512] sampled values.

    Per keypoint, the 512 scattered reads become two one-hot
    contractions: vals[s] = rowhot[s, :] @ patch @ colhot[s, :]^T — an
    MXU matmul plus a VPU masked reduce instead of scalar gathers. The
    patch scratch is [2, G, ...]: while group i computes from slot i%2,
    group i+1's DMAs stream into the other slot — grid steps execute
    sequentially, so the produced->consumed hazard is one step apart and
    the overlap hides the (dominant) HBM patch-fetch latency.
    """
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def dma_for(step, buf, j):
        k = step * _KP_GROUP + j
        rs = pl.multiple_of(rs_ref[k], 8)     # origins are pre-aligned by
        cs = pl.multiple_of(cs_ref[k], 128)   # the host wrapper
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(rs, _P_ROWS), pl.ds(cs, _P_COLS)],
            patch_ref.at[buf, j],
            sems.at[buf, j],
        )

    @pl.when(i == 0)
    def _():
        for j in range(_KP_GROUP):
            dma_for(i, slot, j).start()

    @pl.when(i + 1 < n_steps)
    def _():
        nxt = jax.lax.rem(i + 1, 2)
        for j in range(_KP_GROUP):
            dma_for(i + 1, nxt, j).start()

    rows_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_KP_GROUP, _S_CHUNK, _P_ROWS), 2
    )
    cols_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_KP_GROUP, _S_CHUNK, _P_COLS), 2
    )
    for j in range(_KP_GROUP):
        dma_for(i, slot, j).wait()
    patches = patch_ref[slot]
    # The one-hot selection must reproduce the f32 pixel values exactly,
    # but HIGHEST-precision f32 matmuls cost 6 bf16 MXU passes. Instead
    # split the patch into an exact bf16 hi/lo pair (x == hi + lo in f32
    # to below sample precision): two single-pass bf16 contractions whose
    # f32 accumulations add back losslessly — 3x fewer MXU passes.
    hi = patches.astype(jnp.bfloat16)
    lo = (patches - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    for c0 in range(0, 512, _S_CHUNK):
        ly = ly_ref[:, c0: c0 + _S_CHUNK]
        lx = lx_ref[:, c0: c0 + _S_CHUNK]
        rowhot = (rows_iota == ly[:, :, None]).astype(jnp.bfloat16)
        colhot = (cols_iota == lx[:, :, None]).astype(jnp.float32)
        dn = (((2,), (1,)), ((0,), (0,)))
        tmp = jax.lax.dot_general(
            rowhot, hi, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            rowhot, lo, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )  # [G, _S_CHUNK, _P_COLS]
        out_ref[:, c0: c0 + _S_CHUNK] = jnp.sum(tmp * colhot, axis=2)


def _brief_kernel_int(rs_ref, cs_ref, ly_ref, lx_ref, img_ref, out_ref,
                      patch_ref, sems):
    """Integer-image variant of ``_brief_kernel``: when every pixel value
    is an integer in [0, 255] (the reference blurs into 8U —
    ``ORBextractor.cpp:1115`` GaussianBlur on CV_8U), bf16 represents the
    values EXACTLY, so a single bf16 contraction is exact.

    Structure (2.2x the hi/lo kernel, measured): a per-step ablation
    showed the DMAs, the MXU matmuls and the grid overhead are all ~free;
    the cost was VPU one-hot work and above all masked reductions over
    the LANE dim. So v4 runs the COLUMN selection on the MXU (contract C:
    patches [G,R,C] x colhot [G,S,C] -> colsel [G,R,S]) and the final row
    selection as a masked reduce over R in the SUBLANE dim, leaving the
    colhot construction as the only large VPU op. Same double-buffered
    DMA pipeline as ``_brief_kernel``."""
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def dma_for(step, buf, j):
        k = step * _KP_GROUP_INT + j
        rs = pl.multiple_of(rs_ref[k], 8)
        cs = pl.multiple_of(cs_ref[k], 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(rs, _P_ROWS), pl.ds(cs, _P_COLS)],
            patch_ref.at[buf, j],
            sems.at[buf, j],
        )

    @pl.when(i == 0)
    def _():
        for j in range(_KP_GROUP_INT):
            dma_for(i, slot, j).start()

    @pl.when(i + 1 < n_steps)
    def _():
        nxt = jax.lax.rem(i + 1, 2)
        for j in range(_KP_GROUP_INT):
            dma_for(i + 1, nxt, j).start()

    for j in range(_KP_GROUP_INT):
        dma_for(i, slot, j).wait()
    patches = patch_ref[slot].astype(jnp.bfloat16)  # exact: ints <= 255
    rows_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_KP_GROUP_INT, _P_ROWS, _S_CHUNK_INT), 1
    )
    cols_iota = jax.lax.broadcasted_iota(
        jnp.int32, (_KP_GROUP_INT, _S_CHUNK_INT, _P_COLS), 2
    )
    # contract C: lhs [G, R, C] x rhs [G, S, C] -> [G, R, S]
    dn = (((2,), (2,)), ((0,), (0,)))
    for c0 in range(0, 512, _S_CHUNK_INT):
        ly = ly_ref[:, c0: c0 + _S_CHUNK_INT]
        lx = lx_ref[:, c0: c0 + _S_CHUNK_INT]
        colhot = (cols_iota == lx[:, :, None]).astype(jnp.bfloat16)
        colsel = jax.lax.dot_general(
            patches, colhot, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )  # [G, R, S_CHUNK]
        rowmask = rows_iota == ly[:, None, :]
        out_ref[:, c0: c0 + _S_CHUNK_INT] = jnp.sum(
            jnp.where(rowmask, colsel, 0.0), axis=1
        )


def brief_sample_pallas(blurred_padded: jnp.ndarray, sy: jnp.ndarray,
                        sx: jnp.ndarray, interpret: bool = False,
                        integer_values: bool = False) -> jnp.ndarray:
    """Sample ``blurred_padded[sy, sx]`` for [N, 512] integer coordinates.

    Coordinates are absolute indices into the padded level image; callers
    guarantee they lie >= 13 away from the array edge (keypoint border +
    apron geometry). Returns [N, 512] float32 samples.

    ``integer_values=True`` asserts every pixel value is an integer in
    [0, 255] (true for the rint'ed blur output — the reference's blur is
    8U): the kernel then runs a single-pass bf16 path with double the
    keypoint group, exact for such inputs.
    """
    group = _KP_GROUP_INT if integer_values else _KP_GROUP
    kernel = _brief_kernel_int if integer_values else _brief_kernel
    n0 = sy.shape[0]
    n = ((n0 + group - 1) // group) * group
    if n != n0:
        # pad with copies of row 0 (valid coordinates), sliced off below
        sy = jnp.concatenate([sy, jnp.broadcast_to(sy[:1], (n - n0, 512))])
        sx = jnp.concatenate([sx, jnp.broadcast_to(sx[:1], (n - n0, 512))])
    hp, wp = blurred_padded.shape
    # pad so every aligned patch window fits
    rows_pad = ((hp + 7) // 8) * 8 + _P_ROWS
    cols_pad = ((wp + 127) // 128) * 128 + _P_COLS
    img = jnp.pad(blurred_padded,
                  ((0, rows_pad - hp), (0, cols_pad - wp)))
    # per-keypoint aligned patch origin from the min sample coordinate
    y0 = jnp.min(sy, axis=1)
    x0 = jnp.min(sx, axis=1)
    rs = jnp.clip((y0 - 2) & ~7, 0, rows_pad - _P_ROWS).astype(jnp.int32)
    cs = jnp.clip((x0 - 2) & ~127, 0, cols_pad - _P_COLS).astype(jnp.int32)
    ly = (sy - rs[:, None]).astype(jnp.int32)
    lx = (sx - cs[:, None]).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // group,),
        in_specs=[
            pl.BlockSpec((group, 512), lambda i, rs, cs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, 512), lambda i, rs, cs: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((group, 512), lambda i, rs, cs: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, group, _P_ROWS, _P_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, group)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 512), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rs, cs, ly, lx, img)
    return out[:n0]


# ---------------------------------------------------------------------------
# Per-keypoint IC disc moments
# ---------------------------------------------------------------------------

_M_ROWS = 40   # 8-aligned patch rows: disc radius 15 + 2 slack + <=7
               # alignment slop + 15 = 39 max local row
_M_COLS = 256  # 128-aligned patch cols: 15 + 2 + <=127 slop + 15 = 159 max
_M_GROUP = 16


def _moments_kernel(rs_ref, cs_ref, cyl_ref, cxl_ref, img_ref, out_ref,
                    patch_ref, sems):
    """Per-keypoint IC disc moments (m10, m01) — the data the dense
    ``orientation.moment_maps`` canvas pass (its round-3 on-chip cost:
    0.402 ms) computes for every one of ~2M canvas pixels but the
    extractor only ever reads at the ~2k selected keypoints. This kernel
    computes them per keypoint from the same 48-row DMA structure as the
    BRIEF sampler (double-buffered patch fetches, grid-step pipelined),
    replacing ~0.4 GFLOP of dense VPU work with ~3 MFLOP of masked
    per-patch reductions.

    Disc semantics are the reference's ``IC_Angle``
    (``Features/ORBextractor.cpp:103-159``): rows |dy| <= 15, per-row
    half-width umax[|dy|] (the symmetric cvRound disc, pattern.py).
    The umax lookup is a static 16-term select chain on the tiny
    [G, M_ROWS] |dy| tensor.
    """
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def dma_for(step, buf, j):
        k = step * _M_GROUP + j
        rs = pl.multiple_of(rs_ref[k], 8)
        cs = pl.multiple_of(cs_ref[k], 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(rs, _M_ROWS), pl.ds(cs, _M_COLS)],
            patch_ref.at[buf, j],
            sems.at[buf, j],
        )

    @pl.when(i == 0)
    def _():
        for j in range(_M_GROUP):
            dma_for(i, slot, j).start()

    @pl.when(i + 1 < n_steps)
    def _():
        nxt = jax.lax.rem(i + 1, 2)
        for j in range(_M_GROUP):
            dma_for(i + 1, nxt, j).start()

    for j in range(_M_GROUP):
        dma_for(i, slot, j).wait()
    patches = patch_ref[slot]                      # [G, M_ROWS, M_COLS]

    base = i * _M_GROUP
    cyl = jnp.stack([cyl_ref[base + j] for j in range(_M_GROUP)])
    cxl = jnp.stack([cxl_ref[base + j] for j in range(_M_GROUP)])

    rows1 = jax.lax.broadcasted_iota(jnp.int32, (_M_GROUP, _M_ROWS), 1)
    ady1 = jnp.abs(rows1 - cyl[:, None])           # [G, M_ROWS]
    u = jnp.zeros_like(ady1)
    for k, uk in enumerate(umax_table().tolist()):
        u = jnp.where(ady1 == k, jnp.int32(uk), u)

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (_M_GROUP, _M_ROWS, _M_COLS), 1)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (_M_GROUP, _M_ROWS, _M_COLS), 2)
    dy = rows - cyl[:, None, None]
    dx = cols - cxl[:, None, None]
    mask = (jnp.abs(dy) <= HALF_PATCH_SIZE) & (jnp.abs(dx) <= u[:, :, None])
    w = jnp.where(mask, patches, 0.0)
    m10 = jnp.sum(w * dx.astype(jnp.float32), axis=(1, 2))   # [G]
    m01 = jnp.sum(w * dy.astype(jnp.float32), axis=(1, 2))
    out_ref[:] = jnp.concatenate(
        [m10[:, None], m01[:, None],
         jnp.zeros((_M_GROUP, 126), jnp.float32)], axis=1)


def moments_at_pallas(canvas: jnp.ndarray, yc: jnp.ndarray, xc: jnp.ndarray,
                      interpret: bool = False) -> tuple:
    """(m10, m01) [N] at absolute pixel coords (yc, xc) of ``canvas``.

    ``yc``/``xc`` are int32 coordinates INTO the raw (padded) canvas —
    the caller adds the apron offset; keypoints live >= 19 px from every
    block edge so the radius-15 disc reads stay inside the owning block.
    """
    n0 = yc.shape[0]
    n = ((n0 + _M_GROUP - 1) // _M_GROUP) * _M_GROUP
    if n != n0:
        yc = jnp.concatenate([yc, jnp.broadcast_to(yc[:1], (n - n0,))])
        xc = jnp.concatenate([xc, jnp.broadcast_to(xc[:1], (n - n0,))])
    hp, wp = canvas.shape
    rows_pad = ((hp + 7) // 8) * 8 + _M_ROWS
    cols_pad = ((wp + 127) // 128) * 128 + _M_COLS
    img = jnp.pad(canvas, ((0, rows_pad - hp), (0, cols_pad - wp)))
    rs = jnp.clip((yc - HALF_PATCH_SIZE - 2) & ~7,
                  0, rows_pad - _M_ROWS).astype(jnp.int32)
    cs = jnp.clip((xc - HALF_PATCH_SIZE - 2) & ~127,
                  0, cols_pad - _M_COLS).astype(jnp.int32)
    cyl = (yc - rs).astype(jnp.int32)
    cxl = (xc - cs).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n // _M_GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((_M_GROUP, 128),
                               lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _M_GROUP, _M_ROWS, _M_COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, _M_GROUP)),
        ],
    )
    out = pl.pallas_call(
        _moments_kernel,
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rs, cs, cyl, cxl, img)
    return out[:n0, 0], out[:n0, 1]


def fast_score_pallas(padded: jnp.ndarray, pad: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused FAST score from a padded level image [H + 2p, W + 2p].

    Returns [H, W] float32, identical to ``fast.fast_score``.
    """
    hp, wp = padded.shape
    h = hp - 2 * pad
    w = wp - 2 * pad
    crop = pad - _HALO
    img = padded[crop: hp - crop, :]            # [h + 2*HALO, W + 2p]
    # columns: keep a left offset of `pad` baked in; align lanes
    n_tiles = (h + _ROWS - 1) // _ROWS
    cols = ((wp + 127) // 128) * 128
    img = jnp.pad(
        img, ((0, n_tiles * _ROWS - h), (0, cols - wp))
    )  # [n_tiles * ROWS + 2*HALO, cols]
    tiles = jnp.stack(
        [
            jax.lax.dynamic_slice(img, (t * _ROWS, 0), (_ROWS + 2 * _HALO, cols))
            for t in range(n_tiles)
        ]
    )
    out = pl.pallas_call(
        _fast_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, _ROWS, cols), padded.dtype),
        grid_spec=pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, _ROWS + 2 * _HALO, cols),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, _ROWS, cols), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(tiles)
    return out.reshape(n_tiles * _ROWS, cols)[:h, pad: pad + w]
