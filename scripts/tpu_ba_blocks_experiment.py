#!/usr/bin/env python
"""Isolate the binding stage of bundle_adjust at the 64-KF scale.

The round-5 anchors read TPU/g2o = 1.45x at local64 (32.35 vs 22.34 LM
iters/s) and 1.32x at global96 — the ratio SHRINKS with scale, opposite
the MXU expectation. 31 ms/LM-iter at local64 is ~30x the analytic
compute+bandwidth floor, so something structural binds. Prime suspect:
the five `.at[].add` segment-sums over the 65,536-observation axis
(U, V, g_c, g_p, Wb in `optim/ba.py:lm_iter`) — XLA lowers colliding
scatter-adds on TPU to a serialized update loop.

One jitted program per process (relay wedge protocol: keep jit counts
minimal), selected with --variant:

  full        bundle_adjust(10 iters) — calibration against ba_bench
  resid       residual+Jacobian stage only (chained x10)
  blocks      resid + the 5 scatter-adds exactly as lm_iter builds them
  blocks_flag same, indices_are_sorted=True on the point-keyed scatters
              (ba_bench's obs_pt is repeat(arange): already sorted)
  blocks_mm   scatter-free: one-hot MXU matmul for the camera-keyed
              sums (nK=64 targets), cumsum-difference segment sums for
              the point-keyed ones (sorted keys)
  schur       the dense Schur algebra (Y/S/rhs einsums + 384x384
              cho_solve + back-substitution) from materialized blocks

Chained two-point timing per BASELINE.md methodology (the relay's
block_until_ready lies). Usage:
  python scripts/tpu_ba_blocks_experiment.py --variant blocks [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--variant", required=True,
                choices=["full", "resid", "blocks", "blocks_flag",
                         "blocks_mm", "blocks_mm2", "blocks_sc2",
                         "blocks_uq", "useg_only", "vseg_only",
                         "blocks_fac", "blocks_win2", "blocks_cam",
                         "schur", "schur2"])
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--selfcheck", action="store_true",
                help="blocks_cam only: compare one block build against "
                     "the scatter formulation and exit")
ap.add_argument("--shape", default="local64")
ap.add_argument("--json", default=None)
args = ap.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ba_bench import FX, FY, CX, CY, SHAPES, make_problem
from orb_slam_tracking_tpu.optim.ba import _obs_residuals, bundle_adjust
from orb_slam_tracking_tpu.optim.lm import huber_weight, inv3x3

_HI = jax.lax.Precision.HIGHEST
SCAN = 10
CHI2 = 5.991

nK, nP, OPP = SHAPES[args.shape]
p = make_problem(0, args.shape)
O = len(p["obs_kf"])
nF = nK

kf_R = jnp.asarray(p["kf_R0"], jnp.float32)
kf_t = jnp.asarray(p["kf_t0"], jnp.float32)
pts = jnp.asarray(p["pts0"], jnp.float32)
obs_kf = jnp.asarray(p["obs_kf"])
obs_pt = jnp.asarray(p["obs_pt"])
obs_uv = jnp.asarray(p["obs_uv"], jnp.float32)
K = jnp.asarray([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], jnp.float32)

free_cam = jnp.logical_not(jnp.asarray(p["kf_fixed"]))
free_rank = jnp.cumsum(free_cam.astype(jnp.int32)) - 1
in_window = free_cam & (free_rank < nF)
fidx = jnp.where(in_window, free_rank, nF)
obs_fidx = fidx[obs_kf]

# host-side segment boundaries for the cumsum variants. obs_pt arrives
# sorted, but fixed cameras map to the dump slot (rank nF > any free
# rank), so the (pt, fidx) flat key is NOT ascending within a point —
# sort all obs arrays by the flat key (stable, pt-major: obs_pt stays
# sorted; segment sums are order-independent, so every variant can use
# the same order)
fidx_np = np.asarray(fidx)
flat_np = (p["obs_pt"].astype(np.int64) * (nF + 1)
           + fidx_np[p["obs_kf"]])
perm = np.argsort(flat_np, kind="stable")
for key in ("obs_kf", "obs_pt", "obs_uv"):
    p[key] = p[key][perm]
flat_np = flat_np[perm]
obs_kf = jnp.asarray(p["obs_kf"])
obs_pt = jnp.asarray(p["obs_pt"])
obs_uv = jnp.asarray(p["obs_uv"], jnp.float32)
obs_fidx = fidx[obs_kf]
okf_np, opt_np = p["obs_kf"], p["obs_pt"]
assert (np.diff(opt_np) >= 0).all(), "obs_pt must be sorted"
assert (np.diff(flat_np) >= 0).all(), "flat (pt,fidx) keys must be sorted"
pt_starts = jnp.asarray(np.searchsorted(opt_np, np.arange(nP), "left"))
pt_ends = jnp.asarray(np.searchsorted(opt_np, np.arange(nP), "right"))
cells = np.arange(nP * (nF + 1), dtype=np.int64)
cell_starts = jnp.asarray(np.searchsorted(flat_np, cells, "left"))
cell_ends = jnp.asarray(np.searchsorted(flat_np, cells, "right"))


def residjac(t_shift):
    # t_shift: tiny chained perturbation so every scan step recomputes
    r, Jc, Jp, _ = _obs_residuals(
        kf_R, kf_t + t_shift, pts, obs_kf, obs_pt, obs_uv,
        K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    chi2 = jnp.sum(r * r, axis=-1)
    w = huber_weight(chi2, CHI2)
    return r, Jc, Jp, w


def obs_blocks(r, Jc, Jp, w):
    bU = jnp.einsum("ori,o,orj->oij", Jc, w, Jc, precision=_HI)   # [O,6,6]
    bV = jnp.einsum("ori,o,orj->oij", Jp, w, Jp, precision=_HI)   # [O,3,3]
    bgc = jnp.einsum("ori,o,or->oi", Jc, w, r, precision=_HI)     # [O,6]
    bgp = jnp.einsum("ori,o,or->oi", Jp, w, r, precision=_HI)     # [O,3]
    bW = jnp.einsum("ori,o,orj->oij", Jc, w, Jp, precision=_HI)   # [O,6,3]
    return bU, bV, bgc, bgp, bW


def obs_blocks_bcast(r, Jc, Jp, w):
    """Per-obs outer products as broadcast multiply-adds: the residual
    dim is 2, so the einsum forms are batched 6x2 @ 2x6 matmuls —
    pathological MXU tiles (and 6-pass under HIGHEST). Pure f32 VPU
    elementwise is exact and tiny: O x 72 FLOPs."""
    Jcw = Jc * w[:, None, None]
    bU = (Jcw[:, 0, :, None] * Jc[:, 0, None, :]
          + Jcw[:, 1, :, None] * Jc[:, 1, None, :])
    Jpw = Jp * w[:, None, None]
    bV = (Jpw[:, 0, :, None] * Jp[:, 0, None, :]
          + Jpw[:, 1, :, None] * Jp[:, 1, None, :])
    bgc = Jcw[:, 0] * r[:, 0, None] + Jcw[:, 1] * r[:, 1, None]
    bgp = Jpw[:, 0] * r[:, 0, None] + Jpw[:, 1] * r[:, 1, None]
    bW = (Jcw[:, 0, :, None] * Jp[:, 0, None, :]
          + Jcw[:, 1, :, None] * Jp[:, 1, None, :])
    return bU, bV, bgc, bgp, bW


def seg_cumsum(vals, starts, ends):
    """Sorted-key segment sum via cumulative-sum differences."""
    flat = vals.reshape(vals.shape[0], -1)
    csum = jnp.cumsum(flat, axis=0)
    top = csum[jnp.maximum(ends - 1, 0)]
    bot = jnp.where((starts > 0)[:, None], csum[jnp.maximum(starts - 1, 0)], 0.0)
    out = jnp.where((ends > starts)[:, None], top - bot, 0.0)
    return out.reshape((starts.shape[0],) + vals.shape[1:])


def make_fn():
    v = args.variant
    if v == "full":
        @jax.jit
        def run(t_shift):
            res = bundle_adjust.__wrapped__(
                kf_R, kf_t + t_shift, pts, obs_kf, obs_pt, obs_uv,
                jnp.ones(O), jnp.ones(O, bool),
                jnp.asarray(p["kf_fixed"]), jnp.ones(nP, bool), K,
                iterations=SCAN)
            s = (res.cost + jnp.sum(res.kf_t) + jnp.sum(res.pts) * 1e-9)
            return t_shift + s * 1e-12
        return run

    if v == "resid":
        @jax.jit
        def run(t_shift):
            def body(c, _):
                r, Jc, Jp, w = residjac(c)
                s = (jnp.sum(r) + jnp.sum(Jc) + jnp.sum(Jp) + jnp.sum(w))
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, t_shift, None, length=SCAN)
            return out
        return run

    if v in ("blocks", "blocks_flag"):
        sorted_kw = (dict(indices_are_sorted=True, unique_indices=False)
                     if v == "blocks_flag" else {})

        @jax.jit
        def run(t_shift):
            def body(c, _):
                r, Jc, Jp, w = residjac(c)
                bU, bV, bgc, bgp, bW = obs_blocks(r, Jc, Jp, w)
                U = jnp.zeros((nK, 6, 6)).at[obs_kf].add(bU)
                g_c = jnp.zeros((nK, 6)).at[obs_kf].add(bgc)
                V = jnp.zeros((nP, 3, 3)).at[obs_pt].add(bV, **sorted_kw)
                g_p = jnp.zeros((nP, 3)).at[obs_pt].add(bgp, **sorted_kw)
                Wb = jnp.zeros((nP, nF + 1, 6, 3)).at[obs_pt, obs_fidx].add(
                    bW, **sorted_kw)[:, :nF]
                s = (jnp.sum(U) + jnp.sum(V) + jnp.sum(g_c) + jnp.sum(g_p)
                     + jnp.sum(Wb))
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, t_shift, None, length=SCAN)
            return out
        return run

    if v == "blocks_sc2":
        # scatter segmentation, broadcast outer products: isolates the
        # outer-product einsum cost inside the scatter formulation
        @jax.jit
        def run(t_shift):
            def body(c, _):
                r, Jc, Jp, w = residjac(c)
                bU, bV, bgc, bgp, bW = obs_blocks_bcast(r, Jc, Jp, w)
                U = jnp.zeros((nK, 6, 6)).at[obs_kf].add(bU)
                g_c = jnp.zeros((nK, 6)).at[obs_kf].add(bgc)
                V = jnp.zeros((nP, 3, 3)).at[obs_pt].add(bV)
                g_p = jnp.zeros((nP, 3)).at[obs_pt].add(bgp)
                Wb = jnp.zeros((nP, nF + 1, 6, 3)).at[obs_pt, obs_fidx].add(
                    bW)[:, :nF]
                s = (jnp.sum(U) + jnp.sum(V) + jnp.sum(g_c) + jnp.sum(g_p)
                     + jnp.sum(Wb))
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, t_shift, None, length=SCAN)
            return out
        return run

    if v in ("useg_only", "vseg_only"):
        # micro-bisect of blocks_uq: camera-axis one-hot matmuls alone
        # vs point-axis unique scatters alone
        onehot = (obs_kf[None, :] == jnp.arange(nK)[:, None]).astype(
            jnp.float32)

        @jax.jit
        def run(t_shift):
            def body(c, _):
                r, Jc, Jp, w = residjac(c)
                bU, bV, bgc, bgp, bW = obs_blocks_bcast(r, Jc, Jp, w)
                if v == "useg_only":
                    U = jnp.einsum("ko,oij->kij", onehot, bU,
                                   precision=_HI)
                    g_c = jnp.einsum("ko,oi->ki", onehot, bgc,
                                     precision=_HI)
                    s = jnp.sum(U) + jnp.sum(g_c) + jnp.sum(bV)
                else:
                    V = jnp.zeros((nP, nK, 3, 3)).at[obs_pt, obs_kf].add(
                        bV, unique_indices=True, mode="drop").sum(1)
                    g_p = jnp.zeros((nP, nK, 3)).at[obs_pt, obs_kf].add(
                        bgp, unique_indices=True, mode="drop").sum(1)
                    Wb = jnp.zeros((nP, nF, 6, 3)).at[
                        obs_pt, obs_fidx].add(
                        bW, unique_indices=True, mode="drop")
                    s = jnp.sum(V) + jnp.sum(g_p) + jnp.sum(Wb) + jnp.sum(bU)
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, t_shift, None, length=SCAN)
            return out
        return run

    if v == "blocks_win2":
        # window formulation v2: the r5 "sorted" library mode measured
        # 92 ms/iter, but that conflated (a) vmap(dynamic_slice)
        # lowering and (b) a bf16 hi/lo coupling split. This isolates
        # the window DESIGN with (a) a MANUALLY constructed lax.gather
        # whose slice_sizes=(M, D) expresses the contiguous per-point
        # window directly, and (b) an exact f32 HIGHEST one-hot matmul
        # for the coupling. obs here are sorted by (pt, fidx) already.
        M_pad = nK
        nO = int(obs_kf.shape[0])
        starts = jnp.asarray(np.asarray(pt_starts))
        ends = jnp.asarray(np.asarray(pt_ends))
        win_valid = (starts[:, None] + jnp.arange(M_pad)[None, :]
                     < ends[:, None])                        # [nP, M]
        gd = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))

        def windows(vals):
            flat = vals.reshape(nO, -1)
            operand = jnp.concatenate(
                [flat, jnp.zeros((M_pad, flat.shape[1]), flat.dtype)], 0)
            out = jax.lax.gather(
                operand, starts[:, None], gd,
                slice_sizes=(M_pad, flat.shape[1]),
                indices_are_sorted=True,
                mode=jax.lax.GatherScatterMode.CLIP)
            return out * win_valid[..., None]                # [nP, M, D]

        fidx_pad_np = np.full((nP, M_pad), nF, np.int32)
        st = np.asarray(pt_starts); en = np.asarray(pt_ends)
        of = np.asarray(obs_fidx)
        for pp in range(nP):
            n = min(en[pp] - st[pp], M_pad)
            fidx_pad_np[pp, :n] = of[st[pp]: st[pp] + n]
        # the dense one-hot ([nP, M, nF] f32 = 268 MB at local64) must
        # be computed ON DEVICE from the 4 MB fidx_pad — baking it as a
        # program constant exceeds the relay's upload limit (HTTP 413)
        fidx_pad_j = jnp.asarray(fidx_pad_np)

        @jax.jit
        def run(t_shift):
            def body(c, _):
                r, Jc, Jp, w = residjac(c)
                bU, bV, bgc, bgp, bW = obs_blocks_bcast(r, Jc, Jp, w)
                V = windows(bV).reshape(nP, M_pad, 3, 3).sum(1)
                g_p = windows(bgp).sum(1)
                bW_pad = windows(bW).reshape(nP, M_pad, 18)
                slot_oh = ((fidx_pad_j[..., None]
                            == jnp.arange(nF)[None, None, :])
                           & win_valid[..., None]).astype(jnp.float32)
                dnn = (((1,), (1,)), ((0,), (0,)))
                Wb = jax.lax.dot_general(
                    slot_oh, bW_pad, dimension_numbers=dnn,
                    preferred_element_type=jnp.float32,
                    precision=_HI).reshape(nP, nF, 6, 3)
                s = (jnp.sum(V) + jnp.sum(g_p) + jnp.sum(Wb)
                     + jnp.sum(bU) + jnp.sum(bgc))
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, t_shift, None, length=SCAN)
            return out
        return run

    if v == "blocks_fac":
        # the SHIPPED block build (segment_mode="factored"): one-hot
        # camera matmuls + Kronecker-factored point sums + the Wb
        # scatter — isolates how the 20 ms/iter full solve decomposes
        from orb_slam_tracking_tpu.optim.ba import (
            make_factored_point_segment_sum,
        )
        onehot = (obs_kf[None, :] == jnp.arange(nK)[:, None]).astype(
            jnp.float32)
        pseg = make_factored_point_segment_sum(obs_pt, nP)

        @jax.jit
        def run(t_shift):
            def body(c, _):
                r, Jc, Jp, w = residjac(c)
                bU, bV, bgc, bgp, bW = obs_blocks_bcast(r, Jc, Jp, w)
                U = jnp.einsum("ko,oij->kij", onehot, bU, precision=_HI)
                g_c = jnp.einsum("ko,oi->ki", onehot, bgc, precision=_HI)
                Vg = pseg(jnp.concatenate([bV.reshape(-1, 9), bgp], 1))
                V = Vg[:, :9].reshape(nP, 3, 3)
                g_p = Vg[:, 9:12]
                Wb = jnp.zeros((nP, nF + 1, 6, 3)).at[
                    obs_pt, obs_fidx].add(bW)[:, :nF]
                s = (jnp.sum(U) + jnp.sum(V) + jnp.sum(g_c) + jnp.sum(g_p)
                     + jnp.sum(Wb))
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, t_shift, None, length=SCAN)
            return out
        return run

    if v == "blocks_cam":
        # CAMERA-major windows. Every prior coupling formulation kept
        # point-major or joint (pt, fidx) addressing: 16k point windows
        # (tile-amplified gathers, 82-92 ms/iter) or [nP x nF] scatters
        # (serialized, ~10 ms/iter inside blocks_fac). Sorting obs by
        # CAMERA instead gives only nK contiguous groups, padded host-
        # side ONCE to a static [nK, Mc] layout (the permutation is
        # fixed for the whole solve, so per-iteration work needs no
        # gather at all — residuals/Jacobians are simply computed in
        # camera order). Then:
        #   U, g_c : plain reshape-reductions over the window axis —
        #            no scatter, no one-hot;
        #   V, g_p,
        #   Wb     : ONE batched per-camera Kronecker-factored point
        #            segment sum (payload D = 9+3+18), exact f32
        #            HIGHEST; V/g_p = sum over the camera batch axis,
        #            Wb's camera placement is read straight off the
        #            batch axis via a tiny [nK, nF] slot matmul.
        # The last scatter in the block build is gone.
        perm_cam = np.argsort(p["obs_kf"], kind="stable")
        okc = p["obs_kf"][perm_cam]
        counts = np.bincount(okc, minlength=nK)
        Mc = int(counts.max())
        widx = np.full((nK, Mc), O, np.int64)  # row O = dump slot
        starts_c = np.concatenate([[0], np.cumsum(counts)[:-1]])
        for kk in range(nK):
            widx[kk, :counts[kk]] = perm_cam[
                starts_c[kk]: starts_c[kk] + counts[kk]]
        opt_w = jnp.asarray(
            np.concatenate([p["obs_pt"], [0]])[widx])          # [nK,Mc]
        ouv_w = jnp.asarray(
            np.concatenate([p["obs_uv"], np.zeros((1, 2))])[widx],
            jnp.float32)                                       # [nK,Mc,2]
        valid_f = jnp.asarray((widx < O).reshape(-1), jnp.float32)
        Of = nK * Mc
        opt_f = opt_w.reshape(Of)
        okf_f = jnp.broadcast_to(
            jnp.arange(nK)[:, None], (nK, Mc)).reshape(Of)
        ouv_f = ouv_w.reshape(Of, 2)
        FB = 128
        nH = -(-nP // FB)
        sel = (fidx[:, None] == jnp.arange(nF)[None, :]).astype(
            jnp.float32)                                       # [nK,nF]

        def build(c):
            # one-hots from the 256 KB opt_w upload, on device (the
            # [nK, Mc, nH/FB] f32 masks are 34 MB each — scan-invariant,
            # XLA hoists them)
            hi_oh = ((opt_w // FB)[..., None]
                     == jnp.arange(nH)[None, None, :]).astype(
                jnp.float32)                                   # [nK,Mc,nH]
            lo_oh = ((opt_w % FB)[..., None]
                     == jnp.arange(FB)[None, None, :]).astype(
                jnp.float32)                                   # [nK,Mc,FB]
            r, Jc, Jp, _ = _obs_residuals(
                kf_R, kf_t + c, pts, okf_f, opt_f, ouv_f,
                K[0, 0], K[1, 1], K[0, 2], K[1, 2])
            chi2 = jnp.sum(r * r, axis=-1)
            w = huber_weight(chi2, CHI2) * valid_f
            bU, bV, bgc, bgp, bW = obs_blocks_bcast(r, Jc, Jp, w)
            U = bU.reshape(nK, Mc, 6, 6).sum(1)
            g_c = bgc.reshape(nK, Mc, 6).sum(1)
            payload = jnp.concatenate(
                [bV.reshape(Of, 9), bgp, bW.reshape(Of, 18)],
                axis=1).reshape(nK, Mc, 30)
            C = lo_oh[..., None] * payload[:, :, None, :]      # [nK,Mc,FB,30]
            S1 = jnp.einsum("kmh,kmld->khld", hi_oh, C,
                            precision=_HI)                     # [nK,nH,FB,30]
            per_cam = S1.reshape(nK, nH * FB, 30)[:, :nP]
            V = per_cam[..., :9].sum(0).reshape(nP, 3, 3)
            g_p = per_cam[..., 9:12].sum(0)
            Wb = jnp.einsum("kpd,kf->pfd", per_cam[..., 12:30],
                            sel, precision=_HI).reshape(nP, nF, 6, 3)
            return U, g_c, V, g_p, Wb

        if args.selfcheck:
            U, g_c, V, g_p, Wb = jax.jit(build)(jnp.zeros(3))
            r, Jc, Jp, w = residjac(jnp.zeros(3))
            bU, bV, bgc, bgp, bW = obs_blocks_bcast(r, Jc, Jp, w)
            U0 = jnp.zeros((nK, 6, 6)).at[obs_kf].add(bU)
            gc0 = jnp.zeros((nK, 6)).at[obs_kf].add(bgc)
            V0 = jnp.zeros((nP, 3, 3)).at[obs_pt].add(bV)
            gp0 = jnp.zeros((nP, 3)).at[obs_pt].add(bgp)
            Wb0 = jnp.zeros((nP, nF + 1, 6, 3)).at[
                obs_pt, obs_fidx].add(bW)[:, :nF]
            for name, a, b in (("U", U, U0), ("g_c", g_c, gc0),
                               ("V", V, V0), ("g_p", g_p, gp0),
                               ("Wb", Wb, Wb0)):
                d = float(jnp.max(jnp.abs(a - b)))
                rel = d / (float(jnp.max(jnp.abs(b))) + 1e-30)
                print(f"selfcheck {name}: max abs diff {d:.3e} "
                      f"(rel {rel:.3e})")
            sys.exit(0)

        @jax.jit
        def run(t_shift):
            def body(c, _):
                U, g_c, V, g_p, Wb = build(c)
                s = (jnp.sum(U) + jnp.sum(V) + jnp.sum(g_c)
                     + jnp.sum(g_p) + jnp.sum(Wb))
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, t_shift, None, length=SCAN)
            return out
        return run

    if v == "blocks_uq":
        # UNIQUE-index scatters: (pt, kf) is unique per observation, so
        # V/g_p/Wb can scatter into a dense [nP, cam] layout with
        # unique_indices=True (no collisions -> XLA can vectorize) and
        # then reduce the small camera axis densely. U/g_c use the
        # one-hot matmul (camera-axis targets are tiny). Wb scatters by
        # (pt, fidx) straight into the [nP, nF] window — dump-slot
        # (fixed-cam) updates land out of bounds and are dropped, and
        # the kept indices are unique because (pt, kf) is.
        onehot = (obs_kf[None, :] == jnp.arange(nK)[:, None]).astype(
            jnp.float32)

        @jax.jit
        def run(t_shift):
            def body(c, _):
                r, Jc, Jp, w = residjac(c)
                bU, bV, bgc, bgp, bW = obs_blocks_bcast(r, Jc, Jp, w)
                U = jnp.einsum("ko,oij->kij", onehot, bU, precision=_HI)
                g_c = jnp.einsum("ko,oi->ki", onehot, bgc, precision=_HI)
                V = jnp.zeros((nP, nK, 3, 3)).at[obs_pt, obs_kf].add(
                    bV, unique_indices=True, mode="drop").sum(1)
                g_p = jnp.zeros((nP, nK, 3)).at[obs_pt, obs_kf].add(
                    bgp, unique_indices=True, mode="drop").sum(1)
                Wb = jnp.zeros((nP, nF, 6, 3)).at[obs_pt, obs_fidx].add(
                    bW, unique_indices=True, mode="drop")
                s = (jnp.sum(U) + jnp.sum(V) + jnp.sum(g_c) + jnp.sum(g_p)
                     + jnp.sum(Wb))
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, t_shift, None, length=SCAN)
            return out
        return run

    if v in ("blocks_mm", "blocks_mm2"):
        outer = obs_blocks if v == "blocks_mm" else obs_blocks_bcast
        onehot = (obs_kf[None, :] == jnp.arange(nK)[:, None]).astype(
            jnp.float32)  # [nK, O]

        @jax.jit
        def run(t_shift):
            def body(c, _):
                r, Jc, Jp, w = residjac(c)
                bU, bV, bgc, bgp, bW = outer(r, Jc, Jp, w)
                U = jnp.einsum("ko,oij->kij", onehot, bU,
                               precision=_HI)
                g_c = jnp.einsum("ko,oi->ki", onehot, bgc, precision=_HI)
                V = seg_cumsum(bV, pt_starts, pt_ends)
                g_p = seg_cumsum(bgp, pt_starts, pt_ends)
                Wb = seg_cumsum(bW, cell_starts, cell_ends).reshape(
                    nP, nF + 1, 6, 3)[:, :nF]
                s = (jnp.sum(U) + jnp.sum(V) + jnp.sum(g_c) + jnp.sum(g_p)
                     + jnp.sum(Wb))
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, t_shift, None, length=SCAN)
            return out
        return run

    if v == "schur2":
        # schur with the tiny-contraction einsums (Y: contraction dim 3;
        # backsub) as unrolled broadcast multiply-adds, isolating whether
        # the batched-tiny-matmul lowering is the cost; the big S
        # contraction (over P*3) stays a real MXU matmul
        r, Jc, Jp, w = residjac(jnp.zeros(3))
        bU, bV, bgc, bgp, bW = obs_blocks_bcast(r, Jc, Jp, w)
        U0 = jnp.zeros((nK, 6, 6)).at[obs_kf].add(bU)
        gc0 = jnp.zeros((nK, 6)).at[obs_kf].add(bgc)
        V0 = jnp.zeros((nP, 3, 3)).at[obs_pt].add(bV)
        gp0 = jnp.zeros((nP, 3)).at[obs_pt].add(bgp)
        Wb0 = jnp.zeros((nP, nF + 1, 6, 3)).at[obs_pt, obs_fidx].add(
            bW)[:, :nF]
        lam = jnp.float32(1e-4)

        @jax.jit
        def run(t_shift):
            def body(c, _):
                Wb = Wb0 * (1.0 + c * 1e-12)
                eyeK, eyeP = jnp.eye(6), jnp.eye(3)
                Ud = U0 + lam * eyeK * jnp.diagonal(
                    U0, axis1=-2, axis2=-1)[:, None, :]
                Vd = V0 + lam * eyeP * jnp.diagonal(
                    V0, axis1=-2, axis2=-1)[:, None, :]
                Vinv = inv3x3(Vd)
                Ud_free = jnp.zeros((nF + 1, 6, 6)).at[fidx].add(Ud)[:nF]
                gc_free = jnp.zeros((nF + 1, 6)).at[fidx].add(gc0)[:nF]
                Y = (Wb[..., 0:1] * Vinv[:, None, None, 0, :]
                     + Wb[..., 1:2] * Vinv[:, None, None, 1, :]
                     + Wb[..., 2:3] * Vinv[:, None, None, 2, :])
                S = jnp.zeros((nF, 6, nF, 6)).at[
                    jnp.arange(nF), :, jnp.arange(nF), :].add(Ud_free)
                S = S - jnp.einsum("pkil,pmjl->kimj", Y, Wb, precision=_HI)
                rhs = -gc_free + jnp.einsum("pkil,pl->ki", Y, gp0,
                                            precision=_HI)
                Sm = S.reshape(nF * 6, nF * 6) + 1e-8 * jnp.eye(nF * 6)
                dxc = jax.scipy.linalg.cho_solve(
                    jax.scipy.linalg.cho_factor(Sm), rhs.reshape(-1)
                ).reshape(nF, 6)
                Wdx = jnp.einsum("pkil,ki->pl", Wb, dxc, precision=_HI)
                gsum = gp0 + Wdx
                dxp = -(Vinv[:, :, 0] * gsum[:, 0:1]
                        + Vinv[:, :, 1] * gsum[:, 1:2]
                        + Vinv[:, :, 2] * gsum[:, 2:3])
                s = jnp.sum(dxc) + jnp.sum(dxp)
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, jnp.float32(t_shift[0]), None,
                                  length=SCAN)
            return jnp.full(3, out * 1e-15)
        return run

    if v == "schur":
        # fixed materialized blocks; chain perturbs Wb
        r, Jc, Jp, w = residjac(jnp.zeros(3))
        bU, bV, bgc, bgp, bW = obs_blocks(r, Jc, Jp, w)
        U0 = jnp.zeros((nK, 6, 6)).at[obs_kf].add(bU)
        gc0 = jnp.zeros((nK, 6)).at[obs_kf].add(bgc)
        V0 = jnp.zeros((nP, 3, 3)).at[obs_pt].add(bV)
        gp0 = jnp.zeros((nP, 3)).at[obs_pt].add(bgp)
        Wb0 = jnp.zeros((nP, nF + 1, 6, 3)).at[obs_pt, obs_fidx].add(
            bW)[:, :nF]
        lam = jnp.float32(1e-4)

        @jax.jit
        def run(t_shift):
            def body(c, _):
                Wb = Wb0 * (1.0 + c * 1e-12)
                eyeK, eyeP = jnp.eye(6), jnp.eye(3)
                Ud = U0 + lam * eyeK * jnp.diagonal(
                    U0, axis1=-2, axis2=-1)[:, None, :]
                Vd = V0 + lam * eyeP * jnp.diagonal(
                    V0, axis1=-2, axis2=-1)[:, None, :]
                Vinv = inv3x3(Vd)
                Ud_free = jnp.zeros((nF + 1, 6, 6)).at[fidx].add(Ud)[:nF]
                gc_free = jnp.zeros((nF + 1, 6)).at[fidx].add(gc0)[:nF]
                Y = jnp.einsum("pkil,plm->pkim", Wb, Vinv, precision=_HI)
                S = jnp.zeros((nF, 6, nF, 6)).at[
                    jnp.arange(nF), :, jnp.arange(nF), :].add(Ud_free)
                S = S - jnp.einsum("pkil,pmjl->kimj", Y, Wb, precision=_HI)
                rhs = -gc_free + jnp.einsum("pkil,pl->ki", Y, gp0,
                                            precision=_HI)
                Sm = S.reshape(nF * 6, nF * 6) + 1e-8 * jnp.eye(nF * 6)
                dxc = jax.scipy.linalg.cho_solve(
                    jax.scipy.linalg.cho_factor(Sm), rhs.reshape(-1)
                ).reshape(nF, 6)
                dxp = jnp.einsum(
                    "pij,pj->pi", Vinv,
                    -(gp0 + jnp.einsum("pkil,ki->pl", Wb, dxc,
                                       precision=_HI)), precision=_HI)
                s = jnp.sum(dxc) + jnp.sum(dxp)
                return c + s * 1e-12, None
            out, _ = jax.lax.scan(body, jnp.float32(t_shift[0]), None,
                                  length=SCAN)
            return jnp.full(3, out * 1e-15)
        return run


def main():
    fn = make_fn()
    arg = jnp.zeros(3)
    y = fn(arg)
    _ = float(np.asarray(y).ravel()[0])  # compile + lazy relay init
    for _ in range(2):
        y = fn(y)
    _ = float(np.asarray(y).ravel()[0])
    t0 = time.time()
    x = fn(arg)
    for _ in range(2):
        x = fn(x)
    _ = float(np.asarray(x).ravel()[0])
    ta = time.time() - t0
    t0 = time.time()
    x = fn(arg)
    for _ in range(8):
        x = fn(x)
    _ = float(np.asarray(x).ravel()[0])
    tb = time.time() - t0
    per_iter_ms = (tb - ta) / ((9 - 3) * SCAN) * 1e3
    rec = {"variant": args.variant, "shape": args.shape,
           "ms_per_iter": round(per_iter_ms, 3),
           "ms_per_10iter": round(per_iter_ms * 10, 2)}
    print(json.dumps(rec), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rec, f)


if __name__ == "__main__":
    main()
