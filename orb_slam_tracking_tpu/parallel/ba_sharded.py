"""Distributed bundle adjustment: Schur reduction over point-sharded
observation blocks with XLA collectives.

This is the SLAM analog of sequence-parallel training (SURVEY.md §5.7):
the factor graph's landmark axis is the "long" axis, so map points and
their observations are sharded across devices. Per LM iteration each
device builds its local camera/point blocks, reduces its Schur
contribution ``S_local = sum_p W_p V_p^-1 W_p^T`` (a sum over local
points), and a single ``psum`` over the mesh combines:

- the reduced camera system ``S`` ([6K, 6K] — small, rides ICI),
- the camera gradient and RHS.

The camera solve is replicated (cheap); point back-substitution stays
local to each shard — no all-gather of structure is ever needed. This
mirrors the math of the reference's vendored g2o Schur block solver
(``Thirdparty/g2o/g2o/core/block_solver.h:126-182``) with the per-point
loop turned into a device-parallel reduction.

Inputs must be pre-bucketed so each observation lives on the shard of its
point (``bucket_observations`` does this host-side); the camera arrays are
replicated.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import se3
from ..optim.ba import (cammajor_block_build, factored_V_gp, inv3x3,
                        make_cammajor_pack,
                        make_factored_point_segment_sum)
from ..optim.lm import huber_weight, nielsen_update

__all__ = ["make_ba_mesh", "bucket_observations", "bundle_adjust_sharded"]

_CHI2_MONO = 5.991


def make_ba_mesh(devices=None, axis: str = "points") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def bucket_observations(obs_kf, obs_pt, obs_uv, obs_inv_sigma2, obs_valid,
                        n_points: int, n_devices: int, obs_per_shard: int):
    """Host-side: partition points into contiguous shards and bucket each
    observation onto its point's shard, padding every shard to a fixed
    capacity. Returns arrays of shape [D * obs_per_shard, ...] with
    point indices rebased to shard-local coordinates.
    """
    assert n_points % n_devices == 0, "point capacity must divide the mesh"
    per = n_points // n_devices
    okf = np.asarray(obs_kf)
    opt = np.asarray(obs_pt)
    ouv = np.asarray(obs_uv)
    ow = np.asarray(obs_inv_sigma2)
    ov = np.asarray(obs_valid)
    out_kf = np.zeros((n_devices, obs_per_shard), np.int32)
    out_pt = np.zeros((n_devices, obs_per_shard), np.int32)
    out_uv = np.zeros((n_devices, obs_per_shard, 2), np.float32)
    out_w = np.ones((n_devices, obs_per_shard), np.float32)
    out_v = np.zeros((n_devices, obs_per_shard), bool)
    for d in range(n_devices):
        sel = ov & (opt >= d * per) & (opt < (d + 1) * per)
        idx = np.where(sel)[0][:obs_per_shard]
        n = len(idx)
        out_kf[d, :n] = okf[idx]
        out_pt[d, :n] = opt[idx] - d * per  # shard-local point index
        out_uv[d, :n] = ouv[idx]
        out_w[d, :n] = ow[idx]
        out_v[d, :n] = True
    flat = lambda a: a.reshape((n_devices * obs_per_shard,) + a.shape[2:])
    return flat(out_kf), flat(out_pt), flat(out_uv), flat(out_w), flat(out_v)


def _residuals(kf_R, kf_t, pts, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy):
    Ro = kf_R[obs_kf]
    to = kf_t[obs_kf]
    Xo = pts[obs_pt]
    pc = jnp.einsum("oij,oj->oi", Ro, Xo) + to
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * x * zi + cx
    v = fy * y * zi + cy
    r = jnp.stack([u, v], axis=-1) - obs_uv
    zero = jnp.zeros_like(x)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * zi, zero, -fx * x * zi * zi], axis=-1),
            jnp.stack([zero, fy * zi, -fy * y * zi * zi], axis=-1),
        ],
        axis=-2,
    )
    J_pc = jnp.concatenate(
        [-se3.hat(pc), jnp.broadcast_to(jnp.eye(3), pc.shape[:-1] + (3, 3))],
        axis=-1,
    )
    Jc = J_proj @ J_pc
    Jp = J_proj @ Ro
    return r, Jc, Jp


def bundle_adjust_sharded(
    mesh: Mesh,
    kf_R: jnp.ndarray,
    kf_t: jnp.ndarray,
    pts: jnp.ndarray,          # [P] sharded over the mesh point axis
    obs_kf: jnp.ndarray,       # [D * obs_per_shard] bucketed (see above)
    obs_pt: jnp.ndarray,       # shard-local point indices
    obs_uv: jnp.ndarray,
    obs_inv_sigma2: jnp.ndarray,
    obs_valid: jnp.ndarray,
    kf_fixed: jnp.ndarray,
    pt_valid: jnp.ndarray,
    K: jnp.ndarray,
    iterations: int = 10,
    max_free_cams: int | None = None,
    segment_mode: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Distributed LM BA. Returns (kf_R, kf_t, pts, final_cost).

    ``pts``/``pt_valid`` are sharded on the point axis; camera arrays are
    replicated; observation arrays are sharded to follow their points.

    ``max_free_cams`` bounds the Schur coupling (and the psum'd S) to the
    free-camera window, exactly as in ``optim.ba.bundle_adjust`` — the
    collectives shrink with it too.

    ``segment_mode``: "auto" resolves per backend like
    ``optim.ba.bundle_adjust`` — "cammajor" (per-shard camera-major
    padded layout, zero scatters in the block build: obs are already
    shard-local, so the pack is built inside each shard with no
    collectives) on TPU, "scatter" elsewhere; "factored" (Kronecker
    point one-hot + Wb scatter) kept for study. Collectives are
    identical in every mode.
    """
    axis = mesh.axis_names[0]
    if segment_mode == "auto":
        segment_mode = ("cammajor" if jax.default_backend() == "tpu"
                        else "scatter")
    nK = kf_R.shape[0]
    nF = nK if max_free_cams is None else min(max_free_cams, nK)

    # NOTE: everything array-valued must enter shard_fn as an ARGUMENT —
    # a closure-captured global jax.Array carries its (Auto-mesh) sharding
    # into the Manual shard_map context and fails to canonicalize in the
    # multi-process path.
    def shard_fn(kf_R, kf_t, pts, obs_kf, obs_pt, obs_uv, w_info0, obs_valid,
                 pt_valid, kf_fixed, K):
        nP_local = pts.shape[0]
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        free_cam = jnp.logical_not(kf_fixed)
        w_info = jnp.where(obs_valid, w_info0, 0.0)
        # compact free-camera index (replicated): fixed cams -> dump slot
        free_rank = jnp.cumsum(free_cam.astype(jnp.int32)) - 1
        fidx = jnp.where(free_cam, jnp.minimum(free_rank, nF - 1), nF)
        obs_fidx = fidx[obs_kf]
        n_free = jnp.sum(free_cam.astype(jnp.int32))
        if segment_mode == "cammajor":
            # per-shard camera-major pack (obs are shard-local; the
            # layout build is pure local array code — no collectives).
            # The padded arrays replace the originals for the whole
            # solve; padding carries w = 0 and is exact in every block
            # and in the psum'd robust cost.
            _cm = make_cammajor_pack(obs_kf, obs_pt, obs_uv, w_info,
                                     obs_valid, nK, nP_local, fidx, nF)
            obs_kf, obs_pt, obs_uv = _cm.obs_kf, _cm.obs_pt, _cm.obs_uv
            w_info, obs_valid = _cm.w_info, _cm.obs_valid
        if segment_mode == "factored":
            cam_onehot = (obs_kf[None, :] == jnp.arange(nK)[:, None]
                          ).astype(jnp.float32)               # [nK, O]
            _point_segment_sum = make_factored_point_segment_sum(
                obs_pt, nP_local)

        def robust_cost(R, t, X):
            r, _, _ = _residuals(R, t, X, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy)
            chi2 = jnp.sum(r * r, axis=-1) * w_info
            rho = jnp.where(
                chi2 <= _CHI2_MONO, chi2,
                2.0 * jnp.sqrt(_CHI2_MONO * chi2) - _CHI2_MONO,
            )
            return jax.lax.psum(jnp.sum(rho), axis)

        def step(carry, _):
            R, t, X, lam, nu, cost = carry
            r, Jc, Jp = _residuals(R, t, X, obs_kf, obs_pt, obs_uv, fx, fy, cx, cy)
            chi2 = jnp.sum(r * r, axis=-1) * w_info
            w = huber_weight(chi2, _CHI2_MONO) * w_info

            # per-obs outer products as broadcast multiply-adds (exact;
            # the einsum forms are batched 6x2 @ 2x6 matmuls whose tiny
            # tiles lower pathologically — optim/ba.py, measured r5).
            Jcw = Jc * w[:, None, None]
            Jpw = Jp * w[:, None, None]
            bU = (Jcw[:, 0, :, None] * Jc[:, 0, None, :]
                  + Jcw[:, 1, :, None] * Jc[:, 1, None, :])
            bV = (Jpw[:, 0, :, None] * Jp[:, 0, None, :]
                  + Jpw[:, 1, :, None] * Jp[:, 1, None, :])
            bgc = Jcw[:, 0] * r[:, 0, None] + Jcw[:, 1] * r[:, 1, None]
            bgp = Jpw[:, 0] * r[:, 0, None] + Jpw[:, 1] * r[:, 1, None]
            bW = (Jcw[:, 0, :, None] * Jp[:, 0, None, :]
                  + Jcw[:, 1, :, None] * Jp[:, 1, None, :])
            if segment_mode == "cammajor":
                U_local, g_c_local, V, g_p, Wb = cammajor_block_build(
                    _cm, nP_local, nF, bU, bV, bgc, bgp, bW)
            elif segment_mode == "factored":
                U_local = jnp.einsum("ko,oij->kij", cam_onehot, bU,
                                     precision=jax.lax.Precision.HIGHEST)
                g_c_local = jnp.einsum("ko,oi->ki", cam_onehot, bgc,
                                       precision=jax.lax.Precision.HIGHEST)
                V, g_p = factored_V_gp(_point_segment_sum, bV, bgp)
                Wb = jnp.zeros((nP_local, nF + 1, 6, 3)).at[
                    obs_pt, obs_fidx].add(bW)[:, :nF]
            else:
                V = jnp.zeros((nP_local, 3, 3)).at[obs_pt].add(bV)
                g_p = jnp.zeros((nP_local, 3)).at[obs_pt].add(bgp)
                U_local = jnp.zeros((nK, 6, 6)).at[obs_kf].add(bU)
                g_c_local = jnp.zeros((nK, 6)).at[obs_kf].add(bgc)
                Wb = jnp.zeros((nP_local, nF + 1, 6, 3)).at[
                    obs_pt, obs_fidx].add(bW)[:, :nF]

            eyeP = jnp.eye(3)
            Vd = V + lam * eyeP * jnp.diagonal(V, axis1=-2, axis2=-1)[:, None, :]
            Vd = jnp.where(pt_valid[:, None, None], Vd, jnp.eye(3))
            Vinv = inv3x3(Vd)
            Y = (Wb[..., 0:1] * Vinv[:, None, None, 0, :]
                 + Wb[..., 1:2] * Vinv[:, None, None, 1, :]
                 + Wb[..., 2:3] * Vinv[:, None, None, 2, :])
            S_local = -jnp.einsum("pkil,pmjl->kimj", Y, Wb)
            rhs_local = jnp.einsum("pkil,pl->ki", Y, g_p)

            # the only collectives: tiny camera-sized reductions over ICI
            U = jax.lax.psum(U_local, axis)
            g_c = jax.lax.psum(g_c_local, axis)
            S = jax.lax.psum(S_local, axis)
            rhs = jax.lax.psum(rhs_local, axis)

            eyeK = jnp.eye(6)
            Ud = U + lam * eyeK * jnp.diagonal(U, axis1=-2, axis2=-1)[:, None, :]
            Ud_free = jnp.zeros((nF + 1, 6, 6)).at[fidx].add(Ud)[:nF]
            g_c_free = jnp.zeros((nF + 1, 6)).at[fidx].add(
                jnp.where(free_cam[:, None], g_c, 0.0)
            )[:nF]
            S = S.at[jnp.arange(nF), :, jnp.arange(nF), :].add(Ud_free)
            rhs = rhs - g_c_free
            occupied = jnp.arange(nF) < n_free
            omask = occupied.astype(S.dtype)
            S = S * omask[:, None, None, None] * omask[None, None, :, None]
            S = S.at[jnp.arange(nF), :, jnp.arange(nF), :].add(
                jnp.where(~occupied[:, None, None], jnp.eye(6), 0.0)
            )
            rhs = rhs * omask[:, None]
            Sm = S.reshape(nF * 6, nF * 6) + 1e-8 * jnp.eye(nF * 6)
            dxc_free = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(Sm), rhs.reshape(-1)
            ).reshape(nF, 6)
            dxc = jnp.where(
                free_cam[:, None],
                dxc_free[jnp.clip(free_rank, 0, nF - 1)],
                0.0,
            )
            # local point back-substitution
            gsum = g_p + jnp.einsum("pkil,ki->pl", Wb, dxc_free)
            dxp = -(Vinv[:, :, 0] * gsum[:, 0:1]
                    + Vinv[:, :, 1] * gsum[:, 1:2]
                    + Vinv[:, :, 2] * gsum[:, 2:3])
            dxp = jnp.where(pt_valid[:, None], dxp, 0.0)

            dR, dt = se3.se3_exp(dxc)
            R_new = dR @ R
            t_new = jnp.einsum("kij,kj->ki", dR, t) + dt
            X_new = X + dxp
            new_cost = robust_cost(R_new, t_new, X_new)
            predc = 0.5 * jnp.sum(
                dxc * (lam * jnp.diagonal(U, axis1=-2, axis2=-1) * dxc - g_c)
            )
            predp = jax.lax.psum(
                0.5 * jnp.sum(
                    dxp * (lam * jnp.diagonal(V, axis1=-2, axis2=-1) * dxp - g_p)
                ),
                axis,
            )
            rho = (cost - new_cost) / jnp.maximum(jnp.abs(predc + predp), 1e-9)
            lam_new, nu_new = nielsen_update(lam, nu, rho)
            good = new_cost < cost
            R = jnp.where(good, R_new, R)
            t = jnp.where(good, t_new, t)
            X = jnp.where(good, X_new, X)
            cost = jnp.where(good, new_cost, cost)
            return (R, t, X, lam_new, nu_new, cost), None

        cost0 = robust_cost(kf_R, kf_t, pts)
        (R, t, X, _, _, cost), _ = jax.lax.scan(
            step,
            (kf_R, kf_t, pts, jnp.float32(1e-4), jnp.float32(2.0), cost0),
            None,
            length=iterations,
        )
        return R, t, X, cost

    pspec = P(axis)
    rep = P()
    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(rep, rep, pspec, pspec, pspec, pspec, pspec, pspec, pspec,
                      rep, rep),
            out_specs=(rep, rep, pspec, rep),
            check_vma=False,
        )
    )
    return fn(kf_R, kf_t, pts, obs_kf, obs_pt, obs_uv, obs_inv_sigma2,
              obs_valid, pt_valid, kf_fixed, K)
