"""Device-side local mapping: the WHOLE keyframe slice on chip.

The host ``Tracker`` completes the reference's declared tracking loop
with host orchestration: per keyframe it round-trips the device for
snapshot writes, observation appends, covisibility triangulation,
fusion, culling and local BA. That is correct, but through a
high-latency device link the dispatches dominate, and it caps the
design at "device kernels, host brain".

This module moves the brain on chip: every local-mapping stage is a
pure function of the fixed-capacity ``SlamMap`` pytree —

  allocate-or-evict keyframe slot    (redundancy eviction on device)
  pose + keypoint snapshot write
  tracked-point observation append   (mask compaction, dropped padding)
  covisibility neighbor selection    (association matmul + top-k)
  epipolar triangulation + vetting   (the batched covis program)
  create-time fusion                 (projection + Hamming duplicate check)
  point / keyframe culling           (full-array lifecycle masks)
  local bundle adjustment            (windowed Schur LM)
  viewing-statistics refresh

— so ``make_device_sequence_loop`` can run tracking INCLUDING keyframe
work as ONE jitted ``lax.scan`` over the frame axis: the keyframe
branch is a ``lax.cond`` (paid only on keyframe frames on TPU), and the
whole sequence costs one device dispatch. This is the honest
"sequence frames/s with keyframes included" benchmark program, and the
building block for multi-sequence DP where every sequence carries its
own growing map (completing what the reference's unbuilt Tracking +
vendored g2o/DBoW2 stack declare: ``tracking.cpp:33-76`` +
full-ORB-SLAM LocalMapping semantics).

Loop closing stays host-side (`slam/loop_closing.py`): it is rare,
graph-irregular, and host orchestration costs nothing at its frequency.

Differences from the host tracker (documented, deliberate):
- a frame that fails the inlier gate triggers the LOST-recovery tier
  IN the scan: a wide-radius (``projection_radius *
  lost_recovery_radius_scale``) re-match of the same frame's keypoints
  from the last good pose plus a widened-basin pose LM, under a
  ``lax.cond`` so it is paid only on failed frames — the device twin of
  the host's windowed re-acquisition (the BoW relocalization candidate
  stage stays host-side),
- neighbor-sequential fusion semantics are preserved exactly (a static
  unrolled loop over the ``covis_keyframes`` axis).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# float32 matmul precision on TPU (the default truncates to bfloat16
# - see optim/ba.py:_obs_residuals).
_HI = jax.lax.Precision.HIGHEST

from ..config import CameraConfig, MatcherConfig, OrbConfig, TrackerConfig
from ..ops.hamming import hamming_matrix
from .fused_step import make_tracking_step
from .map import SlamMap, apply_ba_result, update_normal_and_depth

__all__ = ["make_device_insert_keyframe", "make_device_sequence_loop",
           "DeviceLoopOutputs"]


def _compact(mask: jnp.ndarray, cap: int):
    """First ``cap`` set lanes of ``mask [N]`` -> (indices [cap] with N
    as the out-of-bounds padding value, ok [cap])."""
    n = mask.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask & (rank < cap), rank, cap)
    lanes = jnp.full((cap,), n, jnp.int32).at[tgt].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    ok = jnp.arange(cap) < jnp.minimum(
        jnp.sum(mask.astype(jnp.int32)), cap)
    return lanes, ok


def _scatter_obs_rows(m: SlamMap, slot, rows, tgt, kp, uv, inv_s2, ok,
                      add_stats):
    """Pure observation-append (same semantics as tracker._scatter_obs)."""
    O = m.obs_kf.shape[0]
    P = m.pts.shape[0]
    N = m.kf_kp_pt.shape[1]
    r = jnp.where(ok, rows, O)
    t_ = jnp.where(ok, tgt, P)
    k_ = jnp.where(ok, kp, N)
    okf = ok.astype(m.n_obs.dtype)
    drop = dict(mode="drop")
    return m._replace(
        obs_kf=m.obs_kf.at[r].set(slot, **drop),
        obs_pt=m.obs_pt.at[r].set(tgt.astype(m.obs_pt.dtype), **drop),
        obs_kp=m.obs_kp.at[r].set(kp.astype(m.obs_kp.dtype), **drop),
        obs_uv=m.obs_uv.at[r].set(uv, **drop),
        obs_inv_sigma2=m.obs_inv_sigma2.at[r].set(inv_s2, **drop),
        obs_valid=m.obs_valid.at[r].set(True, **drop),
        n_obs=m.n_obs.at[t_].add(okf, **drop),
        kf_kp_pt=m.kf_kp_pt.at[slot, k_].set(tgt.astype(jnp.int32), **drop),
        pt_found=m.pt_found.at[t_].add(okf * add_stats, **drop),
        pt_visible=m.pt_visible.at[t_].add(okf * add_stats, **drop),
    )


def _scatter_new_rows(m: SlamMap, slot, nb, pslots, rows1, rows2, kp1, kp2,
                      pts, uv1, uv2, inv1, inv2, birth, ok):
    """Pure new-point creation (same semantics as
    tracker._scatter_new_points)."""
    O = m.obs_kf.shape[0]
    P = m.pts.shape[0]
    N = m.kf_kp_pt.shape[1]
    s_ = jnp.where(ok, pslots, P)
    r1 = jnp.where(ok, rows1, O)
    r2 = jnp.where(ok, rows2, O)
    k1 = jnp.where(ok, kp1, N)
    k2 = jnp.where(ok, kp2, N)
    desc = m.kf_kp_desc[slot][jnp.clip(kp2, 0, N - 1)]
    pv = pslots.astype(m.obs_pt.dtype)
    drop = dict(mode="drop")
    one = jnp.ones_like(pslots, m.n_obs.dtype)
    return m._replace(
        pts=m.pts.at[s_].set(pts, **drop),
        desc=m.desc.at[s_].set(desc, **drop),
        pt_valid=m.pt_valid.at[s_].set(True, **drop),
        n_obs=m.n_obs.at[s_].set(2 * one, **drop),
        pt_birth_kf=m.pt_birth_kf.at[s_].set(
            birth.astype(m.pt_birth_kf.dtype), **drop),
        pt_visible=m.pt_visible.at[s_].set(one, **drop),
        pt_found=m.pt_found.at[s_].set(one, **drop),
        obs_kf=m.obs_kf.at[r1].set(nb, **drop).at[r2].set(slot, **drop),
        obs_pt=m.obs_pt.at[r1].set(pv, **drop).at[r2].set(pv, **drop),
        obs_kp=m.obs_kp.at[r1].set(kp1.astype(m.obs_kp.dtype), **drop)
                        .at[r2].set(kp2.astype(m.obs_kp.dtype), **drop),
        obs_uv=m.obs_uv.at[r1].set(uv1, **drop).at[r2].set(uv2, **drop),
        obs_inv_sigma2=m.obs_inv_sigma2.at[r1].set(inv1, **drop)
                                       .at[r2].set(inv2, **drop),
        obs_valid=m.obs_valid.at[r1].set(True, **drop)
                             .at[r2].set(True, **drop),
        kf_kp_pt=m.kf_kp_pt
            .at[nb, k1].set(pslots.astype(jnp.int32), **drop)
            .at[slot, k2].set(pslots.astype(jnp.int32), **drop),
    )


def _remove_kf(m: SlamMap, slot) -> SlamMap:
    hit = m.obs_valid & (m.obs_kf == slot)
    dec = jnp.zeros_like(m.n_obs).at[m.obs_pt].add(hit.astype(m.n_obs.dtype))
    return m._replace(
        obs_valid=m.obs_valid & ~hit,
        n_obs=m.n_obs - dec,
        kf_valid=m.kf_valid.at[slot].set(False),
        kf_kp_pt=m.kf_kp_pt.at[slot].set(-1),
        kf_kp_valid=m.kf_kp_valid.at[slot].set(False),
    )


def _kf_redundancy(m: SlamMap) -> jnp.ndarray:
    """Fraction of each keyframe's observed points seen by >= 4 keyframes
    (tracker._kf_redundancy, device form)."""
    Kc = m.kf_capacity
    w = m.obs_valid.astype(jnp.float32)
    red = (m.obs_valid & (m.n_obs[m.obs_pt] >= 4)).astype(jnp.float32)
    tot = jnp.zeros(Kc).at[m.obs_kf].add(w)
    hit = jnp.zeros(Kc).at[m.obs_kf].add(red)
    return hit / jnp.maximum(tot, 1.0)


def _protected_mask(m: SlamMap) -> jnp.ndarray:
    """Oldest (gauge anchor) + two most recent keyframes (tracker
    _protected_kfs, device form)."""
    big = jnp.int32(1 << 30)
    fids = jnp.where(m.kf_valid, m.kf_frame_id, -1)
    _, recent = jax.lax.top_k(fids, 2)
    oldest = jnp.argmin(jnp.where(m.kf_valid, m.kf_frame_id, big))
    prot = jnp.zeros(m.kf_capacity, bool).at[recent].set(
        jnp.take(fids, recent) >= 0)
    return prot.at[oldest].set(True)


def _cull_points(m: SlamMap, kf_count, tcfg: TrackerConfig) -> SlamMap:
    age = kf_count - m.pt_birth_kf
    bad = m.pt_valid & (
        ((age >= tcfg.cull_age_kfs) & (m.n_obs < tcfg.cull_min_obs))
        | ((m.pt_visible >= tcfg.cull_min_visible)
           & (m.pt_found.astype(jnp.float32)
              < tcfg.cull_found_ratio * m.pt_visible.astype(jnp.float32)))
    )
    obs_bad = bad[m.obs_pt]
    snap_bad = bad[jnp.clip(m.kf_kp_pt, 0)] & (m.kf_kp_pt >= 0)
    return m._replace(
        pt_valid=m.pt_valid & ~bad,
        obs_valid=m.obs_valid & ~obs_bad,
        kf_kp_pt=jnp.where(snap_bad, -1, m.kf_kp_pt),
    )


def _cull_keyframes(m: SlamMap, tcfg: TrackerConfig) -> SlamMap:
    counts = jnp.zeros(m.kf_capacity).at[m.obs_kf].add(
        m.obs_valid.astype(jnp.float32))
    red = _kf_redundancy(m)
    cand = (m.kf_valid & ~_protected_mask(m) & (counts >= 10)
            & (red >= tcfg.kf_redundancy_frac))
    victim = jnp.argmax(jnp.where(cand, red, -jnp.inf))
    return jax.lax.cond(jnp.any(cand),
                        lambda mm: _remove_kf(mm, victim),
                        lambda mm: mm, m)


def make_device_insert_keyframe(cam_cfg: CameraConfig, orb_cfg: OrbConfig,
                                matcher_cfg: MatcherConfig,
                                tcfg: TrackerConfig,
                                tri_cap: int = 256, obs_cap: int = 512):
    """Build the pure keyframe-insert function.

    Returned signature:
      insert(m, R, t, K, frame_id, kf_count, kp_desc [N,8], kp_oct [N],
             kp_ang [N], kp_valid [N], xy_un [N,2], kp_for_point [P],
             inlier [P])
      -> (m', n_tracked_obs + n_new  [] int32)
    """
    from ..geometry.fundamental import fundamental_from_poses
    from ..geometry.triangulate import triangulate_dlt
    from ..ops.matcher import search_for_triangulation
    from ..optim.ba import bundle_adjust

    NB = tcfg.covis_keyframes
    scale = orb_cfg.scale_factor
    fuse_r2 = float(tcfg.fuse_radius_px) ** 2
    th_low = matcher_cfg.th_low

    def insert(m: SlamMap, R, t, K, frame_id, kf_count,
               kp_desc, kp_oct, kp_ang, kp_valid, xy_un,
               kp_for_point, inlier):
        P = m.point_capacity
        N = m.kp_capacity
        Kc = m.kf_capacity

        # ---- slot allocation (evict the most redundant unprotected
        # keyframe when full — tracker._alloc_kf_slot) ----
        free = ~m.kf_valid
        any_free = jnp.any(free)
        evict_score = jnp.where(m.kf_valid & ~_protected_mask(m),
                                _kf_redundancy(m), -jnp.inf)
        slot = jnp.where(any_free, jnp.argmax(free),
                         jnp.argmax(evict_score))
        m = jax.lax.cond(any_free, lambda mm: mm,
                         lambda mm: _remove_kf(mm, slot), m)

        # ---- snapshot + pose (tracker._jit_write_kf, pure) ----
        tracked = inlier & (kp_for_point >= 0) & m.pt_valid      # [P]
        kp_pt_row = jnp.full((N,), -1, jnp.int32).at[
            jnp.where(tracked, kp_for_point, N)
        ].set(jnp.arange(P, dtype=jnp.int32), mode="drop")
        pad = N - kp_valid.shape[0]
        if pad < 0:
            raise ValueError(
                f"keypoint count {kp_valid.shape[0]} exceeds the map's "
                f"snapshot capacity {N}")
        m = m._replace(
            kf_R=m.kf_R.at[slot].set(R),
            kf_t=m.kf_t.at[slot].set(t),
            kf_valid=m.kf_valid.at[slot].set(True),
            kf_frame_id=m.kf_frame_id.at[slot].set(frame_id),
            kf_kp_xy=m.kf_kp_xy.at[slot].set(
                jnp.pad(xy_un, ((0, pad), (0, 0)))),
            kf_kp_desc=m.kf_kp_desc.at[slot].set(
                jnp.pad(kp_desc, ((0, pad), (0, 0)))),
            kf_kp_octave=m.kf_kp_octave.at[slot].set(
                jnp.pad(kp_oct, (0, pad))),
            kf_kp_angle=m.kf_kp_angle.at[slot].set(
                jnp.pad(kp_ang, (0, pad))),
            kf_kp_valid=m.kf_kp_valid.at[slot].set(
                jnp.pad(kp_valid, (0, pad))),
            kf_kp_pt=m.kf_kp_pt.at[slot].set(kp_pt_row),
        )

        # ---- tracked-point observations ----
        pt_lane, ok_t = _compact(tracked, obs_cap)               # over P
        rows_t, _ = _compact(~m.obs_valid, obs_cap)
        pt_safe = jnp.clip(pt_lane, 0, P - 1)
        kp_t = kp_for_point[pt_safe]
        kp_safe = jnp.clip(kp_t, 0, N - 1)
        # index through the (padded) snapshot, not the raw frame arrays:
        # snapshot capacity N may exceed the frame's keypoint capacity
        snap_oct = m.kf_kp_octave[slot]
        snap_xy = m.kf_kp_xy[slot]
        inv_t = 1.0 / scale ** (2.0 * snap_oct[kp_safe].astype(jnp.float32))
        ok_t = ok_t & (rows_t < m.obs_kf.shape[0])
        n_tracked = jnp.sum(ok_t.astype(jnp.int32))
        m = _scatter_obs_rows(m, slot, rows_t, pt_lane, kp_t,
                              snap_xy[kp_safe], inv_t, ok_t, 0)

        # ---- covisibility neighbors (association matmul + top-k) ----
        col = jnp.where((m.kf_kp_pt >= 0) & m.kf_kp_valid, m.kf_kp_pt, P)
        A = jnp.zeros((Kc, P), bool).at[
            jax.lax.broadcasted_iota(jnp.int32, (Kc, N), 0), col
        ].set(True, mode="drop")
        cur_vec = A[slot] & m.pt_valid
        shared = jnp.sum((A & cur_vec[None, :]).astype(jnp.int32), axis=1)
        shared = jnp.where(
            m.kf_valid & (jnp.arange(Kc) != slot), shared, -1)
        nb_shared, nb_idx = jax.lax.top_k(shared, NB)
        nb_ok = nb_shared >= tcfg.covis_min_shared
        # fallback: best-sharing keyframe alone (host parity)
        nb_ok = nb_ok | ((jnp.arange(NB) == 0) & (nb_shared > 0)
                         & ~jnp.any(nb_ok))

        # ---- batched match + triangulate + vet over the neighbor axis ----
        cur_free = m.kf_kp_pt[slot] < 0
        cur_valid = m.kf_kp_valid[slot] & cur_free
        R_cur, t_cur = m.kf_R[slot], m.kf_t[slot]

        def per(nbd, nbxy, nboct, nbang, nbv, Rn, tn):
            F21 = fundamental_from_poses(Rn, tn, R_cur, t_cur, K)
            res = search_for_triangulation(
                nbd, nbxy, nboct, nbang, nbv,
                m.kf_kp_desc[slot], m.kf_kp_xy[slot],
                m.kf_kp_octave[slot], m.kf_kp_angle[slot], cur_valid,
                F21, matcher_cfg, scale,
            )
            m12 = res.matches12
            has = m12 >= 0
            i2 = jnp.clip(m12, 0)
            x2 = m.kf_kp_xy[slot][i2]
            P1 = jnp.matmul(K, jnp.concatenate([Rn, tn[:, None]], axis=1), precision=_HI)
            P2 = jnp.matmul(K, jnp.concatenate([R_cur, t_cur[:, None]], axis=1), precision=_HI)
            pts = triangulate_dlt(P1[None], P2[None], nbxy[None],
                                  x2[None])[0]

            def chi2(Rv, tv, uv):
                pc = jnp.matmul(pts, Rv.T, precision=_HI) + tv
                z = pc[:, 2]
                zi = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
                u = K[0, 0] * pc[:, 0] / zi + K[0, 2]
                v = K[1, 1] * pc[:, 1] / zi + K[1, 2]
                return (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2, z

            err1, z1 = chi2(Rn, tn, nbxy)
            err2, z2 = chi2(R_cur, t_cur, x2)
            s2_1 = scale ** (2.0 * nboct.astype(jnp.float32))
            s2_2 = scale ** (
                2.0 * m.kf_kp_octave[slot][i2].astype(jnp.float32))
            o1 = -jnp.matmul(Rn.T, tn, precision=_HI)
            o2 = -jnp.matmul(R_cur.T, t_cur, precision=_HI)
            r1 = pts - o1
            r2 = pts - o2
            cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
                jnp.linalg.norm(r1, axis=-1)
                * jnp.linalg.norm(r2, axis=-1), 1e-12)
            vet = (has & jnp.isfinite(pts).all(-1)
                   & (z1 > 0.05) & (z2 > 0.05)
                   & (err1 < 5.991 * s2_1) & (err2 < 5.991 * s2_2)
                   & (cosp < 0.9998))
            return m12, pts, vet

        nb_valid1 = (m.kf_kp_valid[nb_idx] & (m.kf_kp_pt[nb_idx] < 0)
                     & nb_ok[:, None])
        m12_b, pts_b, vet_b = jax.vmap(per)(
            m.kf_kp_desc[nb_idx], m.kf_kp_xy[nb_idx],
            m.kf_kp_octave[nb_idx], m.kf_kp_angle[nb_idx], nb_valid1,
            m.kf_R[nb_idx], m.kf_t[nb_idx],
        )

        # ---- sequential per-neighbor fuse + create (host parity) ----
        consumed = jnp.zeros((N,), bool)
        n_created = jnp.zeros((), jnp.int32)
        for b in range(NB):
            nb = nb_idx[b]
            m12 = m12_b[b]
            i2s = jnp.clip(m12, 0)
            okb = vet_b[b] & ~consumed[i2s] & nb_ok[b]

            # fuse check against the CURRENT map (refreshed each b)
            pc = jnp.matmul(m.pts, R_cur.T, precision=_HI) + t_cur
            z = pc[:, 2]
            zi = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
            proj = jnp.stack([K[0, 0] * pc[:, 0] / zi + K[0, 2],
                              K[1, 1] * pc[:, 1] / zi + K[1, 2]], -1)
            proj_ok = m.pt_valid & (z > 0.05)
            x2 = m.kf_kp_xy[slot][i2s]                      # [N, 2]
            d2 = jnp.sum((x2[:, None, :] - proj[None, :, :]) ** 2, -1)
            hd = hamming_matrix(m.kf_kp_desc[slot][i2s], m.desc)
            good = (d2 <= fuse_r2) & proj_ok[None, :]
            Dm = jnp.where(good, hd, 999)
            fuse_tgt = jnp.argmin(Dm, axis=1)
            fuse_hit = okb & (jnp.min(Dm, axis=1) <= th_low)

            # fused lanes -> extra observations of the existing point
            fl, fok = _compact(fuse_hit, tri_cap)
            fls = jnp.clip(fl, 0, N - 1)
            rows_f, _ = _compact(~m.obs_valid, tri_cap)
            kp2_f = i2s[fls]
            inv_f = 1.0 / scale ** (2.0 * m.kf_kp_octave[slot][
                jnp.clip(kp2_f, 0, N - 1)].astype(jnp.float32))
            fok = fok & (rows_f < m.obs_kf.shape[0])
            m = _scatter_obs_rows(
                m, slot, rows_f, fuse_tgt[fls], kp2_f,
                m.kf_kp_xy[slot][jnp.clip(kp2_f, 0, N - 1)],
                inv_f, fok, 1)

            # new points
            new_hit = okb & ~fuse_hit
            nl, nok = _compact(new_hit, tri_cap)
            nls = jnp.clip(nl, 0, N - 1)
            kp1_n = nl                                     # nb keypoint idx
            kp2_n = i2s[nls]
            pslots, pok = _compact(~m.pt_valid, tri_cap)
            rowsA, _ = _compact(~m.obs_valid, 2 * tri_cap)
            rows1 = rowsA[:tri_cap]
            rows2 = rowsA[tri_cap:]
            nok = (nok & pok & (rows1 < m.obs_kf.shape[0])
                   & (rows2 < m.obs_kf.shape[0]))
            uv1 = m.kf_kp_xy[nb][jnp.clip(kp1_n, 0, N - 1)]
            uv2 = m.kf_kp_xy[slot][jnp.clip(kp2_n, 0, N - 1)]
            inv1 = 1.0 / scale ** (2.0 * m.kf_kp_octave[nb][
                jnp.clip(kp1_n, 0, N - 1)].astype(jnp.float32))
            inv2 = 1.0 / scale ** (2.0 * m.kf_kp_octave[slot][
                jnp.clip(kp2_n, 0, N - 1)].astype(jnp.float32))
            birth = jnp.full((tri_cap,), 0, jnp.int32) + kf_count
            m = _scatter_new_rows(
                m, slot, nb, pslots, rows1, rows2, kp1_n, kp2_n,
                pts_b[b][nls], uv1, uv2, inv1, inv2, birth, nok)
            n_created = n_created + jnp.sum(nok.astype(jnp.int32))

            consumed = consumed.at[
                jnp.where(okb, m12, N)
            ].set(True, mode="drop")

        # ---- lifecycle culling ----
        m = _cull_points(m, kf_count + 1, tcfg)
        m = _cull_keyframes(m, tcfg)

        # ---- local BA over the `ba_window` most recent keyframes ----
        big = jnp.int32(1 << 30)
        fids = jnp.where(m.kf_valid, m.kf_frame_id, -1)
        _, widx = jax.lax.top_k(fids, min(tcfg.ba_window, Kc))
        in_window = jnp.zeros(Kc, bool).at[widx].set(
            jnp.take(fids, widx) >= 0)
        oldest = jnp.argmin(jnp.where(m.kf_valid, m.kf_frame_id, big))
        fixed = (~in_window) | (~m.kf_valid)
        fixed = fixed.at[oldest].set(True)
        res = bundle_adjust(
            m.kf_R, m.kf_t, m.pts,
            m.obs_kf, m.obs_pt, m.obs_uv, m.obs_inv_sigma2, m.obs_valid,
            fixed, m.pt_valid, K,
            iterations=tcfg.ba_iterations,
            max_free_cams=tcfg.ba_window,
            early_stop_rel=tcfg.ba_early_stop_rel,
            segment_mode=tcfg.ba_segment_mode,
        )
        m = apply_ba_result(m, res)
        m = update_normal_and_depth(m, scale, orb_cfg.n_levels)
        return m, slot, n_tracked + n_created

    return insert


class DeviceLoopOutputs(NamedTuple):
    R: jnp.ndarray            # [T, 3, 3]
    t: jnp.ndarray            # [T, 3]
    n_inliers: jnp.ndarray    # [T] int32
    n_kps: jnp.ndarray        # [T] int32
    inserted_kf: jnp.ndarray  # [T] bool
    lost: jnp.ndarray         # [T] bool


def make_device_sequence_loop(cam_cfg: CameraConfig, orb_cfg: OrbConfig,
                              matcher_cfg: MatcherConfig,
                              tcfg: TrackerConfig,
                              tri_cap: int = 256, obs_cap: int = 512,
                              batched_solve: bool = False):
    """Whole-sequence tracking WITH keyframe lifecycle as one jitted scan.

    Returned signature:
      run(images [T, H, W], m0: SlamMap, R0 [3,3], t0 [3], K [3,3],
          frame_id0 [] int32, kf_count0 [] int32, kf_ref_inliers0 [] int32)
      -> (final SlamMap, DeviceLoopOutputs)

    The initial map comes from the host bootstrap (Tracker init or
    ``parallel.multiseq.make_multiseq_init_runner``).
    """
    from ..ops.proj_matcher import search_by_projection
    from ..optim.pose_opt import optimize_pose

    step = make_tracking_step(cam_cfg, orb_cfg, matcher_cfg, tcfg,
                              batched_solve=batched_solve)
    insert = make_device_insert_keyframe(
        cam_cfg, orb_cfg, matcher_cfg, tcfg, tri_cap, obs_cap)
    scale_f = orb_cfg.scale_factor
    recov_radius = tcfg.projection_radius * tcfg.lost_recovery_radius_scale

    @jax.jit
    def run(images, m0: SlamMap, R0, t0, K, frame_id0, kf_count0,
            kf_ref_inliers0):
        def body(carry, image):
            (m, R, t, vel_R, vel_t, have_vel, fsk, ref_inl, fid,
             kfc) = carry
            R_pred = jnp.where(have_vel & tcfg.use_motion_model,
                               jnp.matmul(vel_R, R, precision=_HI), R)
            t_pred = jnp.where(have_vel & tcfg.use_motion_model,
                               jnp.matmul(vel_R, t, precision=_HI) + vel_t, t)
            r = step(image, m.pts, m.desc, m.pt_valid,
                     m.pt_normal, m.pt_dmin, m.pt_dmax,
                     R_pred, t_pred, R, t, K)
            good0 = r.n_inliers >= tcfg.min_tracked_inliers

            # LOST recovery tier: wide-radius re-match of the SAME
            # frame's keypoints from the last good pose + pose LM with a
            # widened Huber basin — the host tracker's windowed
            # re-acquisition, paid only on failed frames (lax.cond).
            def recover(_):
                # Stage 1: wide-radius re-match from the last good pose
                # + pose LM with a widened Huber basin (the big jump).
                pmw = search_by_projection(
                    m.pts, m.desc, m.pt_valid, R, t, K,
                    r.kps.desc, r.xy_un, r.kps.valid, recov_radius,
                    matcher_cfg, cam_cfg.width, cam_cfg.height,
                    kp_octave=r.kps.octave, scale_factor=scale_f,
                    pt_normal=m.pt_normal, pt_dmin=m.pt_dmin,
                    pt_dmax=m.pt_dmax, n_levels=orb_cfg.n_levels)
                kp_idx = pmw.kp_for_point
                matched = kp_idx >= 0
                safe = jnp.clip(kp_idx, 0)
                inv_s2 = 1.0 / scale_f ** (
                    2.0 * r.kps.octave[safe].astype(jnp.float32))
                resw = optimize_pose(
                    R, t, m.pts, r.xy_un[safe], inv_s2, matched, K,
                    rounds=tcfg.pose_opt_rounds,
                    iters_per_round=tcfg.pose_opt_iters,
                    coarse_delta_scale=25.0,
                    batched_solve=batched_solve)
                # Stage 2: narrow re-match from the recovered pose +
                # standard LM — the host/ORB-SLAM re-acquisition's second
                # SearchByProjection pass that tightens the jumped pose
                # (Tracker relocalization refine; reference intent
                # tracking.hpp:58-65).
                pmn = search_by_projection(
                    m.pts, m.desc, m.pt_valid, resw.R, resw.t, K,
                    r.kps.desc, r.xy_un, r.kps.valid,
                    tcfg.projection_radius,
                    matcher_cfg, cam_cfg.width, cam_cfg.height,
                    kp_octave=r.kps.octave, scale_factor=scale_f,
                    pt_normal=m.pt_normal, pt_dmin=m.pt_dmin,
                    pt_dmax=m.pt_dmax, n_levels=orb_cfg.n_levels)
                kp_idx2 = pmn.kp_for_point
                matched2 = kp_idx2 >= 0
                safe2 = jnp.clip(kp_idx2, 0)
                inv_s2b = 1.0 / scale_f ** (
                    2.0 * r.kps.octave[safe2].astype(jnp.float32))
                resn = optimize_pose(
                    resw.R, resw.t, m.pts, r.xy_un[safe2], inv_s2b,
                    matched2, K,
                    rounds=tcfg.pose_opt_rounds,
                    iters_per_round=tcfg.pose_opt_iters,
                    batched_solve=batched_solve)
                # keep stage 2 only if it held at least stage 1's support
                # (a bad narrow re-match must not undo the wide recovery)
                ok2 = resn.n_inliers >= resw.n_inliers
                return (jnp.where(ok2, resn.R, resw.R),
                        jnp.where(ok2, resn.t, resw.t),
                        jnp.where(ok2, resn.n_inliers, resw.n_inliers),
                        jnp.where(ok2, pmn.kp_for_point, pmw.kp_for_point),
                        jnp.where(ok2, resn.inlier, resw.inlier),
                        jnp.where(ok2, pmn.visible, pmw.visible))

            def keep(_):
                return (r.R, r.t, r.n_inliers, r.kp_for_point,
                        r.inlier, r.visible)

            if tcfg.lost_recovery_radius_scale > 0:
                (R_opt, t_opt, n_inl, kp_for_point, inlier,
                 visible) = jax.lax.cond(good0, keep, recover, None)
            else:
                R_opt, t_opt, n_inl, kp_for_point, inlier, visible = keep(
                    None)

            good = n_inl >= tcfg.min_tracked_inliers
            recovered = good & ~good0
            # mnVisible/mnFound tallies (culling input, host parity)
            found = (kp_for_point >= 0) & m.pt_valid
            m = m._replace(
                pt_visible=m.pt_visible
                + (visible & m.pt_valid).astype(jnp.int32),
                pt_found=m.pt_found + found.astype(jnp.int32),
            )
            R_new = jnp.where(good, R_opt, R)
            t_new = jnp.where(good, t_opt, t)
            # velocity only from CONTINUOUS good frames; a recovered pose
            # jumped, so its velocity is stale (host parity: reloc clears
            # have_velocity)
            vel_R_new = jnp.where(good0, jnp.matmul(r.R, R.T, precision=_HI), vel_R)
            vel_t_new = jnp.where(good0, r.t - jnp.matmul(jnp.matmul(r.R, R.T, precision=_HI), t, precision=_HI), vel_t)
            have_vel = jnp.where(recovered, False, good0 | have_vel)
            fsk = fsk + 1

            need_kf = good & (fsk >= tcfg.min_frames + 1) & (
                (fsk >= tcfg.max_frames)
                | (n_inl.astype(jnp.float32)
                   < 0.9 * ref_inl.astype(jnp.float32))
                | (n_inl < tcfg.min_tracked_inliers * 5)
            )

            def do_insert(args):
                m_, kfc_ = args
                m2, _, support = insert(
                    m_, R_new, t_new, K, fid, kfc_,
                    r.kps.desc, r.kps.octave, r.kps.angle_deg,
                    r.kps.valid, r.xy_un, kp_for_point, inlier)
                return m2, kfc_ + 1, support

            def no_insert(args):
                m_, kfc_ = args
                return m_, kfc_, ref_inl

            m, kfc, ref_new = jax.lax.cond(
                need_kf, do_insert, no_insert, (m, kfc))
            fsk = jnp.where(need_kf, 0, fsk)
            carry = (m, R_new, t_new, vel_R_new, vel_t_new, have_vel,
                     fsk, ref_new, fid + 1, kfc)
            out = (R_new, t_new, n_inl, r.n_kps, need_kf, ~good)
            return carry, out

        carry0 = (m0, R0, t0, jnp.eye(3), jnp.zeros(3),
                  jnp.asarray(False), jnp.int32(0),
                  jnp.asarray(kf_ref_inliers0, jnp.int32),
                  jnp.asarray(frame_id0, jnp.int32),
                  jnp.asarray(kf_count0, jnp.int32))
        carry, outs = jax.lax.scan(body, carry0, images)
        m_final = carry[0]
        return m_final, DeviceLoopOutputs(*outs)

    return run
