"""Loop closing: place-recognition candidates -> Sim(3) -> map correction
-> essential-graph optimization.

The host-orchestrated realization of ORB-SLAM's LoopClosing thread — the
capability the reference vendors DBoW2 + g2o's Sim(3) types for
(``Thirdparty/g2o/g2o/types/types_seven_dof_expmap.h:48-152``,
``Thirdparty/DBoW2/DBoW2/TemplatedDatabase.h:35``). Stages:

1. **DetectLoop** — BoW query over the keyframe database, excluding the
   current keyframe's covisibility group and recent frames, gated by the
   minimum covisible-neighbor score, then a *consistency* filter: the
   candidate's covisibility group must recur across
   ``loop_consistency_th`` consecutive keyframe insertions.
2. **ComputeSim3** — descriptor matching between the two keyframes'
   map-point-associated keypoints (``match_descriptors``, the SearchByBoW
   role), then ``ransac_sim3`` on the 3D-3D pairs in the two *camera*
   frames (``Sim3Solver``) and ``optimize_sim3`` refinement on
   bidirectional reprojection (``Optimizer::OptimizeSim3``).
3. **CorrectLoop** — corrected poses for the current covisibility group
   via the relative transforms, an essential graph (temporal chain +
   strong covisibility edges + the loop edge) solved by
   ``optimize_pose_graph`` with the loop keyframe fixed
   (``Optimizer::OptimizeEssentialGraph``), every map point re-anchored
   through its reference keyframe's total correction, and poses written
   back as SE(3) with the scale folded into the translation (``[R, t/s]``,
   ORB-SLAM CorrectLoop).

Like the tracker, this module keeps graph bookkeeping (group sets, edge
lists) in host numpy and runs the numeric work (matching, RANSAC, Sim(3)
LM, pose-graph LM) as jitted device programs — the pointer-graph parts of
the reference are cheap and irregular, the solvers are where the FLOPs
are.
"""

from __future__ import annotations

from typing import List, Optional, Set, Tuple

import jax
import jax.numpy as jnp

import numpy as np

from ..bow.database import KeyframeDatabase, query
from ..config import SystemConfig
from ..geometry.sim3 import (
    Sim3, optimize_sim3, ransac_sim3, sim3_compose, sim3_inverse,
)
from ..ops.matcher import match_descriptors, match_descriptors_bow
from ..optim.pose_graph import optimize_pose_graph, relative_sim3
from .map import SlamMap

__all__ = ["LoopCloser", "covisibility_matrix", "covisible_slots"]

# float32 matmul precision on TPU (the default truncates to bfloat16
# - see optim/ba.py:_obs_residuals).
_HI = jax.lax.Precision.HIGHEST

# fixed capacity for the Sim(3) correspondence arrays (compile once)
_SIM3_CAP = 512


@jax.jit
def _grow_sim3_matches(g: Sim3, x1, v1, d1, uv1, o1, x2, v2, d2, uv2, o2,
                       K, r_px, th, scale_factor):
    """Bidirectional Sim(3)-projection match growing — the
    ``ORBmatcher::SearchBySim3`` role (``LoopClosing::ComputeSim3`` grows
    the RANSAC solution's correspondences before ``OptimizeSim3``; the
    ~dozen BoW matches that seeded RANSAC are rarely enough to clear the
    inlier acceptance bar on their own).

    ``x1``/``x2`` are the two keyframes' map points in their OWN camera
    frames, ``g`` maps frame-2 camera coords into frame 1. A pair (i, j)
    is eligible when j's point projects within the octave-scaled radius
    of keypoint i in image 1 AND i's point projects within the radius of
    keypoint j in image 2 (the reference's check-both-directions
    agreement), with Hamming <= ``th`` (TH_HIGH — no ratio test in
    SearchBySim3). The per-keypoint radius follows the SearchBySim3
    convention ``r_px * scale_factor**octave`` of the keypoint being
    matched against (the reference family's 7.5 * mvScaleFactors[octave];
    the Sim(3) types it serves: ``Thirdparty/g2o/g2o/types/
    types_seven_dof_expmap.h:48-152``). Returns j_for_i [N1] int32
    (-1 = none), mutual-best by descriptor distance.
    """
    from ..ops.hamming import hamming_matrix

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def proj(p):
        z = jnp.maximum(p[:, 2], 1e-9)
        return (jnp.stack([fx * p[:, 0] / z + cx, fy * p[:, 1] / z + cy],
                          -1), p[:, 2] > 1e-6)

    y2 = g.s * jnp.matmul(x2, g.R.T, precision=_HI) + g.t  # frame-2 points in frame 1
    gi = sim3_inverse(g)
    y1 = gi.s * jnp.matmul(x1, gi.R.T, precision=_HI) + gi.t  # frame-1 points in frame 2
    uv2_in_1, ok2 = proj(y2)
    uv1_in_2, ok1 = proj(y1)

    d_fwd = jnp.sum((uv1[:, None, :] - uv2_in_1[None, :, :]) ** 2, -1)
    d_bwd = jnp.sum((uv1_in_2[:, None, :] - uv2[None, :, :]) ** 2, -1)
    r1 = r_px * scale_factor ** o1.astype(jnp.float32)   # [N1]
    r2 = r_px * scale_factor ** o2.astype(jnp.float32)   # [N2]
    D = hamming_matrix(d1, d2)
    big = 1 << 20
    elig = (v1[:, None] & v2[None, :] & ok1[:, None] & ok2[None, :]
            & (d_fwd <= (r1 * r1)[:, None]) & (d_bwd <= (r2 * r2)[None, :])
            & (D <= th))
    Dm = jnp.where(elig, D, big)
    best = jnp.min(Dm, axis=1)
    best_j = jnp.argmin(Dm, axis=1)
    accept = best < big
    n1 = x1.shape[0]
    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    rows = jnp.arange(n1, dtype=jnp.int32)
    key = jnp.where(accept, best * jnp.int32(n1) + rows, sentinel)
    min_key = jnp.full((x2.shape[0],), sentinel, jnp.int32).at[best_j].min(key)
    keep = accept & (key == min_key[best_j])
    return jnp.where(keep, best_j.astype(jnp.int32), -1)


def covisibility_matrix(m: SlamMap) -> np.ndarray:
    """[Kc, Kc] shared-map-point counts between keyframe snapshots (the
    covisibility graph's edge weights). One bool matmul on host — the
    per-pair set intersections of the reference's pointer graph."""
    kf_kp_pt = np.asarray(m.kf_kp_pt)
    kf_valid = np.asarray(m.kf_valid)
    pt_valid = np.asarray(m.pt_valid)
    Kc, P = kf_kp_pt.shape[0], m.point_capacity
    obs = np.zeros((Kc, P), bool)
    rows = np.repeat(np.arange(Kc), kf_kp_pt.shape[1])
    cols = kf_kp_pt.reshape(-1)
    ok = cols >= 0
    obs[rows[ok], cols[ok]] = True
    obs &= pt_valid[None, :]
    obs[~kf_valid] = False
    shared = (obs.astype(np.int32) @ obs.astype(np.int32).T)
    np.fill_diagonal(shared, 0)
    return shared


def covisible_slots(m: SlamMap, slot: int, min_shared: int) -> np.ndarray:
    shared = covisibility_matrix(m)[slot]
    return np.where(shared >= min_shared)[0]


class LoopCloser:
    """Per-map loop-closing state machine; call :meth:`on_keyframe` after
    every keyframe insertion."""

    def __init__(self, cfg: SystemConfig, K: np.ndarray, vocab=None):
        self.cfg = cfg
        self.K = jnp.asarray(K, jnp.float32)
        # pyramid scale for the octave-scaled SearchBySim3 radius
        self.scale_factor = float(cfg.orb.scale_factor)
        # vocabulary for direct-index (SearchByBoW) seed matching; None
        # falls back to global ratio-test matching
        self.vocab = vocab
        # consistency groups: (covisibility group of a candidate, streak)
        self._groups: List[Tuple[Set[int], int]] = []
        self._key_counter = 0
        self.last_closed_frame_id = -(10 ** 9)
        self.last_sim3_reason = ""
        self.last_implicit_revisit: List[int] = []

    # ------------------------------------------------------------------
    # stage 1: DetectLoop
    # ------------------------------------------------------------------
    def detect(self, m: SlamMap, kf_db: KeyframeDatabase,
               slot: int) -> List[int]:
        """Consistent loop candidates, best BoW score first (ORB-SLAM
        ``DetectLoop`` fills mvpEnoughConsistentCandidates with EVERY
        candidate whose consistency streak clears the threshold —
        ``ComputeSim3`` then tries each; returning only the top-scoring
        one lets a perceptually-aliased distractor eat the attempt)."""
        tcfg = self.cfg.tracker
        kf_valid = np.asarray(m.kf_valid)
        frame_ids = np.asarray(m.kf_frame_id)
        cur_fid = int(frame_ids[slot])

        shared = covisibility_matrix(m)
        neighbors = np.where(shared[slot] >= tcfg.covis_min_shared)[0]

        scores = np.asarray(query(kf_db, kf_db.bow[slot]))
        # minimum acceptance score: the worst covisible neighbor
        # (ORB-SLAM DetectLoop's minScore)
        min_score = float(scores[neighbors].min()) if len(neighbors) else 0.0

        mask = kf_valid.copy()
        mask[slot] = False
        mask[neighbors] = False
        mask &= (cur_fid - frame_ids) >= tcfg.loop_min_frame_gap
        # observability: a covisible neighbor OLD enough to have been a
        # loop candidate means the tracker already reconnected to the old
        # map by projection — the loop is being absorbed IMPLICITLY (map
        # reuse), so its exclusion here is the correct non-event, not a
        # miss (ORB-SLAM behaves identically: vpConnectedKeyFrames are
        # skipped in DetectLoop)
        old_covis = [int(c) for c in neighbors
                     if kf_valid[c]
                     and cur_fid - int(frame_ids[c]) >= tcfg.loop_min_frame_gap]
        self.last_implicit_revisit = old_covis
        cand_slots = np.where(mask & np.isfinite(scores)
                              & (scores >= min_score))[0]

        # consistency across consecutive keyframes: a candidate's
        # covisibility group must intersect a group seen last time
        new_groups: List[Tuple[Set[int], int]] = []
        accepted: List[Tuple[float, int]] = []
        for c in cand_slots:
            group = set(np.where(shared[c] >= tcfg.covis_min_shared)[0])
            group.add(int(c))
            # best streak over ALL intersecting previous groups (ORB-SLAM
            # DetectLoop tracks nCurrentConsistency as the maximum; taking
            # the first intersection can under-count with overlapping
            # covisibility groups and delay acceptance)
            streak = 1 + max(
                (ps for pg, ps in self._groups if group & pg), default=0)
            new_groups.append((group, streak))
            if streak >= tcfg.loop_consistency_th:
                accepted.append((float(scores[c]), int(c)))
        self._groups = new_groups
        return [c for _, c in sorted(accepted, reverse=True)]

    # ------------------------------------------------------------------
    # stage 2: ComputeSim3
    # ------------------------------------------------------------------
    def compute_sim3(self, m: SlamMap, cur: int,
                     cand: int) -> Optional[Tuple[Sim3, int]]:
        """Scm: candidate-camera -> current-camera similarity, or None."""
        tcfg = self.cfg.tracker
        kf_kp_pt = np.asarray(m.kf_kp_pt)
        pt_valid = np.asarray(m.pt_valid)

        def _kp_valid(k):
            a = kf_kp_pt[k]
            return (np.asarray(m.kf_kp_valid[k]) & (a >= 0)
                    & pt_valid[np.clip(a, 0, m.point_capacity - 1)])

        v_cur = _kp_valid(cur)
        v_cand = _kp_valid(cand)
        if self.vocab is not None:
            # true SearchByBoW: compare only features under the same
            # direct-index node (ORBmatcher.cpp SearchByBoW walks the two
            # FeatureVectors in lockstep) — confining the ratio test to
            # one vocabulary cell is what keeps it survivable on
            # self-similar scenes
            from ..bow.vocabulary import direct_index_nodes, transform

            w1, _ = transform(self.vocab, m.kf_kp_desc[cur],
                              jnp.asarray(v_cur))
            w2, _ = transform(self.vocab, m.kf_kp_desc[cand],
                              jnp.asarray(v_cand))
            matches = np.asarray(match_descriptors_bow(
                m.kf_kp_desc[cur], jnp.asarray(v_cur),
                direct_index_nodes(self.vocab, w1),
                m.kf_kp_desc[cand], jnp.asarray(v_cand),
                direct_index_nodes(self.vocab, w2),
            ))
            if int((matches >= 0).sum()) < tcfg.loop_min_inliers:
                # scarce BoW seeds (coarse vocabulary cells on a small
                # synthetic vocab can over-segment true matches) — widen
                # to the global ratio test rather than starving RANSAC
                matches = np.asarray(match_descriptors(
                    m.kf_kp_desc[cur], jnp.asarray(v_cur),
                    m.kf_kp_desc[cand], jnp.asarray(v_cand),
                ))
        else:
            matches = np.asarray(match_descriptors(
                m.kf_kp_desc[cur], jnp.asarray(v_cur),
                m.kf_kp_desc[cand], jnp.asarray(v_cand),
            ))
        i1 = np.where(matches >= 0)[0]
        self.last_sim3_reason = (
            f"matches={len(i1)}/[{int(v_cur.sum())},{int(v_cand.sum())}]")
        if len(i1) < 3:
            return None
        i2 = matches[i1]

        # every point-associated keypoint's map point, in its own camera
        # frame (safe-indexed; rows with v_* False are garbage and masked)
        pts = np.asarray(m.pts)
        R1, t1 = np.asarray(m.kf_R[cur]), np.asarray(m.kf_t[cur])
        R2, t2 = np.asarray(m.kf_R[cand]), np.asarray(m.kf_t[cand])
        safe1 = np.clip(kf_kp_pt[cur], 0, m.point_capacity - 1)
        safe2 = np.clip(kf_kp_pt[cand], 0, m.point_capacity - 1)
        x1_all = (pts[safe1] @ R1.T + t1).astype(np.float32)
        x2_all = (pts[safe2] @ R2.T + t2).astype(np.float32)
        uv1_all = np.asarray(m.kf_kp_xy[cur])
        uv2_all = np.asarray(m.kf_kp_xy[cand])

        def _pack(ii, jj):
            n = min(len(ii), _SIM3_CAP)
            X1 = np.zeros((_SIM3_CAP, 3), np.float32)
            X2 = np.zeros((_SIM3_CAP, 3), np.float32)
            U1 = np.zeros((_SIM3_CAP, 2), np.float32)
            U2 = np.zeros((_SIM3_CAP, 2), np.float32)
            V = np.zeros(_SIM3_CAP, bool)
            X1[:n], X2[:n] = x1_all[ii[:n]], x2_all[jj[:n]]
            U1[:n], U2[:n] = uv1_all[ii[:n]], uv2_all[jj[:n]]
            V[:n] = True
            return X1, X2, U1, U2, V, n

        X1, X2, U1, U2, V, n = _pack(i1, i2)

        # metric RANSAC gate scaled to the scene (the reference gates by
        # reprojection chi2 inside Sim3Solver; a relative 3D gate is the
        # scale-free analog)
        tol = 0.05 * float(np.median(np.linalg.norm(X1[:n], axis=-1)) + 1e-6)
        self._key_counter += 1
        res = ransac_sim3(
            jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(V),
            jax.random.PRNGKey(self._key_counter), tol=tol,
            min_inliers=min(tcfg.loop_min_inliers, 6),
        )
        n_ransac = int(np.asarray(res.inliers).sum())
        self.last_sim3_reason += f" ransac_ok={bool(res.ok)}({n_ransac})"
        if not bool(res.ok):
            return None

        # SearchBySim3: grow correspondences by bidirectional projection
        # under the RANSAC estimate, refine, then grow AGAIN under the
        # refined similarity and re-refine (LoopClosing::ComputeSim3 ->
        # ORBmatcher::SearchBySim3 -> OptimizeSim3; the second round
        # matters because the few-point RANSAC estimate centers the
        # projection search coarsely — matches the first pass misses by a
        # few pixels land inside the radius once the optimizer has pulled
        # the similarity onto the grown set)
        g = Sim3(s=res.g.s, R=res.g.R, t=res.g.t)
        n_inl = 0
        for _round in range(2):
            grown = np.asarray(_grow_sim3_matches(
                g,
                jnp.asarray(x1_all), jnp.asarray(v_cur),
                m.kf_kp_desc[cur], jnp.asarray(uv1_all),
                m.kf_kp_octave[cur],
                jnp.asarray(x2_all), jnp.asarray(v_cand),
                m.kf_kp_desc[cand], jnp.asarray(uv2_all),
                m.kf_kp_octave[cand],
                self.K, jnp.float32(tcfg.loop_sim3_grow_radius_px),
                jnp.int32(100), jnp.float32(self.scale_factor)))
            j_for_i = np.full(len(matches), -1, np.int64)
            j_for_i[i1] = i2
            used2 = np.zeros(len(v_cand), bool)
            used2[i2] = True
            vac = ((j_for_i < 0) & (grown >= 0)
                   & ~used2[np.clip(grown, 0, len(v_cand) - 1)])
            j_for_i[vac] = grown[vac]
            ii = np.where(j_for_i >= 0)[0]
            self.last_sim3_reason += f" grown={len(ii)}"
            X1, X2, U1, U2, V, n = _pack(ii, j_for_i[ii])

            go, inl = optimize_sim3(
                g, jnp.asarray(X1), jnp.asarray(X2),
                jnp.asarray(U1), jnp.asarray(U2), self.K,
                jnp.asarray(V),
            )
            g = Sim3(s=go.s, R=go.R, t=go.t)
            n_inl = int(jnp.sum(inl.astype(jnp.int32)))
            self.last_sim3_reason += (
                f" opt_inl={n_inl}/{tcfg.loop_min_inliers}")
            if n_inl >= tcfg.loop_min_inliers:
                return g, n_inl
        return None

    # ------------------------------------------------------------------
    # SearchAndFuse
    # ------------------------------------------------------------------
    def fuse_loop_points(self, m: SlamMap, group: Set[int], cand: int,
                         R_corr: np.ndarray, t_corr: np.ndarray,
                         s_corr: np.ndarray) -> Tuple[SlamMap, int]:
        """Merge the current group's duplicate map points into the loop
        side's originals (``LoopClosing::SearchAndFuse`` /
        ``ORBmatcher::Fuse``).

        The loop side's points (observed by ``cand`` and its covisibility
        group) are projected into each keyframe of the current group with
        its CORRECTED pose; a projected point that lands within
        ``loop_fuse_radius_px`` of a keypoint whose descriptor is within
        TH_LOW replaces that keypoint's currently associated point
        everywhere (observations, snapshot associations, validity,
        observation counts). Replacement is the loop-binding operation —
        afterwards both sides of the loop observe the SAME points, so
        bundle adjustment preserves the closure instead of undoing it.

        Host-side orchestration over a handful of keyframes; the [L, N]
        descriptor-distance blocks ride the device bit-matmul
        (descriptor capacity is padded so the program compiles once).
        """
        from ..ops.hamming import hamming_matrix

        tcfg = self.cfg.tracker
        P = m.point_capacity
        pt_valid = np.asarray(m.pt_valid)
        obs_kf = np.asarray(m.obs_kf)
        obs_pt = np.asarray(m.obs_pt)
        obs_ok = np.asarray(m.obs_valid)

        # loop map points: everything the candidate side observes
        cand_group = set(
            covisible_slots(m, cand, tcfg.covis_min_shared).tolist())
        cand_group.add(cand)
        in_cand = obs_ok & np.isin(obs_kf, sorted(cand_group))
        loop_mask = np.zeros(P, bool)
        loop_mask[obs_pt[in_cand]] = True
        loop_mask &= pt_valid
        loop_idx = np.where(loop_mask)[0]
        L = len(loop_idx)
        if L == 0:
            return m, 0

        # pad the loop-point axis to a power-of-two bucket so the device
        # Hamming program compiles a bounded number of times
        Lcap = 1 << int(np.ceil(np.log2(max(L, 64))))
        pdesc = np.zeros((Lcap, 8), np.uint32)
        pdesc[:L] = np.asarray(m.desc)[loop_idx]
        pdesc_dev = jnp.asarray(pdesc)

        K = np.asarray(self.K)
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        pts = np.asarray(m.pts)[loop_idx]
        r2 = float(tcfg.loop_fuse_radius_px) ** 2

        merges: dict = {}   # duplicate slot -> loop slot
        for k in sorted(group):
            # corrected SE(3) projection: s(RX) + t  ∝  RX + t/s
            xc = pts @ R_corr[k].T + (t_corr[k] / max(s_corr[k], 1e-12))
            z = xc[:, 2]
            ok = z > 1e-6
            zs = np.where(ok, z, 1.0)
            u = fx * xc[:, 0] / zs + cx
            v = fy * xc[:, 1] / zs + cy
            kp_xy = np.asarray(m.kf_kp_xy[k])
            kp_ok = np.asarray(m.kf_kp_valid[k])
            kp_pt_k = np.asarray(m.kf_kp_pt[k])
            D = np.asarray(hamming_matrix(
                pdesc_dev, m.kf_kp_desc[k]))[:L]          # [L, N]
            du = u[:, None] - kp_xy[None, :, 0]
            dv = v[:, None] - kp_xy[None, :, 1]
            good = ((du * du + dv * dv <= r2) & kp_ok[None, :]
                    & ok[:, None] & (D <= 50))
            Dm = np.where(good, D, 999)
            j_best = Dm.argmin(axis=1)
            d_best = Dm.min(axis=1)
            for li in np.where(d_best <= 50)[0]:
                p = int(loop_idx[li])
                q = int(kp_pt_k[j_best[li]])
                # only REPLACE existing associations; a keypoint with no
                # point is left alone (association without triangulated
                # support adds nothing the essential graph needs)
                if q >= 0 and q != p and not loop_mask[q]:
                    merges[q] = p

        if not merges:
            return m, 0

        remap = np.arange(P, dtype=np.int64)
        for q, p in merges.items():
            remap[q] = p
        kfkp = np.asarray(m.kf_kp_pt)
        kfkp_new = np.where(kfkp >= 0, remap[np.clip(kfkp, 0, P - 1)],
                            kfkp).astype(kfkp.dtype)
        new_obs_pt = remap[obs_pt].astype(obs_pt.dtype)
        # A keyframe that observed two distinct pre-merge points now merged
        # into the same target would contribute duplicate (kf, pt) rows and
        # double-weight those pixels in pose-graph/GBA (ORB-SLAM's
        # MapPoint::Replace dedups observations). Keep one row per pair and
        # recompute n_obs of merge targets from the surviving rows.
        targets = np.unique(np.fromiter(merges.values(), np.int64))
        new_obs_ok = obs_ok.copy()
        aff = np.where(obs_ok & np.isin(new_obs_pt, targets))[0]
        if len(aff):
            keys = (obs_kf[aff].astype(np.int64) * P
                    + new_obs_pt[aff].astype(np.int64))
            _, first = np.unique(keys, return_index=True)
            dup = np.ones(len(aff), bool)
            dup[first] = False
            new_obs_ok[aff[dup]] = False
        n_obs = np.asarray(m.n_obs).copy()
        new_valid = pt_valid.copy()
        for q in merges:
            n_obs[q] = 0
            new_valid[q] = False
        for p in targets:
            n_obs[p] = int(np.sum(new_obs_ok & (new_obs_pt == p)))
        return m._replace(
            obs_pt=jnp.asarray(new_obs_pt),
            obs_valid=jnp.asarray(new_obs_ok),
            kf_kp_pt=jnp.asarray(kfkp_new),
            pt_valid=jnp.asarray(new_valid),
            n_obs=jnp.asarray(n_obs),
        ), len(merges)

    # ------------------------------------------------------------------
    # stage 3: CorrectLoop
    # ------------------------------------------------------------------
    def correct(self, m: SlamMap, cur: int, cand: int,
                Scm: Sim3) -> Tuple[SlamMap, dict]:
        tcfg = self.cfg.tracker
        Kc = m.kf_capacity
        kf_valid = np.asarray(m.kf_valid)
        frame_ids = np.asarray(m.kf_frame_id)
        R_all = np.asarray(m.kf_R)
        t_all = np.asarray(m.kf_t)

        ones = jnp.ones(Kc, jnp.float32)
        # pre-correction vertices (scale-1 similarities)
        S_pre = Sim3(s=ones, R=jnp.asarray(R_all), t=jnp.asarray(t_all))

        # corrected current pose: Scw' = Scm o Smw  (ORB-SLAM mScw)
        S_mw = Sim3(s=jnp.float32(1.0), R=jnp.asarray(R_all[cand]),
                    t=jnp.asarray(t_all[cand]))
        S_cw_corr = sim3_compose(Scm, S_mw)
        S_cw_old = Sim3(s=jnp.float32(1.0), R=jnp.asarray(R_all[cur]),
                        t=jnp.asarray(t_all[cur]))
        inv_cw_old = sim3_inverse(S_cw_old)

        group = set(covisible_slots(m, cur, tcfg.covis_min_shared).tolist())
        group.add(cur)
        group = {g for g in group if kf_valid[g]}

        # vertex init: pre-correction everywhere, corrected for the group
        s_init = np.ones(Kc, np.float32)
        R_init = R_all.copy()
        t_init = t_all.copy()
        for g_slot in sorted(group):
            S_iw = Sim3(s=jnp.float32(1.0), R=jnp.asarray(R_all[g_slot]),
                        t=jnp.asarray(t_all[g_slot]))
            S_ic = sim3_compose(S_iw, inv_cw_old)
            S_corr = sim3_compose(S_ic, S_cw_corr)
            s_init[g_slot] = float(S_corr.s)
            R_init[g_slot] = np.asarray(S_corr.R)
            t_init[g_slot] = np.asarray(S_corr.t)
        S_init = Sim3(s=jnp.asarray(s_init), R=jnp.asarray(R_init),
                      t=jnp.asarray(t_init))

        # covisibility BEFORE fusion: these pairs' relatives encode
        # odometry and must be measured from the PRE-correction poses
        # (ORB-SLAM's NonCorrectedSim3), or the correction could not
        # redistribute along the chain
        shared_pre = covisibility_matrix(m)

        # ---- SearchAndFuse (LoopClosing::SearchAndFuse): project the
        # loop side's map points into the current group's keyframes under
        # the CORRECTED poses and merge duplicates. This is what ties the
        # two sides of the loop together with shared observations — the
        # essential graph gets its loop-connection covisibility edges
        # from it, and without it the later global BA would relax the
        # map right back to the drift-consistent configuration. ----
        m, n_fused = self.fuse_loop_points(
            m, group, cand, R_init, t_init, s_init)

        # ---- essential graph edges ----
        th_cov = tcfg.loop_covis_edge_min_shared
        order = [int(k) for k in np.argsort(frame_ids) if kf_valid[k]]
        ei: List[int] = []
        ej: List[int] = []
        # temporal chain (spanning-tree stand-in: each KF to its
        # predecessor in insertion order)
        for a, b in zip(order[1:], order[:-1]):
            ei.append(a)
            ej.append(b)
        # strong pre-existing covisibility edges (odometry class)
        ii, jj = np.where(np.triu(shared_pre, 1) >= th_cov)
        for a, b in zip(ii.tolist(), jj.tolist()):
            if kf_valid[a] and kf_valid[b] and abs(
                    int(frame_ids[a]) - int(frame_ids[b])) > 1:
                ei.append(int(a))
                ej.append(int(b))
        E_odo = len(ei)
        # NEW covisibility created by the fuse = ORB-SLAM's
        # LoopConnections: measured from the HYBRID pose set S_init
        # (corrected for the current group, pre-correction elsewhere —
        # the CorrectedSim3/NonCorrectedSim3 split of
        # Optimizer::OptimizeEssentialGraph), so each of these edges
        # encodes the CLOSURE rather than re-injecting drift
        shared_post = covisibility_matrix(m)
        ii, jj = np.where(np.triu(shared_post, 1) >= th_cov)
        for a, b in zip(ii.tolist(), jj.tolist()):
            if (shared_pre[a, b] < th_cov and kf_valid[a] and kf_valid[b]
                    and not (a == cur and b == cand)
                    and not (a == cand and b == cur)):
                ei.append(int(a))
                ej.append(int(b))
        # the loop edge itself, measured by the Sim(3) solver
        ei.append(cur)
        ej.append(cand)

        E = len(ei)
        eia = np.asarray(ei, np.int32)
        eja = np.asarray(ej, np.int32)
        meas_pre = relative_sim3(
            Sim3(s=S_pre.s[eia], R=S_pre.R[eia], t=S_pre.t[eia]),
            Sim3(s=S_pre.s[eja], R=S_pre.R[eja], t=S_pre.t[eja]),
        )
        meas_cor = relative_sim3(
            Sim3(s=S_init.s[eia], R=S_init.R[eia], t=S_init.t[eia]),
            Sim3(s=S_init.s[eja], R=S_init.R[eja], t=S_init.t[eja]),
        )
        is_closure = jnp.asarray(np.arange(E) >= E_odo)
        meas = Sim3(
            s=jnp.where(is_closure, meas_cor.s, meas_pre.s),
            R=jnp.where(is_closure[:, None, None], meas_cor.R, meas_pre.R),
            t=jnp.where(is_closure[:, None], meas_cor.t, meas_pre.t),
        )
        meas = Sim3(                       # overwrite the loop edge
            s=meas.s.at[E - 1].set(Scm.s),
            R=meas.R.at[E - 1].set(Scm.R),
            t=meas.t.at[E - 1].set(Scm.t),
        )
        # pad the edge list to a power-of-two bucket (bounded recompiles)
        cap = 1 << int(np.ceil(np.log2(max(E, 8))))
        pad = cap - E
        eia = np.concatenate([eia, np.zeros(pad, np.int32)])
        eja = np.concatenate([eja, np.zeros(pad, np.int32)])
        meas = Sim3(
            s=jnp.concatenate([meas.s, jnp.ones(pad)]),
            R=jnp.concatenate([meas.R,
                               jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))]),
            t=jnp.concatenate([meas.t, jnp.zeros((pad, 3))]),
        )
        e_w = jnp.concatenate([jnp.ones(E), jnp.zeros(pad)]).astype(jnp.float32)

        fixed = np.zeros(Kc, bool)
        fixed[cand] = True
        res = optimize_pose_graph(
            S_init, jnp.asarray(kf_valid), jnp.asarray(fixed),
            jnp.asarray(eia), jnp.asarray(eja), meas, e_w,
            iterations=tcfg.pose_graph_iterations,
        )
        S_opt = res.vertices

        # ---- write back: poses as [R, t/s]; points re-anchored through
        # their reference keyframe's total correction S_opt^-1 o S_pre ----
        s_opt = np.asarray(S_opt.s)
        R_opt = np.asarray(S_opt.R)
        t_opt = np.asarray(S_opt.t)
        new_R = np.where(kf_valid[:, None, None], R_opt, R_all)
        new_t = np.where(kf_valid[:, None],
                         t_opt / np.maximum(s_opt[:, None], 1e-12), t_all)

        # reference keyframe per point: the valid observation with the
        # smallest frame id (the first observer, MapPoint::mpRefKF's role)
        obs_kf = np.asarray(m.obs_kf)
        obs_pt = np.asarray(m.obs_pt)
        obs_ok = (np.asarray(m.obs_valid) & kf_valid[obs_kf]
                  & np.asarray(m.pt_valid)[obs_pt])
        P = m.point_capacity
        big = np.int64(1 << 60)
        keyed = np.where(obs_ok, frame_ids[obs_kf].astype(np.int64) * P
                         + obs_kf.astype(np.int64), big)
        ref_key = np.full(P, big, np.int64)
        np.minimum.at(ref_key, obs_pt, keyed)
        has_ref = ref_key < big
        ref_kf = (ref_key % P).astype(np.int32)
        ref_kf[~has_ref] = 0

        # Points were NOT manually pre-corrected, so every point's current
        # world coordinates are consistent with S_pre of its reference
        # keyframe; the total correction is therefore S_opt^-1 o S_pre
        # uniformly (the manual group correction is already inside S_init
        # and hence inside S_opt — see module docstring).
        ref_idx = jnp.asarray(ref_kf)
        corr = sim3_compose(
            sim3_inverse(Sim3(s=S_opt.s[ref_idx], R=S_opt.R[ref_idx],
                              t=S_opt.t[ref_idx])),
            Sim3(s=S_pre.s[ref_idx], R=S_pre.R[ref_idx],
                 t=S_pre.t[ref_idx]),
        )
        # per-point transform: point p moves by ITS OWN corr_p (not
        # sim3_apply, whose [..., N, 3] contract would broadcast every
        # transform against every point)
        moved = (corr.s[:, None]
                 * jnp.einsum("pij,pj->pi", corr.R, m.pts) + corr.t)
        do_move = jnp.asarray(has_ref) & m.pt_valid
        new_pts = jnp.where(do_move[:, None], moved, m.pts)

        m = m._replace(
            kf_R=jnp.asarray(new_R.astype(np.float32)),
            kf_t=jnp.asarray(new_t.astype(np.float32)),
            pts=new_pts,
        )
        self._groups.clear()
        self.last_closed_frame_id = int(frame_ids[cur])
        return m, {
            "loop_edges": E,
            "loop_fused": n_fused,
            "loop_cost0": float(res.cost0),
            "loop_cost": float(res.cost),
        }

    # ------------------------------------------------------------------
    def on_keyframe(self, m: SlamMap, kf_db: KeyframeDatabase,
                    slot: int) -> Tuple[SlamMap, dict]:
        """Full pipeline; returns the (possibly corrected) map + metrics."""
        tcfg = self.cfg.tracker
        cur_fid = int(np.asarray(m.kf_frame_id)[slot])
        if cur_fid - self.last_closed_frame_id < tcfg.loop_min_frame_gap:
            return m, {"loop": "cooldown"}
        cands = self.detect(m, kf_db, slot)
        implicit = (
            {"loop_implicit_revisit": self.last_implicit_revisit}
            if self.last_implicit_revisit else {})
        if not cands:
            return m, {"loop": "no candidate", **implicit}
        # try every consistent candidate until one survives the Sim(3)
        # gauntlet (LoopClosing::ComputeSim3 iterates nInitialCandidates)
        sim3 = None
        reasons = []
        for cand in cands[:tcfg.loop_max_sim3_candidates]:
            sim3 = self.compute_sim3(m, slot, cand)
            if sim3 is not None:
                break
            reasons.append(f"{cand}[{self.last_sim3_reason}]")
        if sim3 is None:
            return m, {"loop": ("candidates rejected by Sim(3): "
                                + "; ".join(reasons)), **implicit}
        Scm, n_inl = sim3
        m, info = self.correct(m, slot, cand, Scm)
        info.update({"loop": f"closed with kf {cand}",
                     "loop_inliers": n_inl,
                     "loop_scale": float(Scm.s)})
        if tcfg.loop_global_ba_iterations > 0:
            m, gba = self.global_ba(m)
            info.update(gba)
        return m, info

    # ------------------------------------------------------------------
    def global_ba(self, m: SlamMap) -> Tuple[SlamMap, dict]:
        """Full-map bundle adjustment after a loop correction — ORB-SLAM's
        ``RunGlobalBundleAdjustment`` (``LoopClosing.cc``), which polishes
        the essential-graph solution jointly over every keyframe and map
        point. All valid keyframes are free except the oldest (the gauge
        anchor, ORB-SLAM fixes keyframe id 0); ``max_free_cams=None``
        materializes the Schur coupling over the whole keyframe axis,
        which at these capacities is tens of MB and rides the MXU.
        """
        from ..optim.ba import bundle_adjust
        from .map import apply_ba_result

        tcfg = self.cfg.tracker
        kf_valid = np.asarray(m.kf_valid)
        fids = np.asarray(m.kf_frame_id)
        fixed = ~kf_valid
        vs = np.where(kf_valid)[0]
        if len(vs) == 0:
            return m, {}
        fixed[vs[np.argmin(fids[vs])]] = True
        res = bundle_adjust(
            m.kf_R, m.kf_t, m.pts,
            m.obs_kf, m.obs_pt, m.obs_uv, m.obs_inv_sigma2, m.obs_valid,
            jnp.asarray(fixed), m.pt_valid, self.K,
            iterations=tcfg.loop_global_ba_iterations,
            max_free_cams=None,
            early_stop_rel=tcfg.ba_early_stop_rel,
            segment_mode=tcfg.ba_segment_mode,
        )
        return apply_ba_result(m, res), {
            "gba_cost0": float(res.cost0),
            "gba_cost": float(res.cost),
            "gba_inlier_obs": int(res.obs_inlier.sum()),
        }
