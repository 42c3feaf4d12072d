#!/usr/bin/env python
"""Vocabulary scale study: place recognition on HELD-OUT scenes.

VERDICT r3 #4: the shipped 10k-word vocabulary left loop-detection /
relocalization recall at scene diversity unevidenced. This measures it,
10k (k=10, L=4) vs 100k (k=10, L=5) words, on worlds never seen by
either training corpus:

- W held-out scenes; for each, a DB view and a QUERY view of the same
  place from a different pose (yaw + translation offset) -> recall@1 =
  fraction of queries whose top-scoring database entry is their own
  scene (the DetectLoop/Relocalization candidate step,
  ``TemplatedDatabase.h`` query semantics).
- W distractor scenes with NO database entry, queried identically ->
  the acceptance threshold tau is set to reject 95% of distractors
  (the loop pipeline's score gate stands in for ORB-SLAM's
  minScore-of-covisible-neighbours normalization); recall@tau is the
  usable loop/reloc recall at that operating point.
- ORBvoc text interchange round-trip on the new artifact
  (``TemplatedVocabulary.h:229-265`` save/load equivalence).

Pure CPU (offline study). Usage:
  python scripts/vocab_recall_study.py [--worlds 24] [--out FILE]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=24)
    ap.add_argument("--out", default=None)
    ap.add_argument("--vocabs", nargs="*", default=[
        "orb_slam_tracking_tpu/data/orbvoc_synth_k10_L4.npz",
        "orb_slam_tracking_tpu/data/orbvoc_synth_k10_L5.npz",
    ])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from orb_slam_tracking_tpu.bow import load_vocabulary
    from orb_slam_tracking_tpu.bow.database import SCORINGS
    from orb_slam_tracking_tpu.bow.vocabulary import (
        load_orbvoc_text,
        save_orbvoc_text,
        transform,
    )
    from orb_slam_tracking_tpu.config import CameraConfig, OrbConfig
    from orb_slam_tracking_tpu.ops.extractor import orb_extract
    from orb_slam_tracking_tpu.utils.synthetic import CornerField, render_frame

    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    ocfg = OrbConfig(n_features=1000)
    ex = jax.jit(lambda im: orb_extract(im, ocfg))

    def pose(yaw_deg, cx_, cz_):
        yaw = np.radians(yaw_deg)
        Rwc = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                        [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
        R = Rwc.T
        t = -R @ np.array([cx_, 0.0, cz_], np.float32)
        return R, t

    def view(field, yaw_deg, cx_, cz_):
        R, t = pose(yaw_deg, cx_, cz_)
        img = render_frame(field, cam, R, t)
        kps = ex(jnp.asarray(img, jnp.float32))
        return kps.desc, kps.valid

    # held-out scenes: seeds disjoint from every training corpus
    # (training used seed 0's stream; these start at 50_000)
    W = args.worlds
    db_feats, q_feats, dis_feats = [], [], []
    for i in range(W):
        rng = np.random.default_rng(50_000 + i)
        field = CornerField(rng, n=700, x=(-5.5, 5.5), y=(-3.5, 3.5),
                            z=(3.0, 10.0))
        db_feats.append(view(field, 0.0, 0.0, 0.0))
        # same place, different pose: 5 deg yaw + 0.25 m sideways
        q_feats.append(view(field, 5.0, -0.25, 0.05))
        rng_d = np.random.default_rng(90_000 + i)
        field_d = CornerField(rng_d, n=700, x=(-5.5, 5.5), y=(-3.5, 3.5),
                              z=(3.0, 10.0))
        dis_feats.append(view(field_d, 0.0, 0.0, 0.0))

    results = []
    for vpath in args.vocabs:
        voc = load_vocabulary(vpath)
        tf = jax.jit(lambda d, v: transform(voc, d, v))

        def bowvec(feats):
            return np.stack([np.asarray(tf(d, v)[1]) for d, v in feats])

        t0 = time.time()
        db = bowvec(db_feats)
        qv = bowvec(q_feats)
        dv = bowvec(dis_feats)
        t_transform = (time.time() - t0) / (3 * W)

        score = SCORINGS["l1"]
        dbj = jnp.asarray(db)
        S = np.stack([np.asarray(score(jnp.asarray(q), dbj)) for q in qv])
        Sd = np.stack([np.asarray(score(jnp.asarray(q), dbj)) for q in dv])
        top1 = S.argmax(1)
        recall1 = float((top1 == np.arange(W)).mean())
        # operating point: tau rejects 95% of distractors' best scores
        tau = float(np.quantile(Sd.max(1), 0.95))
        hits = (top1 == np.arange(W)) & (S.max(1) > tau)
        recall_at_tau = float(hits.mean())
        margin = float((np.sort(S, 1)[:, -1] - np.sort(S, 1)[:, -2]).mean())
        results.append({
            "vocab": os.path.basename(vpath),
            "n_words": int(voc.n_words),
            "recall_at_1": round(recall1, 3),
            "tau_reject95_distractors": round(tau, 4),
            "recall_at_tau": round(recall_at_tau, 3),
            "mean_top1_top2_margin": round(margin, 4),
            "transform_ms_per_frame": round(t_transform * 1e3, 1),
            "worlds": W,
        })
        print(json.dumps(results[-1]))

    # ORBvoc text round-trip on the LARGEST artifact
    big = max(args.vocabs, key=lambda p: load_vocabulary(p).n_words)
    voc = load_vocabulary(big)
    tmp = "/tmp/orbvoc_roundtrip.txt"
    save_orbvoc_text(voc, tmp)
    voc2 = load_orbvoc_text(tmp)
    d, v = db_feats[0]
    w1, b1 = transform(voc, d, v)
    w2, b2 = transform(voc2, d, v)
    rt_ok = bool(np.array_equal(np.asarray(w1), np.asarray(w2))
                 and np.allclose(np.asarray(b1), np.asarray(b2), atol=1e-6))
    results.append({"orbvoc_text_roundtrip": rt_ok,
                    "vocab": os.path.basename(big),
                    "text_bytes": os.path.getsize(tmp)})
    print(json.dumps(results[-1]))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
