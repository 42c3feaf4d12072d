"""Place-recognition quality of the bundled corpus vocabulary.

The reference workflow ships a pretrained large ORBvoc because a small
vocabulary cannot separate genuine revisits from same-scene distractor
views. The bundled 10k-word corpus artifact
(data/orbvoc_synth_k10_L4.npz, examples/train_vocabulary.py) must beat
the 512-word one-frame fallback at exactly that task.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.bow.database import (
    add_keyframe,
    empty_database,
    query,
)
from orb_slam_tracking_tpu.bow.vocabulary import (
    build_vocabulary,
    load_vocabulary,
    transform,
)
from orb_slam_tracking_tpu.config import CameraConfig, OrbConfig
from orb_slam_tracking_tpu.utils.synthetic import CornerField, render_frame

BUNDLED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "orb_slam_tracking_tpu", "data", "orbvoc_synth_k10_L4.npz")


def _look(yaw_deg, cw):
    yaw = np.radians(yaw_deg)
    Rwc = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                    [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    R = Rwc.T
    return R, (-R @ np.asarray(cw, np.float32))


@pytest.mark.skipif(not os.path.exists(BUNDLED),
                    reason="bundled vocabulary not built")
def test_bundled_vocab_separates_revisit_from_distractors(rng):
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    field = CornerField(rng, n=700, x=(-6.0, 6.0))
    ref_pose = _look(0.0, [0.0, 0.0, 0.0])
    # revisit: same place, small offset; distractors: same scene, other
    # viewpoints (the hard negatives one-frame vocabularies confuse)
    revisit = _look(1.0, [0.04, 0.01, -0.03])
    distractors = [
        _look(18.0, [1.0, 0.2, 0.4]),
        _look(-15.0, [-1.2, -0.1, 0.3]),
        _look(30.0, [2.0, 0.0, 0.8]),
        _look(-28.0, [-2.0, 0.2, 1.0]),
    ]
    ocfg = OrbConfig(n_features=1000)
    ex = jax.jit(lambda im: __import__(
        "orb_slam_tracking_tpu.ops.extractor", fromlist=["orb_extract"]
    ).orb_extract(im, ocfg))

    def kps_of(pose):
        return ex(jnp.asarray(render_frame(field, cam, *pose)))

    k_ref = kps_of(ref_pose)
    k_rev = kps_of(revisit)
    k_dis = [kps_of(p) for p in distractors]

    big = load_vocabulary(BUNDLED)
    small = build_vocabulary(
        np.asarray(k_ref.desc)[np.asarray(k_ref.valid)], k=8, depth=3,
        seed=0)

    def margin(voc):
        """revisit score minus best distractor score against the ref."""
        _, b_ref = transform(voc, k_ref.desc, k_ref.valid)
        db = add_keyframe(empty_database(8, voc.n_words), 0, b_ref)
        for i, k in enumerate(k_dis):
            _, b = transform(voc, k.desc, k.valid)
            db = add_keyframe(db, i + 1, b)
        _, b_rev = transform(voc, k_rev.desc, k_rev.valid)
        sc = np.asarray(query(db, b_rev))[: 1 + len(k_dis)]
        return float(sc[0] - sc[1:].max()), sc

    m_big, sc_big = margin(big)
    m_small, sc_small = margin(small)
    # the revisit must win outright with the corpus vocabulary...
    assert np.argmax(sc_big) == 0, sc_big
    assert m_big > 0
    # ...and separate revisits from distractors more strongly than the
    # one-frame 512-word fallback
    assert m_big > m_small, (sc_big, sc_small)