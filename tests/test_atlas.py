"""Atlas-fused extraction must be bit-identical to the per-level path.

The atlas path (ops/atlas.py) packs all pyramid levels into one canvas so
the heavy stages run once; every read stencil stays inside the owning
block's own reflect apron, so outputs must match the round-1 per-level
path exactly — not approximately (see the exactness argument in the
module docstring)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.config import OrbConfig
from orb_slam_tracking_tpu.ops.atlas import atlas_layout, build_atlas, orb_extract_atlas
from orb_slam_tracking_tpu.ops.extractor import orb_extract
from orb_slam_tracking_tpu.ops.pattern import EDGE_THRESHOLD
from orb_slam_tracking_tpu.ops.pyramid import build_pyramid


@pytest.fixture(scope="module")
def noise_image(rng_module=None):
    r = np.random.default_rng(7)
    # smooth-ish noise: enough texture for corners at every level
    img = r.uniform(0, 255, (480, 640)).astype(np.float32)
    return jnp.asarray(img)


def test_layout_geometry():
    cfg = OrbConfig(n_features=1000)
    lay = atlas_layout(480, 640, cfg)
    assert len(lay.level_shapes) == cfg.n_levels
    assert lay.canvas_w % 128 == 0
    # blocks tile the canvas height exactly, in order
    row = 0
    for (hl, wl), off in zip(lay.level_shapes, lay.row_offsets):
        assert off == row
        row += hl + 2 * EDGE_THRESHOLD
    assert row == lay.canvas_h
    # eligible regions of consecutive levels are >= both cell sizes apart
    # (the safety property the canvas-wide passes rely on)
    for i in range(cfg.n_levels - 1):
        gap = (lay.row_offsets[i + 1] + EDGE_THRESHOLD + 16) - (
            lay.row_offsets[i] + EDGE_THRESHOLD + lay.level_shapes[i][0] - 16
        )
        assert gap >= max(cfg.fast_cell_size, cfg.select_cell_size)


def test_atlas_blocks_equal_pyramid(noise_image):
    cfg = OrbConfig(n_features=500)
    lay = atlas_layout(*noise_image.shape, cfg)
    canvas = np.asarray(build_atlas(noise_image, cfg))
    levels = build_pyramid(noise_image, cfg)
    for (hl, wl), off, lvl in zip(lay.level_shapes, lay.row_offsets, levels):
        block = canvas[off: off + hl + 2 * EDGE_THRESHOLD,
                       : wl + 2 * EDGE_THRESHOLD]
        np.testing.assert_array_equal(block, np.asarray(lvl))
        # right margin is zero
        assert (canvas[off: off + hl + 2 * EDGE_THRESHOLD,
                       wl + 2 * EDGE_THRESHOLD:] == 0).all()


@pytest.mark.parametrize("n_features", [500, 2000])
def test_atlas_extraction_bit_identical(noise_image, n_features):
    cfg_pl = OrbConfig(n_features=n_features, use_atlas=False)
    cfg_at = dataclasses.replace(cfg_pl, use_atlas=True)
    # both through the jitted dispatcher: unjitted-vs-jitted differs in the
    # last float bit (XLA fusion rounding), which is not what's under test
    ref = orb_extract(noise_image, cfg_pl)
    got = orb_extract(noise_image, cfg_at)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(got.xy), np.asarray(ref.xy))
    np.testing.assert_array_equal(np.asarray(got.octave), np.asarray(ref.octave))
    np.testing.assert_array_equal(
        np.asarray(got.angle_deg), np.asarray(ref.angle_deg)
    )
    np.testing.assert_array_equal(np.asarray(got.desc), np.asarray(ref.desc))
    np.testing.assert_array_equal(
        np.asarray(got.response), np.asarray(ref.response)
    )


def test_atlas_on_reference_image(init_images):
    # non-square fixture (752x480): layout + extraction stay consistent
    cfg = OrbConfig(n_features=1000)
    ref = orb_extract(jnp.asarray(init_images[0]),
                      dataclasses.replace(cfg, use_atlas=False))
    got = orb_extract(jnp.asarray(init_images[0]), cfg)
    np.testing.assert_array_equal(np.asarray(got.desc), np.asarray(ref.desc))
    np.testing.assert_array_equal(np.asarray(got.xy), np.asarray(ref.xy))
    assert np.asarray(got.valid).sum() > 900
