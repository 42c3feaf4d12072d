"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so sharded code paths are exercised
without TPU hardware (SURVEY.md §4).

NOTE: this environment pre-registers an `axon` TPU backend via sitecustomize
and sets JAX_PLATFORMS=axon, so env-var overrides in conftest are too late —
we must flip the platform through jax.config before any backend is
initialized (importing jax is fine; calling jax.devices() is not).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
INIT_IMAGES = [
    os.path.join(REFERENCE_DIR, "demo/initImages/frame_01425127694_0544666611.png"),
    os.path.join(REFERENCE_DIR, "demo/initImages/frame_01425127694_0677999943.png"),
]


@pytest.fixture(scope="session")
def init_images():
    """The reference's bundled two-view init fixture images (read in place,
    never copied into this repo)."""
    if not all(os.path.exists(p) for p in INIT_IMAGES):
        pytest.skip("reference initImages not available")
    from orb_slam_tracking_tpu.io import load_gray

    return [load_gray(p) for p in INIT_IMAGES]


@pytest.fixture()
def rng():
    # function-scoped: every test draws the same sequence regardless of
    # execution order
    return np.random.default_rng(0)
