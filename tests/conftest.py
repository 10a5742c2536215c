"""Test env: force the CPU backend with 8 virtual devices so sharding paths
are exercised without real multi-chip hardware (SURVEY.md section 4, item 6).

The image's sitecustomize force-registers the axon TPU platform at
interpreter boot and overrides JAX_PLATFORMS, so env vars alone don't stick;
``jax.config.update('jax_platforms', 'cpu')`` after import does (verified in
this environment). XLA_FLAGS must still be set before jax initializes its
backends, hence at module import time here.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is COMPILE-dominated on this 1-core
# host (~46 min, most of it re-building the same CPU executables every
# session). Measured (test_serving.py): 129 s uncached == 127 s first
# cached run (write overhead ~0) -> 52 s warm (2.5x); threshold 0.1 s beat
# 0.5 s (81 s warm) — small compiles dominate by count.
from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

configure_compile_cache(0.1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def smpl_model():
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

    return synthetic_smpl_model(seed=0)


@pytest.fixture()
def rng():
    """Fresh deterministic generator PER TEST.

    This was session-scoped — one mutable stream shared by ~130 tests —
    which made every consumer's inputs depend on how many earlier tests
    drew from it: adding an unrelated test shifted the stream and flipped
    a near-tolerance comparison (r4: test_fitting_mask_raster_tiled, two
    fp-identical-objective optimizer trajectories diverging). Function
    scope makes each test's inputs a pure function of its own code.
    """
    return np.random.default_rng(1234)
