"""Camera conversion tests: weak-perspective <-> perspective consistency."""

import numpy as np

import jax.numpy as jnp

from human_3d_reconstruction_tpu.utils.camera import (
    perspective_project,
    weak_perspective_to_translation,
)
from human_3d_reconstruction_tpu.utils.geometry import orthographic_project


class TestCameraConversion:
    def test_translation_depth_formula(self):
        cam = jnp.asarray([[0.9, 0.1, -0.2]])
        t = np.asarray(weak_perspective_to_translation(cam, focal_length=5000.0, img_size=224.0))
        assert np.isclose(t[0, 2], 2 * 5000.0 / (224.0 * 0.9))
        assert np.isclose(t[0, 0], 0.1) and np.isclose(t[0, 1], -0.2)

    def test_perspective_approaches_weak_perspective(self, rng):
        """For shallow bodies at the derived depth, the pinhole projection
        matches the weak-perspective projection mapped to pixels."""
        pts = rng.normal(scale=0.2, size=(1, 24, 3)).astype(np.float32)
        pts[..., 2] *= 0.01  # nearly planar -> weak-perspective regime
        cam = np.asarray([[0.8, 0.05, -0.1]], np.float32)

        weak = np.asarray(orthographic_project(jnp.asarray(pts), jnp.asarray(cam)))
        weak_px = (weak + 1.0) / 2.0 * 224.0  # crop coords -> pixels

        t = weak_perspective_to_translation(jnp.asarray(cam))
        persp_px = np.asarray(perspective_project(jnp.asarray(pts), t))

        np.testing.assert_allclose(persp_px, weak_px, atol=1.0)  # sub-pixel-ish
