"""Metric unit tests vs hand-computed / analytically-known cases.

SURVEY.md section 4 item 4: MPJPE/PA-MPJPE (incl. Procrustes) against
hand-computed small cases.
"""

import numpy as np
import jax.numpy as jnp

from human_3d_reconstruction_tpu.eval import (
    keypoint_2d_pck,
    mpjpe,
    pa_mpjpe,
    procrustes_align,
    root_align,
)
from human_3d_reconstruction_tpu.utils.geometry import rodrigues


class TestMPJPE:
    def test_zero_for_identical(self, rng):
        x = rng.normal(size=(4, 14, 3)).astype(np.float32)
        assert float(mpjpe(jnp.asarray(x), jnp.asarray(x))) < 1e-7

    def test_hand_computed(self):
        gt = jnp.zeros((1, 2, 3))
        pred = jnp.asarray([[[0.0, 0, 0], [3.0, 4.0, 0]]])  # dists 0 and 5 after root-align
        # root_index=0: both get root-subtracted, pred becomes [0, (3,4,0)]
        assert np.isclose(float(mpjpe(pred, gt)), 2.5)

    def test_translation_invariance_via_root_align(self, rng):
        x = rng.normal(size=(2, 14, 3)).astype(np.float32)
        shifted = x + rng.normal(size=(2, 1, 3)).astype(np.float32)
        assert float(mpjpe(jnp.asarray(shifted), jnp.asarray(x))) < 1e-5

    def test_mask(self):
        gt = jnp.zeros((1, 3, 3))
        pred = jnp.asarray([[[0, 0, 0], [1.0, 0, 0], [100.0, 0, 0]]])
        mask = jnp.asarray([[1.0, 1.0, 0.0]])
        assert np.isclose(float(mpjpe(pred, gt, mask=mask, root_index=None)), 0.5)

    def test_root_align(self):
        x = jnp.asarray([[[1.0, 2, 3], [4, 5, 6]]])
        out = np.asarray(root_align(x))
        np.testing.assert_allclose(out[0, 0], 0.0)
        np.testing.assert_allclose(out[0, 1], [3, 3, 3])


class TestProcrustes:
    def test_recovers_similarity_transform(self, rng):
        """pred = noisy similarity transform of gt -> PA-MPJPE ~ 0."""
        gt = rng.normal(size=(5, 14, 3)).astype(np.float32)
        R = np.asarray(rodrigues(jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))))
        scale = rng.uniform(0.5, 2.0, size=(5, 1, 1)).astype(np.float32)
        t = rng.normal(size=(5, 1, 3)).astype(np.float32)
        pred = scale * np.einsum("bij,bkj->bki", R, gt) + t
        err = float(pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
        assert err < 1e-5, err

    def test_reflection_not_allowed(self, rng):
        """Mirror-image pred must NOT align perfectly (det(R)=+1 enforced)."""
        gt = rng.normal(size=(1, 14, 3)).astype(np.float32)
        pred = gt * np.asarray([-1.0, 1.0, 1.0])  # reflection
        aligned = np.asarray(procrustes_align(jnp.asarray(pred), jnp.asarray(gt)))
        # Aligned result must still be a rotation of pred: check the implied
        # transform has positive determinant by verifying chirality preserved.
        err = float(pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
        assert err > 1e-3  # generic point clouds can't be mirror-aligned by rotation

    def test_pa_leq_mpjpe(self, rng):
        pred = rng.normal(size=(8, 14, 3)).astype(np.float32)
        gt = rng.normal(size=(8, 14, 3)).astype(np.float32)
        pa = float(pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
        raw = float(mpjpe(jnp.asarray(pred), jnp.asarray(gt), root_index=None))
        assert pa <= raw + 1e-6

    def test_batched_equals_loop(self, rng):
        pred = rng.normal(size=(4, 14, 3)).astype(np.float32)
        gt = rng.normal(size=(4, 14, 3)).astype(np.float32)
        batched = np.asarray(procrustes_align(jnp.asarray(pred), jnp.asarray(gt)))
        for i in range(4):
            single = np.asarray(
                procrustes_align(jnp.asarray(pred[i : i + 1]), jnp.asarray(gt[i : i + 1]))
            )[0]
            np.testing.assert_allclose(batched[i], single, atol=1e-5)


class TestPCK:
    def test_hand_computed(self):
        gt = jnp.zeros((1, 2, 2))
        pred = jnp.asarray([[[0.01, 0.0], [0.2, 0.0]]])
        assert np.isclose(float(keypoint_2d_pck(pred, gt, threshold=0.05)), 0.5)

    def test_visibility_mask(self):
        gt = jnp.zeros((1, 2, 2))
        pred = jnp.asarray([[[0.01, 0.0], [0.2, 0.0]]])
        vis = jnp.asarray([[1.0, 0.0]])
        assert np.isclose(float(keypoint_2d_pck(pred, gt, vis=vis, threshold=0.05)), 1.0)
