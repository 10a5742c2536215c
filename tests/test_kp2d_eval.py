"""2D reprojection eval (config 3) tests."""

import numpy as np

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.data.datasets import SyntheticImageDataset
from human_3d_reconstruction_tpu.data.preprocess import transform_keypoints
from human_3d_reconstruction_tpu.eval.kp2d import (
    kp2d_batches_from_dataset,
    run_kp2d_eval,
)


class TestKp2DEval:
    def test_oracle_predictor_scores_perfect(self, smpl_model):
        ds = SyntheticImageDataset(smpl_model, n=8, seed=0)
        batches = list(kp2d_batches_from_dataset(ds, batch_size=4))

        def oracle(images, centers, scales):
            # GT keypoints mapped to crop coords — exactly what eval expects.
            i = oracle.call
            oracle.call += 1
            b = batches[i]
            return jax.vmap(transform_keypoints)(
                jnp.asarray(b.kp2d[:, :, :2]),
                jnp.asarray(b.centers),
                jnp.asarray(b.scales),
            )

        oracle.call = 0
        report = run_kp2d_eval(oracle, iter(batches))
        assert report.num_samples == 8
        assert report.mean_l1 < 1e-6
        assert report.pck["pck@0.05"] == 1.0

    def test_offset_predictor_measured(self, smpl_model):
        ds = SyntheticImageDataset(smpl_model, n=4, seed=0)
        batches = list(kp2d_batches_from_dataset(ds, batch_size=4))

        def off(images, centers, scales):
            b = batches[0]
            gt = jax.vmap(transform_keypoints)(
                jnp.asarray(b.kp2d[:, :, :2]),
                jnp.asarray(b.centers),
                jnp.asarray(b.scales),
            )
            return gt + 0.07  # beyond pck@0.05 (L2 dist ~0.099), inside 0.2

        report = run_kp2d_eval(off, iter(batches))
        assert report.pck["pck@0.05"] == 0.0
        assert report.pck["pck@0.2"] == 1.0
        assert np.isclose(report.mean_l1, 0.14, atol=1e-5)  # L1 sum of |0.07|*2
