"""Loss unit tests: masking semantics, LSGAN values, rotmat param distance."""

import numpy as np
import jax.numpy as jnp

from human_3d_reconstruction_tpu.train import (
    adversarial_d_loss,
    adversarial_g_loss,
    joints_3d_loss,
    keypoint_2d_loss,
    smpl_param_loss,
)

import pytest

pytestmark = pytest.mark.fast  # pre-commit lane: `pytest -m fast` (<5 min warm)


class TestKeypoint2D:
    def test_zero_when_equal(self, rng):
        kp = jnp.asarray(rng.normal(size=(2, 14, 2)).astype(np.float32))
        vis = jnp.ones((2, 14))
        assert float(keypoint_2d_loss(kp, kp, vis)) == 0.0

    def test_visibility_excludes(self):
        pred = jnp.zeros((1, 2, 2))
        gt = jnp.asarray([[[0.0, 0.0], [5.0, 0.0]]])
        vis_all = jnp.ones((1, 2))
        vis_first = jnp.asarray([[1.0, 0.0]])
        assert np.isclose(float(keypoint_2d_loss(pred, gt, vis_all)), 2.5)
        assert float(keypoint_2d_loss(pred, gt, vis_first)) == 0.0

    def test_empty_mask_safe(self):
        pred = jnp.ones((1, 2, 2))
        assert float(keypoint_2d_loss(pred, pred * 2, jnp.zeros((1, 2)))) == 0.0


class TestJoints3D:
    def test_translation_invariant(self, rng):
        gt = jnp.asarray(rng.normal(size=(2, 14, 3)).astype(np.float32))
        pred = gt + 7.0  # constant offset, removed by centering
        assert float(joints_3d_loss(pred, gt, jnp.ones((2,)))) < 1e-8

    def test_has3d_mask(self, rng):
        gt = jnp.asarray(rng.normal(size=(2, 14, 3)).astype(np.float32))
        pred = gt.at[0].add(jnp.asarray(rng.normal(size=(14, 3)).astype(np.float32)))
        only_second = jnp.asarray([0.0, 1.0])
        assert float(joints_3d_loss(pred, gt, only_second)) < 1e-8


class TestSMPLParamLoss:
    def test_angle_wraparound_is_free(self):
        """theta and theta + 2pi*axis are the same rotation -> zero loss."""
        theta = jnp.zeros((1, 72)).at[0, 3].set(0.5)
        theta_wrapped = theta.at[0, 3].add(2 * np.pi)
        beta = jnp.zeros((1, 10))
        loss = float(
            smpl_param_loss(theta, beta, theta_wrapped, beta, jnp.ones((1,)))
        )
        assert loss < 1e-6, loss

    def test_mask(self, rng):
        t1 = jnp.asarray(rng.normal(scale=0.3, size=(1, 72)).astype(np.float32))
        t2 = jnp.asarray(rng.normal(scale=0.3, size=(1, 72)).astype(np.float32))
        b = jnp.zeros((1, 10))
        assert float(smpl_param_loss(t1, b, t2, b, jnp.zeros((1,)))) == 0.0
        assert float(smpl_param_loss(t1, b, t2, b, jnp.ones((1,)))) > 0.0


class TestAdversarial:
    def test_lsgan_values(self):
        perfect_fake = jnp.ones((2, 25))
        assert float(adversarial_g_loss(perfect_fake)) == 0.0
        assert np.isclose(float(adversarial_g_loss(jnp.zeros((2, 25)))), 25.0)
        real = jnp.ones((2, 25))
        fake = jnp.zeros((2, 25))
        assert float(adversarial_d_loss(real, fake)) == 0.0
        # Fooled discriminator: D(fake)=1 costs 25, D(real)=1 costs 0.
        assert np.isclose(float(adversarial_d_loss(real, real)), 25.0)
