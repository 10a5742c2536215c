"""Test-time fitting: refinement recovers perturbed parameters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
from human_3d_reconstruction_tpu.fitting import refine_params
from human_3d_reconstruction_tpu.smpl.forward import smpl_forward
from human_3d_reconstruction_tpu.utils.geometry import orthographic_project


@pytest.fixture(scope="module")
def fit_problem(smpl_model):
    """GT pose -> its 2D keypoints; start from a perturbed pose."""
    rng = np.random.default_rng(7)
    B = 2
    theta_gt = jnp.asarray(rng.normal(0, 0.4, (B, 72)).astype(np.float32))
    beta_gt = jnp.asarray(rng.normal(0, 0.5, (B, 10)).astype(np.float32))
    cam = jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]), (B, 1))

    params = {k: jnp.asarray(v) for k, v in smpl_model.as_dict().items()}
    out = smpl_forward(params, theta_gt, beta_gt)
    kp2d = orthographic_project(out.eval_joints[:, :NUM_KP], cam)
    vis = jnp.ones((B, NUM_KP))

    theta_init = theta_gt + jnp.asarray(
        rng.normal(0, 0.15, (B, 72)).astype(np.float32)
    )
    return params, theta_gt, beta_gt, cam, kp2d, vis, theta_init


class TestFitting:
    def test_refinement_reduces_reprojection_error(self, fit_problem):
        params, theta_gt, beta_gt, cam, kp2d, vis, theta_init = fit_problem

        def reproj_err(theta, beta, c):
            out = smpl_forward(params, theta, beta)
            pred = orthographic_project(out.eval_joints[:, :NUM_KP], c)
            return float(jnp.mean(jnp.abs(pred - kp2d)))

        before = reproj_err(theta_init, beta_gt, cam)
        result = refine_params(
            params, theta_init, beta_gt, cam, kp2d, vis,
            num_steps=60, lr=0.02, lambda_prior_theta=0.0,
        )
        after = reproj_err(result.theta, result.beta, result.cam)
        assert after < before * 0.5, (before, after)

    def test_loss_monotone_ish(self, fit_problem):
        params, theta_gt, beta_gt, cam, kp2d, vis, theta_init = fit_problem
        result = refine_params(
            params, theta_init, beta_gt, cam, kp2d, vis, num_steps=40
        )
        hist = np.asarray(result.loss_history)
        assert hist[-1] < hist[0]
        assert np.all(np.isfinite(hist))

    def test_frozen_beta_and_cam(self, fit_problem):
        params, theta_gt, beta_gt, cam, kp2d, vis, theta_init = fit_problem
        result = refine_params(
            params, theta_init, beta_gt, cam, kp2d, vis,
            num_steps=10, fit_beta=False, fit_cam=False,
        )
        np.testing.assert_array_equal(np.asarray(result.beta), np.asarray(beta_gt))
        np.testing.assert_array_equal(np.asarray(result.cam), np.asarray(cam))

    def test_jit_wrappable(self, fit_problem):
        params, theta_gt, beta_gt, cam, kp2d, vis, theta_init = fit_problem

        fit = jax.jit(
            lambda t, b, c: refine_params(
                params, t, b, c, kp2d, vis, num_steps=5
            ).theta
        )
        out = fit(theta_init, beta_gt, cam)
        assert out.shape == theta_init.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_visibility_masking(self, fit_problem):
        """Invisible joints don't pull: masked fit ignores corrupted kp."""
        params, theta_gt, beta_gt, cam, kp2d, vis, theta_init = fit_problem
        kp_bad = kp2d.at[:, 0].set(100.0)  # corrupt one joint
        vis_masked = vis.at[:, 0].set(0.0)
        r = refine_params(
            params, theta_init, beta_gt, cam, kp_bad, vis_masked, num_steps=30
        )
        # loss must still decrease and not explode chasing the corrupt joint
        hist = np.asarray(r.loss_history)
        assert hist[-1] < hist[0]
        assert float(jnp.abs(r.theta).max()) < 10.0


class TestMaskSupervision:
    def test_silhouette_term_recovers_camera_shift(self, smpl_model):
        """Mask-only objective: a shifted camera is pulled back toward the
        target silhouette (gradients flow through the soft rasterizer)."""
        from human_3d_reconstruction_tpu.viz.device_raster import silhouette

        rng = np.random.default_rng(11)
        B, Hm = 1, 48
        theta = jnp.asarray(rng.normal(0, 0.2, (B, 72)).astype(np.float32))
        beta = jnp.zeros((B, 10))
        cam_gt = jnp.asarray([[0.9, 0.0, 0.0]])
        params = {k: jnp.asarray(v) for k, v in smpl_model.as_dict().items()}
        faces = jnp.asarray(np.asarray(smpl_model.faces), jnp.int32)

        def hard_mask(cm):
            out = smpl_forward(params, theta, beta)
            v2d = orthographic_project(out.verts, cm)
            vpx = jnp.stack(
                [
                    (v2d[..., 0] + 1.0) * 0.5 * Hm,
                    (v2d[..., 1] + 1.0) * 0.5 * Hm,
                    out.verts[..., 2],
                ],
                axis=-1,
            )[0]
            return silhouette(vpx, faces, Hm, Hm)[None]

        target = hard_mask(cam_gt)
        cam_bad = jnp.asarray([[0.9, 0.25, 0.0]])  # shifted right

        result = refine_params(
            params, theta, beta, cam_bad,
            kp2d=jnp.zeros((B, NUM_KP, 2)), vis=jnp.zeros((B, NUM_KP)),
            num_steps=30, lr=0.03, lambda_kp=0.0, lambda_prior_theta=0.0,
            lambda_prior_beta=0.0, fit_beta=False,
            masks=target, lambda_mask=1.0, mask_sharpness=2.0,
        )
        err0 = float(jnp.abs(cam_bad[0, 1] - cam_gt[0, 1]))
        err1 = float(jnp.abs(result.cam[0, 1] - cam_gt[0, 1]))
        assert err1 < err0 * 0.5, (err0, err1)
        assert float(result.loss_history[-1]) < float(result.loss_history[0])


class TestClipRefinement:
    """Temporal bundle refinement (fitting.refine_clip_params)."""

    @pytest.fixture(scope="class")
    def clip_problem(self, smpl_model):
        """A smooth GT trajectory + per-frame jittered regressions of it."""
        rng = np.random.default_rng(11)
        F = 12
        params = {k: jnp.asarray(v) for k, v in smpl_model.as_dict().items()}
        # Smooth trajectory: linear interpolation between two poses.
        t0 = rng.normal(0, 0.3, (72,)).astype(np.float32)
        t1 = t0 + rng.normal(0, 0.25, (72,)).astype(np.float32)
        w = np.linspace(0.0, 1.0, F, dtype=np.float32)[:, None]
        theta_gt = jnp.asarray((1 - w) * t0 + w * t1)
        beta_gt = jnp.asarray(
            np.tile(rng.normal(0, 0.5, (1, 10)).astype(np.float32), (F, 1))
        )
        cam = jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]), (F, 1))
        # Per-frame regression noise (what frame-wise HMR produces).
        theta_noisy = theta_gt + jnp.asarray(
            rng.normal(0, 0.06, (F, 72)).astype(np.float32)
        )
        beta_noisy = beta_gt + jnp.asarray(
            rng.normal(0, 0.3, (F, 10)).astype(np.float32)
        )
        return params, theta_gt, beta_gt, cam, theta_noisy, beta_noisy

    @staticmethod
    def _joints(params, theta, beta):
        from human_3d_reconstruction_tpu.smpl.forward import smpl_forward

        return smpl_forward(params, theta, beta).eval_joints[:, :NUM_KP]

    def test_pure_temporal_fit_reduces_accel_error(self, clip_problem):
        from human_3d_reconstruction_tpu.eval.metrics import accel_error_mm
        from human_3d_reconstruction_tpu.fitting import refine_clip_params

        params, theta_gt, beta_gt, cam, theta_noisy, beta_noisy = clip_problem
        j_gt = self._joints(params, theta_gt, beta_gt)
        before = float(
            accel_error_mm(self._joints(params, theta_noisy, beta_noisy), j_gt)
        )
        fit = refine_clip_params(
            params, theta_noisy, beta_noisy, cam, num_steps=40
        )
        after = float(accel_error_mm(self._joints(params, fit.theta, fit.beta), j_gt))
        assert after < before * 0.5, (before, after)
        # ...and the fit must not drift away from the GT trajectory: the
        # positional error stays no worse than the noisy input's.
        err_before = float(
            jnp.mean(
                jnp.linalg.norm(
                    self._joints(params, theta_noisy, beta_noisy) - j_gt, axis=-1
                )
            )
        )
        err_after = float(
            jnp.mean(
                jnp.linalg.norm(
                    self._joints(params, fit.theta, fit.beta) - j_gt, axis=-1
                )
            )
        )
        assert err_after < err_before * 1.1, (err_before, err_after)

    def test_shared_beta_recovers_constant_shape(self, clip_problem):
        from human_3d_reconstruction_tpu.fitting import refine_clip_params

        params, theta_gt, beta_gt, cam, theta_noisy, beta_noisy = clip_problem
        fit = refine_clip_params(
            params, theta_noisy, beta_noisy, cam, num_steps=40
        )
        # One shape for the whole clip, closer to the true (constant) beta
        # than the per-frame average deviation of the noisy stream.
        assert np.ptp(np.asarray(fit.beta), axis=0).max() < 1e-6
        err_noisy = float(jnp.mean(jnp.abs(beta_noisy - beta_gt)))
        err_fit = float(jnp.mean(jnp.abs(fit.beta - beta_gt)))
        assert err_fit < err_noisy, (err_noisy, err_fit)

    def test_kp_anchored_fit_reduces_reprojection(self, clip_problem):
        from human_3d_reconstruction_tpu.fitting import refine_clip_params
        from human_3d_reconstruction_tpu.utils.geometry import (
            orthographic_project,
        )

        params, theta_gt, beta_gt, cam, theta_noisy, beta_noisy = clip_problem
        kp2d = orthographic_project(self._joints(params, theta_gt, beta_gt), cam)
        vis = jnp.ones(kp2d.shape[:2])

        def reproj(theta, beta, cm):
            pred = orthographic_project(self._joints(params, theta, beta), cm)
            return float(jnp.mean(jnp.abs(pred - kp2d)))

        before = reproj(theta_noisy, beta_noisy, cam)
        fit = refine_clip_params(
            params, theta_noisy, beta_noisy, cam, kp2d=kp2d, vis=vis,
            num_steps=60,
        )
        after = reproj(fit.theta, fit.beta, fit.cam)
        assert after < before * 0.6, (before, after)

    def test_jit_wrappable(self, clip_problem):
        import jax

        from human_3d_reconstruction_tpu.fitting import refine_clip_params

        params, _, _, cam, theta_noisy, beta_noisy = clip_problem
        fn = jax.jit(
            lambda t, b, c: refine_clip_params(params, t, b, c, num_steps=3)
        )
        out = fn(theta_noisy, beta_noisy, cam)
        assert out.theta.shape == theta_noisy.shape
        assert np.isfinite(np.asarray(out.loss_history)).all()
