"""GMM pose prior: EM recovery, NLL semantics, grads, fitting integration.

Numerical truth for the mixture NLL is a direct numpy evaluation of the
Gaussian mixture density; the EM fit is checked by recovering a known
synthetic mixture (component means/weights up to permutation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.smpl.pose_prior import (
    BODY_DIM,
    PosePrior,
    fit_pose_prior,
    load_pose_prior,
    pose_nll,
    save_pose_prior,
)

pytestmark = pytest.mark.fast


def _two_cluster_pool(n_per=400, sigma=0.05, seed=0):
    """Two tight pose clusters around distinct anchors (72-d thetas)."""
    r = np.random.default_rng(seed)
    a = np.zeros(BODY_DIM, np.float32)
    b = np.zeros(BODY_DIM, np.float32)
    a[::3] = 0.8
    b[1::3] = -0.7
    poses = np.concatenate(
        [
            anchor + sigma * r.normal(size=(n_per, BODY_DIM)).astype(np.float32)
            for anchor in (a, b)
        ]
    )
    full = np.concatenate([np.zeros((poses.shape[0], 3), np.float32), poses], axis=1)
    return full, a, b


class TestFit:
    def test_em_recovers_two_clusters(self):
        pool, a, b = _two_cluster_pool()
        prior = fit_pose_prior(pool, num_components=2, num_iters=40, reg=1e-4)
        means = np.asarray(prior.means)
        # Match components to anchors by nearest distance (permutation-free).
        d = np.stack(
            [np.linalg.norm(means - anchor, axis=1) for anchor in (a, b)]
        )  # (2 anchors, 2 components)
        assert d.min(axis=1).max() < 0.05  # every anchor has a close component
        assert d.argmin(axis=1)[0] != d.argmin(axis=1)[1]
        # Equal-size clusters -> log_norm (weight + det) within a nat.
        ln = np.asarray(prior.log_norm)
        assert abs(ln[0] - ln[1]) < 1.0

    def test_max_pool_subsample_still_recovers(self):
        pool, a, b = _two_cluster_pool()
        prior = fit_pose_prior(
            pool, num_components=2, num_iters=40, reg=1e-4, max_pool=200
        )
        means = np.asarray(prior.means)
        d = np.stack([np.linalg.norm(means - anc, axis=1) for anc in (a, b)])
        assert d.min(axis=1).max() < 0.08

    def test_rejects_bad_dim_and_small_pool(self):
        with pytest.raises(ValueError, match="pose dim"):
            fit_pose_prior(np.zeros((10, 50), np.float32))
        with pytest.raises(ValueError, match="at least"):
            fit_pose_prior(np.zeros((3, 72), np.float32), num_components=8)


class TestNLL:
    @pytest.fixture(scope="class")
    def prior(self):
        pool, _, _ = _two_cluster_pool()
        return fit_pose_prior(pool, num_components=2, num_iters=40, reg=1e-4)

    def test_matches_numpy_mixture_density(self, prior):
        """logsumexp NLL == -log sum_k exp(log_norm_k - 0.5 maha_k), computed
        independently in numpy from the stored parameterization."""
        r = np.random.default_rng(1)
        theta = r.normal(scale=0.3, size=(5, 72)).astype(np.float32)
        ours = np.asarray(pose_nll(prior, jnp.asarray(theta)))

        means = np.asarray(prior.means)
        w = np.asarray(prior.prec_chol)
        ln = np.asarray(prior.log_norm)
        body = theta[:, 3:]
        lp = np.stack(
            [
                ln[k] - 0.5 * np.sum((w[k] @ (body - means[k]).T).T ** 2, axis=1)
                for k in range(means.shape[0])
            ],
            axis=1,
        )
        m = lp.max(axis=1, keepdims=True)
        ref = -(m[:, 0] + np.log(np.sum(np.exp(lp - m), axis=1)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_in_distribution_beats_outliers(self, prior):
        pool, a, _ = _two_cluster_pool(seed=9)
        inlier = jnp.asarray(pool[:8])
        outlier = jnp.asarray(
            np.concatenate(
                [np.zeros((8, 3), np.float32),
                 np.full((8, BODY_DIM), 2.5, np.float32)],
                axis=1,
            )
        )
        assert float(jnp.mean(pose_nll(prior, inlier))) < float(
            jnp.mean(pose_nll(prior, outlier))
        )

    def test_modes_and_grads(self, prior):
        theta = jnp.zeros((2, 72))
        for mode in ("logsumexp", "min"):
            f = jax.jit(lambda t: jnp.sum(pose_nll(prior, t, mode=mode)))
            g = jax.grad(f)(theta)
            assert np.isfinite(np.asarray(g)).all()
            # global rotation receives zero gradient (excluded from the prior)
            np.testing.assert_array_equal(np.asarray(g[:, :3]), 0.0)
        # min >= exact NLL always (it drops the other components' mass),
        # and for a near-single-mode point they are close.
        lse = np.asarray(pose_nll(prior, theta))
        mn = np.asarray(pose_nll(prior, theta, mode="min"))
        assert (mn >= lse - 1e-4).all()
        with pytest.raises(ValueError, match="unknown mode"):
            pose_nll(prior, theta, mode="sum")

    def test_accepts_69d_and_rejects_other(self, prior):
        v72 = jnp.zeros((2, 72))
        v69 = v72[:, 3:]
        np.testing.assert_allclose(
            np.asarray(pose_nll(prior, v72)), np.asarray(pose_nll(prior, v69))
        )
        with pytest.raises(ValueError, match="trailing dim"):
            pose_nll(prior, jnp.zeros((2, 70)))

    def test_save_load_roundtrip(self, prior, tmp_path):
        path = str(tmp_path / "prior.npz")
        save_pose_prior(path, prior)
        back = load_pose_prior(path)
        theta = jnp.asarray(
            np.random.default_rng(2).normal(scale=0.2, size=(4, 72)).astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(pose_nll(prior, theta)), np.asarray(pose_nll(back, theta))
        )


class TestAnglePrior:
    def test_flip_invariant(self):
        """The sign table must be mirror-consistent: flip_pose (L/R joint
        permutation + y/z negation) leaves the penalty unchanged."""
        from human_3d_reconstruction_tpu.smpl.pose_aug import flip_pose
        from human_3d_reconstruction_tpu.smpl.pose_prior import angle_prior

        theta = jnp.asarray(
            np.random.default_rng(3).normal(scale=0.5, size=(8, 72)).astype(np.float32)
        )
        np.testing.assert_allclose(
            np.asarray(angle_prior(theta)),
            np.asarray(angle_prior(flip_pose(theta))),
            rtol=1e-5,
        )

    def test_penalizes_hyperextension_only(self):
        from human_3d_reconstruction_tpu.smpl.pose_prior import (
            ANGLE_PRIOR_TERMS,
            angle_prior,
        )

        base = float(angle_prior(jnp.zeros((72,))))
        for joint, axis, sign in ANGLE_PRIOR_TERMS:
            bad = jnp.zeros((72,)).at[joint * 3 + axis].set(sign * 1.0)
            good = jnp.zeros((72,)).at[joint * 3 + axis].set(-sign * 1.0)
            assert float(angle_prior(bad)) > base > float(angle_prior(good))

    def test_69d_and_grad(self):
        from human_3d_reconstruction_tpu.smpl.pose_prior import angle_prior

        theta = jnp.asarray(
            np.random.default_rng(4).normal(scale=0.3, size=(2, 72)).astype(np.float32)
        )
        np.testing.assert_allclose(
            np.asarray(angle_prior(theta)), np.asarray(angle_prior(theta[:, 3:]))
        )
        g = jax.grad(lambda t: jnp.sum(angle_prior(t)))(theta)
        assert np.isfinite(np.asarray(g)).all()
        with pytest.raises(ValueError, match="trailing dim"):
            angle_prior(jnp.zeros((2, 70)))

    def test_fitting_accepts_angle_prior(self, smpl_model):
        from human_3d_reconstruction_tpu.fitting import refine_params
        from human_3d_reconstruction_tpu.smpl.forward import smpl_forward
        from human_3d_reconstruction_tpu.utils.geometry import orthographic_project
        from human_3d_reconstruction_tpu.data.skeleton import NUM_KP

        params = jax.tree.map(jnp.asarray, smpl_model.as_dict())
        theta0 = jnp.zeros((1, 72)).at[0, 12].set(-0.8)  # hyperextended L knee
        cam = jnp.asarray([[0.9, 0.0, 0.0]])
        out = smpl_forward(params, theta0, jnp.zeros((1, 10)))
        kp2d = orthographic_project(out.eval_joints[:, :NUM_KP], cam)
        res = refine_params(
            params, theta0, jnp.zeros((1, 10)), cam, kp2d,
            jnp.ones((1, NUM_KP)), num_steps=20,
            lambda_angle_prior=0.1, lambda_prior_theta=0.0,
        )
        assert np.isfinite(np.asarray(res.loss_history)).all()
        # the hyperextended knee component relaxed toward flexion
        assert float(res.theta[0, 12]) > float(theta0[0, 12])


class TestTrainerIntegration:
    def test_discriminator_free_prior_step(self, smpl_model):
        """make_train_step(pose_prior=...) with use_adversarial=False: the
        likelihood-prior mode reports a finite loss_pose_prior metric and
        produces finite updates."""
        from human_3d_reconstruction_tpu.data.datasets import (
            SyntheticImageDataset,
            collate,
        )
        from human_3d_reconstruction_tpu.models import HMRConfig
        from human_3d_reconstruction_tpu.train.losses import LossWeights
        from human_3d_reconstruction_tpu.train.trainer import (
            TrainConfig,
            create_states,
            make_train_step,
        )

        pool, _, _ = _two_cluster_pool(n_per=100)
        prior = fit_pose_prior(pool, num_components=2, num_iters=20)
        config = TrainConfig(
            crop_size=32,
            use_adversarial=False,
            loss_weights=LossWeights(pose_prior=1e-3),
            hmr=HMRConfig(encoder="resnet18", hidden_size=64),
        )
        gen, disc, model, disc_mod, g_tx, d_tx = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        step_fn = jax.jit(
            make_train_step(config, model, disc_mod, g_tx, d_tx, pose_prior=prior)
        )
        smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())
        ds = SyntheticImageDataset(smpl_model, n=4, frame_hw=(48, 48), seed=0)
        b = collate([ds[i] for i in range(4)])
        batch = {
            "images": jnp.asarray(b.images),
            "centers": jnp.asarray(b.centers),
            "scales": jnp.asarray(b.scales),
            "kp2d": jnp.asarray(b.kp2d),
            "joints3d": jnp.asarray(b.joints3d),
            "has_3d": jnp.asarray(b.has_3d),
            "theta": jnp.asarray(b.theta),
            "beta": jnp.asarray(b.beta),
            "has_smpl": jnp.asarray(b.has_smpl),
        }
        mt = jnp.zeros((4, 72), jnp.float32)
        mb = jnp.zeros((4, 10), jnp.float32)
        new_gen, new_disc, metrics = step_fn(
            gen, disc, smpl_params, batch, mt, mb, jax.random.key(1)
        )
        assert "loss_pose_prior" in metrics
        assert np.isfinite(float(metrics["loss_pose_prior"]))
        assert all(np.isfinite(float(v)) for v in metrics.values())
        assert all(
            np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(new_gen.params)
        )


class TestFittingIntegration:
    def test_prior_pulls_pose_toward_pool(self, smpl_model):
        """refine_params with a strong pose prior reduces the prior NLL of an
        out-of-distribution init; without the prior it does not."""
        from human_3d_reconstruction_tpu.fitting import refine_params
        from human_3d_reconstruction_tpu.smpl.forward import smpl_forward
        from human_3d_reconstruction_tpu.utils.geometry import orthographic_project
        from human_3d_reconstruction_tpu.data.skeleton import NUM_KP

        pool, a, _ = _two_cluster_pool()
        prior = fit_pose_prior(pool, num_components=2, num_iters=30, reg=1e-4)
        params = jax.tree.map(jnp.asarray, smpl_model.as_dict())

        # GT pose: an in-pool sample; observed kp2d from its decode.
        theta_gt = jnp.asarray(pool[0])[None]
        beta_gt = jnp.zeros((1, 10))
        cam = jnp.asarray([[0.9, 0.0, 0.0]])
        out = smpl_forward(params, theta_gt, beta_gt)
        kp2d = orthographic_project(out.eval_joints[:, :NUM_KP], cam)
        vis = jnp.ones((1, NUM_KP))

        # Init: out-of-distribution body pose.
        theta0 = theta_gt.at[:, 3:].add(0.6)
        nll0 = float(pose_nll(prior, theta0)[0])

        common = dict(
            kp2d=kp2d, vis=vis, num_steps=30, lr=0.02,
            lambda_prior_theta=0.0, fit_beta=False, fit_cam=False,
        )
        with_prior = refine_params(
            params, theta0, beta_gt, cam,
            pose_prior=prior, lambda_pose_prior=0.05, **common,
        )
        without = refine_params(params, theta0, beta_gt, cam, **common)

        nll_with = float(pose_nll(prior, with_prior.theta)[0])
        nll_without = float(pose_nll(prior, without.theta)[0])
        assert np.isfinite(np.asarray(with_prior.loss_history)).all()
        assert nll_with < nll0          # prior term actually optimized
        assert nll_with < nll_without   # and it is the prior doing it
