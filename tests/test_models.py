"""Network tests: shapes, jit contracts, IEF behavior, discriminator.

SURVEY.md section 4 item 3 (shape/jit contract tests) + integration smoke
(item 5) for the image->params->mesh path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.api import make_recover_mesh
from human_3d_reconstruction_tpu.models import (
    HMRConfig,
    HMRModel,
    IEFRegressor,
    NUM_SMPL_PARAMS,
    ResNet50,
    SMPLDiscriminator,
)
from human_3d_reconstruction_tpu.models.regressor import default_mean_params, split_params


@pytest.fixture(scope="module")
def small_images():
    # Small spatial size keeps CPU test time sane; the network is size-agnostic.
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )


class TestResNet:
    def test_feature_shape(self, small_images):
        model = ResNet50()
        vars_ = model.init(jax.random.key(0), small_images)
        feat = model.apply(vars_, small_images)
        assert feat.shape == (2, 2048)
        assert feat.dtype == jnp.float32

    def test_batchnorm_state_updates_in_train(self, small_images):
        model = ResNet50()
        vars_ = model.init(jax.random.key(0), small_images)
        _, updated = model.apply(
            vars_, small_images, train=True, mutable=["batch_stats"]
        )
        before = vars_["batch_stats"]["bn_init"]["mean"]
        after = updated["batch_stats"]["bn_init"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestIEFRegressor:
    def test_shapes_and_iteration_count(self):
        model = IEFRegressor(num_iterations=3)
        feat = jnp.ones((4, 2048))
        vars_ = model.init(jax.random.key(0), feat)
        out = model.apply(vars_, feat)
        assert out.shape == (3, 4, NUM_SMPL_PARAMS)

    def test_starts_near_mean(self):
        """Small-init output layer => iteration 1 stays near the mean params."""
        model = IEFRegressor(num_iterations=3)
        feat = jnp.ones((4, 2048))
        vars_ = model.init(jax.random.key(0), feat)
        out = model.apply(vars_, feat)
        mean = default_mean_params()
        assert float(jnp.abs(out[0] - mean).max()) < 1.0

    def test_iterations_refine(self):
        """Estimates differ across iterations (the loop is live)."""
        model = IEFRegressor(num_iterations=3)
        feat = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2048)), dtype=jnp.float32)
        vars_ = model.init(jax.random.key(1), feat)
        out = model.apply(vars_, feat)
        assert float(jnp.abs(out[1] - out[0]).max()) > 0

    def test_split_params(self):
        p = jnp.arange(85.0)[None]
        theta, beta, cam = split_params(p)
        assert theta.shape == (1, 72) and beta.shape == (1, 10) and cam.shape == (1, 3)
        assert float(cam[0, 0]) == 82.0


class TestDiscriminator:
    def test_output_shape(self, rng):
        theta = jnp.asarray(rng.normal(scale=0.3, size=(4, 72)).astype(np.float32))
        beta = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
        disc = SMPLDiscriminator()
        vars_ = disc.init(jax.random.key(0), theta, beta)
        scores = disc.apply(vars_, theta, beta)
        assert scores.shape == (4, 25)  # 23 per-joint + full pose + shape
        assert np.all(np.isfinite(np.asarray(scores)))

    def test_grad_flows_to_theta(self, rng):
        theta = jnp.asarray(rng.normal(scale=0.3, size=(2, 72)).astype(np.float32))
        beta = jnp.zeros((2, 10))
        disc = SMPLDiscriminator()
        vars_ = disc.init(jax.random.key(0), theta, beta)
        g = jax.grad(lambda t: jnp.sum(disc.apply(vars_, t, beta) ** 2))(theta)
        assert float(jnp.abs(g).max()) > 0


class TestEndToEnd:
    def test_recover_mesh_smoke(self, smpl_model, rng):
        """Integration smoke: random crop -> full pipeline -> finite outputs,
        correct shapes (SURVEY.md section 4 item 5)."""
        model = HMRModel(config=HMRConfig())
        images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        vars_ = model.init(jax.random.key(0), images)
        smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())

        recover = make_recover_mesh(model)
        out = recover(vars_, smpl_params, images)

        assert out.theta.shape == (2, 72)
        assert out.beta.shape == (2, 10)
        assert out.cam.shape == (2, 3)
        assert out.verts.shape == (2, 6890, 3)
        assert out.joints3d.shape == (2, 24, 3)
        assert out.eval_joints3d.shape == (2, 19, 3)
        assert out.joints2d.shape == (2, 19, 2)
        for leaf in out:
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_no_retrace_on_same_shape(self, smpl_model, rng):
        model = HMRModel(config=HMRConfig())
        images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        vars_ = model.init(jax.random.key(0), images)
        smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())

        traces = 0

        def counting_body(variables, params, imgs):
            nonlocal traces
            traces += 1
            from human_3d_reconstruction_tpu.api import recover_mesh_fn

            return recover_mesh_fn(model, variables, params, imgs)

        fn = jax.jit(counting_body)
        fn(vars_, smpl_params, images)
        fn(vars_, smpl_params, images + 1.0)
        assert traces == 1


class TestEncoderVariants:
    def test_hourglass_feature_contract(self, rng):
        from human_3d_reconstruction_tpu.models.hourglass import HourglassEncoder

        images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        enc = HourglassEncoder()
        vars_ = enc.init(jax.random.key(0), images)
        feat = enc.apply(vars_, images)
        assert feat.shape == (2, 2048)
        assert np.all(np.isfinite(np.asarray(feat)))

    def test_hmr_with_hourglass(self, rng):
        model = HMRModel(config=HMRConfig(encoder="hourglass"))
        images = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        vars_ = model.init(jax.random.key(0), images)
        out = model.apply(vars_, images)
        assert out.theta.shape == (1, 72)

    def test_resnet101_variant(self, rng):
        from human_3d_reconstruction_tpu.models import ResNet50, ResNetConfig

        enc = ResNet50(config=ResNetConfig(stage_sizes=(1, 1, 1, 1)))  # tiny proxy
        images = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
        vars_ = enc.init(jax.random.key(0), images)
        assert enc.apply(vars_, images).shape == (1, 2048)
