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

    def test_remat_is_exact(self, small_images):
        """remat=True is a pure scheduling change: same param tree, same
        forward values, same gradients (activations are recomputed, not
        approximated)."""
        from human_3d_reconstruction_tpu.models import ResNetConfig

        plain = ResNet50(config=ResNetConfig(stage_sizes=(1, 1), remat=False))
        remat = ResNet50(config=ResNetConfig(stage_sizes=(1, 1), remat=True))
        vars_ = plain.init(jax.random.key(0), small_images)
        assert (
            jax.tree.structure(vars_)
            == jax.tree.structure(remat.init(jax.random.key(0), small_images))
        )

        def loss(model, params):
            variables = {"params": params, "batch_stats": vars_["batch_stats"]}
            feat, _ = model.apply(
                variables, small_images, train=True, mutable=["batch_stats"]
            )
            return jnp.sum(feat**2)

        v0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(vars_["params"])
        v1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(vars_["params"])
        assert np.allclose(v0, v1, rtol=1e-6)
        gaps = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1
        )
        assert max(jax.tree.leaves(gaps)) < 1e-5

    def test_batchnorm_state_updates_in_train(self, small_images):
        model = ResNet50()
        vars_ = model.init(jax.random.key(0), small_images)
        _, updated = model.apply(
            vars_, small_images, train=True, mutable=["batch_stats"]
        )
        before = vars_["batch_stats"]["bn_init"]["mean"]
        after = updated["batch_stats"]["bn_init"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.fixture(scope="module")
def trained_like_vars(small_images):
    """conv7 variables with non-trivial batch_stats (as after training)."""
    from human_3d_reconstruction_tpu.models import ResNetConfig

    model = ResNet50(config=ResNetConfig())
    vars_ = model.init(jax.random.key(0), small_images)
    # Run a few train steps so running mean/var move off the (0, 1) init —
    # otherwise the BN fold test would pass trivially.
    for _ in range(3):
        _, updated = model.apply(
            vars_, small_images * 3.0 + 1.0, train=True, mutable=["batch_stats"]
        )
        vars_ = {"params": vars_["params"], **updated}
    return model, vars_


class TestServingTransforms:
    """Exact-reparameterization checks for the serving-path graph rewrites."""

    def test_s2d_stem_matches_conv7(self, small_images, trained_like_vars):
        from human_3d_reconstruction_tpu.models import ResNetConfig
        from human_3d_reconstruction_tpu.models.resnet import convert_stem_to_s2d

        model7, vars7 = trained_like_vars
        ref = model7.apply(vars7, small_images)
        s2d_model = ResNet50(config=ResNetConfig(stem="s2d"))
        vars_s2d = convert_stem_to_s2d(vars7)
        # structure must match a fresh s2d init
        import chex

        template = s2d_model.init(jax.random.key(1), small_images)
        chex.assert_trees_all_equal_shapes(vars_s2d, template)
        out = s2d_model.apply(vars_s2d, small_images)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)

    def test_s2d_stem_gradients_flow(self, small_images):
        """s2d is not serving-only: the stem trains (grads reach the kernel)."""
        from human_3d_reconstruction_tpu.models import ResNetConfig

        model = ResNet50(config=ResNetConfig(stem="s2d", stage_sizes=(1, 1, 1, 1)))
        vars_ = model.init(jax.random.key(0), small_images)

        def loss(p):
            return jnp.sum(model.apply({**vars_, "params": p}, small_images) ** 2)

        g = jax.grad(loss)(vars_["params"])
        assert float(jnp.abs(g["conv_init"]["kernel"]).max()) > 0

    def test_fold_bn_matches_eval(self, small_images, trained_like_vars):
        from human_3d_reconstruction_tpu.models import ResNetConfig
        from human_3d_reconstruction_tpu.models.resnet import fold_bn_variables

        model7, vars7 = trained_like_vars
        ref = model7.apply(vars7, small_images)
        folded_model = ResNet50(config=ResNetConfig(fold_bn=True))
        folded = fold_bn_variables(vars7)
        assert "batch_stats" not in folded
        out = folded_model.apply(folded, small_images)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)

    def test_optimize_for_serving_full_hmr(self, small_images):
        """The one-call HMR rewrite preserves the full param stream."""
        from human_3d_reconstruction_tpu.models.hmr import optimize_for_serving

        config = HMRConfig()
        model = HMRModel(config=config)
        vars_ = model.init(jax.random.key(0), small_images)
        ref = model.apply(vars_, small_images)

        new_cfg, new_vars = optimize_for_serving(config, vars_)
        fast = HMRModel(config=new_cfg)
        out = fast.apply(new_vars, small_images)
        np.testing.assert_allclose(
            np.asarray(out.all_params), np.asarray(ref.all_params), atol=5e-5, rtol=1e-4
        )

    def test_s2d_plus_fold_compose(self, small_images, trained_like_vars):
        from human_3d_reconstruction_tpu.models import ResNetConfig
        from human_3d_reconstruction_tpu.models.resnet import (
            convert_stem_to_s2d,
            fold_bn_variables,
        )

        model7, vars7 = trained_like_vars
        ref = model7.apply(vars7, small_images)
        model = ResNet50(config=ResNetConfig(stem="s2d", fold_bn=True))
        vars_ = fold_bn_variables(convert_stem_to_s2d(vars7))
        out = model.apply(vars_, small_images)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)


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

    def test_rot6d_output_contract(self):
        """rot_rep='rot6d' keeps the (T, B, 85) axis-angle output contract:
        every iteration's theta decodes to valid rotations, and iteration 0
        stays near the (converted) mean pose."""
        model = IEFRegressor(num_iterations=3, rot_rep="rot6d")
        feat = jnp.ones((4, 2048))
        vars_ = model.init(jax.random.key(0), feat)
        out = model.apply(vars_, feat)
        assert out.shape == (3, 4, NUM_SMPL_PARAMS)
        # Stream is 157-d internally (24x6 + 10 + 3).
        assert vars_["params"]["fc_out"]["kernel"].shape[-1] == 24 * 6 + 10 + 3

        from human_3d_reconstruction_tpu.utils.geometry import rodrigues

        R = rodrigues(out[:, :, :72].reshape(-1, 3))
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        should_eye = jnp.matmul(R, jnp.swapaxes(R, -1, -2))
        assert float(jnp.abs(should_eye - eye).max()) < 1e-4
        mean = default_mean_params()
        assert float(jnp.abs(out[0] - mean).max()) < 1.0

    def test_rot6d_gradients_flow(self):
        model = IEFRegressor(num_iterations=2, rot_rep="rot6d")
        feat = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 2048)), dtype=jnp.float32
        )
        vars_ = model.init(jax.random.key(0), feat)

        def loss(params):
            out = model.apply({"params": params}, feat)
            return jnp.sum(out**2)

        g = jax.grad(loss)(vars_["params"])
        leaves = jax.tree.leaves(jax.tree.map(lambda x: jnp.abs(x).max(), g))
        assert all(np.isfinite(float(x)) for x in leaves)
        assert max(float(x) for x in leaves) > 0

    def test_unknown_rot_rep_raises(self):
        model = IEFRegressor(rot_rep="quaternion")
        with pytest.raises(ValueError, match="rot_rep"):
            model.init(jax.random.key(0), jnp.ones((1, 2048)))

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
    def test_rot6d_full_model_smoke(self, rng):
        """HMRConfig(rot_rep='rot6d') flows through the full model: same
        HMROutput contract, finite outputs (downstream consumers are
        representation-agnostic)."""
        model = HMRModel(config=HMRConfig(rot_rep="rot6d"))
        images = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        vars_ = model.init(jax.random.key(0), images)
        out = model.apply(vars_, images)
        assert out.theta.shape == (2, 72)
        assert out.all_params.shape == (3, 2, NUM_SMPL_PARAMS)
        assert np.all(np.isfinite(np.asarray(out.all_params)))

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
            if leaf is not None:  # kp2d_det/kp_conf are None without kp_head
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

    def test_hourglass_remat_is_exact(self, rng):
        from human_3d_reconstruction_tpu.models.hourglass import (
            HourglassConfig,
            HourglassEncoder,
        )

        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        kw = dict(num_stacks=1, depth=2, features=64)
        plain = HourglassEncoder(config=HourglassConfig(**kw))
        remat = HourglassEncoder(config=HourglassConfig(**kw, remat=True))
        v = plain.init(jax.random.key(0), x)
        assert jax.tree.structure(v) == jax.tree.structure(
            remat.init(jax.random.key(0), x)
        )

        def loss(m, p):
            f, _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(f**2)

        v0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(v["params"])
        v1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(v["params"])
        assert np.allclose(v0, v1, rtol=1e-6)
        gaps = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
        assert max(jax.tree.leaves(gaps)) < 1e-4

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
