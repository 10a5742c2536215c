"""Int8 serving path: structure, accuracy vs f32, and quantizer math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.models import HMRConfig, HMRModel, ResNet50
from human_3d_reconstruction_tpu.models.quant import (
    HMRModelInt8,
    ResNet50Int8,
    quantize_conv,
    quantize_hmr_for_serving,
    quantize_resnet_params,
)
from human_3d_reconstruction_tpu.models.resnet import (
    ResNetConfig,
    convert_stem_to_s2d,
    fold_bn_variables,
)


@pytest.fixture(scope="module")
def images():
    # Realistic normalized-crop statistics (roughly [-2.5, 2.5]). Local
    # generator: the function-scoped `rng` fixture can't feed a
    # module-scoped fixture, and module fixtures shouldn't consume shared
    # stream state anyway.
    rng = np.random.default_rng(24)
    return jnp.asarray(rng.normal(scale=1.0, size=(2, 64, 64, 3)).astype(np.float32))


class TestQuantizeConv:
    def test_roundtrip_error_bounded(self, rng):
        w = rng.normal(scale=0.1, size=(3, 3, 16, 32)).astype(np.float32)
        q = quantize_conv({"kernel": w, "bias": np.zeros(32, np.float32)})
        assert q["kernel_q"].dtype == jnp.int8
        deq = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["w_scale"])
        # per-channel symmetric int8: error <= scale/2 per weight
        per_chan_bound = np.abs(w).max(axis=(0, 1, 2)) / 127.0
        assert np.all(np.abs(deq - w) <= per_chan_bound * 0.5 + 1e-8)


class TestInt8ResNet:
    def test_features_close_to_f32(self, images, rng):
        """W8A8 encoder features stay within a few percent of f32."""
        cfg = ResNetConfig(stage_sizes=(1, 1, 1, 1))
        f32_model = ResNet50(config=cfg)
        vars_f32 = f32_model.init(jax.random.key(0), images)
        # Move batch stats off the trivial init so the fold is non-trivial.
        for _ in range(2):
            _, updated = f32_model.apply(
                vars_f32, images * 2.0, train=True, mutable=["batch_stats"]
            )
            vars_f32 = {"params": vars_f32["params"], **updated}
        ref = np.asarray(f32_model.apply(vars_f32, images))

        folded = fold_bn_variables(convert_stem_to_s2d(vars_f32))
        qcfg = ResNetConfig(stage_sizes=(1, 1, 1, 1), stem="s2d", fold_bn=True)
        q_model = ResNet50Int8(config=qcfg)
        q_params = {"params": quantize_resnet_params(folded["params"])}
        # structure matches a fresh init
        import chex

        template = q_model.init(jax.random.key(1), images)
        chex.assert_trees_all_equal_shapes(q_params, template)

        out = np.asarray(q_model.apply(q_params, images))
        assert out.shape == ref.shape
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-8)
        assert rel < 0.08, rel  # W8A8 dynamic: a few percent on features

    def test_static_scale_calibration_matches_dynamic(self, images):
        """Calibrated static scales reproduce dynamic-quant accuracy on the
        calibration distribution (they bake the same per-tensor amax)."""
        from human_3d_reconstruction_tpu.models.quant import (
            calibrate_activation_scales,
        )

        config = HMRConfig()
        model = HMRModel(config=config)
        variables = model.init(jax.random.key(0), images)

        q_cfg, dyn_vars = quantize_hmr_for_serving(config, variables)
        dyn = HMRModelInt8(config=q_cfg).apply(dyn_vars, images)

        q_cfg2, st_vars = quantize_hmr_for_serving(config, variables, static_scale=True)
        st_model = HMRModelInt8(config=q_cfg2, static_scale=True)
        st_vars = calibrate_activation_scales(st_model, st_vars, images)
        # calibration actually wrote scales (not the init ones)
        assert float(st_vars["params"]["encoder"]["conv_init"]["x_scale"]) != 1.0
        st = st_model.apply(st_vars, images)
        np.testing.assert_allclose(
            np.asarray(st.all_params[-1]), np.asarray(dyn.all_params[-1]),
            atol=0.02, rtol=0.05,
        )

    def test_full_hmr_int8_param_drift_small(self, images):
        """End-to-end: int8-encoder HMR params stay close to the f32 stream."""
        config = HMRConfig()
        model = HMRModel(config=config)
        variables = model.init(jax.random.key(0), images)
        ref = model.apply(variables, images)

        q_config, q_vars = quantize_hmr_for_serving(config, variables)
        q_model = HMRModelInt8(config=q_config)
        out = q_model.apply(q_vars, images)
        # theta is the final IEF accumulation; drift must stay small
        # relative to its own scale (fresh-init params are ~O(0.1)).
        drift = float(jnp.abs(out.all_params[-1] - ref.all_params[-1]).max())
        scale = float(jnp.abs(ref.all_params[-1]).max()) + 1e-6
        assert drift / scale < 0.1, (drift, scale)
