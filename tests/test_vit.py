"""ViT encoder tests: patchify identity, torch attention oracle, remat
exactness, bf16 sanity, HMR integration.

The reshape-patchify and qkv-packing claims in models/vit.py docstrings are
pinned here; numerical truth for the attention block is
torch.nn.MultiheadAttention with directly-mapped weights.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.models import HMRConfig, HMRModel
from human_3d_reconstruction_tpu.models.vit import (
    VIT_VARIANTS,
    MultiHeadAttention,
    ViTConfig,
    ViTEncoder,
)

pytestmark = pytest.mark.fast

# Tiny config: deep enough to exercise the block loop, small enough for CPU.
TINY = ViTConfig(width=64, depth=2, num_heads=4, patch_size=8)


@pytest.fixture(scope="module")
def images():
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    )


class TestPatchify:
    def test_reshape_equals_strided_conv(self, images):
        """The reshape+dense patch embed IS the stride-p pxp conv: running
        the same weights through lax.conv must reproduce it exactly."""
        model = ViTEncoder(config=TINY)
        variables = model.init(jax.random.key(0), images)
        kernel = variables["params"]["patch_embed"]["kernel"]  # (p*p*C, D)
        bias = variables["params"]["patch_embed"]["bias"]
        p, D = TINY.patch_size, TINY.width

        # Our patch flattening order is (ph, pw, C) — reshape the dense
        # kernel to HWIO accordingly.
        conv_kernel = kernel.reshape(p, p, 3, D)
        conv = jax.lax.conv_general_dilated(
            images,
            conv_kernel,
            window_strides=(p, p),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        B, gh, gw, _ = conv.shape

        x = images.reshape(2, 32 // p, p, 32 // p, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(2, -1, p * p * 3)
        ours = x @ kernel + bias
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(conv.reshape(B, gh * gw, D)), atol=1e-5
        )

    def test_indivisible_crop_raises(self):
        bad = jnp.zeros((1, 33, 33, 3))
        with pytest.raises(ValueError, match="not divisible"):
            ViTEncoder(config=TINY).init(jax.random.key(0), bad)


class TestAttentionOracle:
    def test_matches_torch_multihead(self):
        """Our qkv-fused attention == torch.nn.MultiheadAttention with
        kernel = in_proj_weight.T (the packing the module docstring pins)."""
        D, H, B, N = 64, 4, 2, 9
        x = np.random.default_rng(1).normal(size=(B, N, D)).astype(np.float32)

        mha = MultiHeadAttention(width=D, num_heads=H, dtype=jnp.float32)
        variables = mha.init(jax.random.key(0), jnp.asarray(x))
        params = variables["params"]

        tm = torch.nn.MultiheadAttention(D, H, batch_first=True, bias=True)
        with torch.no_grad():
            tm.in_proj_weight.copy_(
                torch.from_numpy(np.asarray(params["qkv"]["kernel"]).T)
            )
            tm.in_proj_bias.copy_(
                torch.from_numpy(np.asarray(params["qkv"]["bias"]))
            )
            tm.out_proj.weight.copy_(
                torch.from_numpy(np.asarray(params["out"]["kernel"]).T)
            )
            tm.out_proj.bias.copy_(
                torch.from_numpy(np.asarray(params["out"]["bias"]))
            )
            theirs, _ = tm(*(torch.from_numpy(x),) * 3, need_weights=False)

        ours = mha.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=2e-5, rtol=1e-5
        )


class TestViTEncoder:
    def test_feature_shape_and_dtype(self, images):
        model = ViTEncoder(config=TINY)
        variables = model.init(jax.random.key(0), images)
        feat = model.apply(variables, images)
        assert feat.shape == (2, TINY.width)
        assert feat.dtype == jnp.float32

    def test_cls_pool(self, images):
        cfg = dataclasses.replace(TINY, pool="cls")
        model = ViTEncoder(config=cfg)
        variables = model.init(jax.random.key(0), images)
        assert variables["params"]["cls_token"].shape == (1, 1, cfg.width)
        # 16 patches + cls
        assert variables["params"]["pos_embed"].shape == (1, 17, cfg.width)
        feat = model.apply(variables, images)
        assert feat.shape == (2, cfg.width)

    def test_remat_is_exact(self, images):
        """remat is a scheduling change only: identical params, values, grads."""
        plain = ViTEncoder(config=TINY)
        remat = ViTEncoder(config=dataclasses.replace(TINY, remat=True))
        variables = plain.init(jax.random.key(0), images)
        assert jax.tree.structure(variables) == jax.tree.structure(
            remat.init(jax.random.key(0), images)
        )

        def loss(model, params):
            return jnp.sum(model.apply({"params": params}, images) ** 2)

        v0, g0 = jax.value_and_grad(lambda p: loss(plain, p))(variables["params"])
        v1, g1 = jax.value_and_grad(lambda p: loss(remat, p))(variables["params"])
        assert np.asarray(v0) == np.asarray(v1)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            g0,
            g1,
        )

    def test_bf16_close_to_f32(self, images):
        f32 = ViTEncoder(config=TINY)
        bf16 = ViTEncoder(config=dataclasses.replace(TINY, dtype=jnp.bfloat16))
        variables = f32.init(jax.random.key(0), images)
        a = np.asarray(f32.apply(variables, images))
        b = np.asarray(bf16.apply(variables, images))
        assert b.dtype == np.float32  # pooled feature is always f32
        # bf16 matmuls with f32 LN/softmax: percent-level feature drift.
        assert np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9) < 0.05


class TestHMRIntegration:
    def test_variants_registered(self):
        assert set(VIT_VARIANTS) == {"vit_ti16", "vit_s16", "vit_b16"}

    def test_hmr_forward(self, images):
        # 32x32 crop / patch 16 -> 4 tokens; shape-contract smoke only.
        cfg = HMRConfig(encoder="vit_ti16", hidden_size=64)
        model = HMRModel(config=cfg)
        variables = model.init(jax.random.key(0), images)
        out = jax.jit(lambda v, x: model.apply(v, x))(variables, images)
        assert out.theta.shape == (2, 72)
        assert out.beta.shape == (2, 10)
        assert out.cam.shape == (2, 3)
        assert out.all_params.shape == (3, 2, 85)
        assert out.features.shape == (2, VIT_VARIANTS["vit_ti16"].width)
        assert np.isfinite(np.asarray(out.all_params)).all()

    def test_train_step_and_checkpoint_without_batch_stats(
        self, smpl_model, tmp_path
    ):
        """The fused G+D step and the Orbax round-trip work for a BN-free
        encoder: GenState.batch_stats is an empty dict end-to-end."""
        import orbax.checkpoint  # noqa: F401  (skip cleanly if unavailable)

        from human_3d_reconstruction_tpu.data.datasets import (
            SyntheticImageDataset,
            collate,
        )
        from human_3d_reconstruction_tpu.train.trainer import (
            TrainConfig,
            create_states,
            make_checkpoint_manager,
            make_train_step,
            restore_inference_variables,
            save_checkpoint,
        )

        config = TrainConfig(
            crop_size=32,
            hmr=HMRConfig(encoder="vit_ti16", hidden_size=64),
        )
        gen, disc, model, disc_mod, g_tx, d_tx = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        assert gen.batch_stats == {}
        step_fn = jax.jit(make_train_step(config, model, disc_mod, g_tx, d_tx))
        smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())
        ds = SyntheticImageDataset(smpl_model, n=4, frame_hw=(48, 48), seed=0)
        items = [ds[i] for i in range(4)]
        b = collate(items)
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
        assert int(new_gen.step) == 1
        assert all(np.isfinite(float(v)) for v in metrics.values())

        mgr = make_checkpoint_manager(str(tmp_path / "ckpt"))
        save_checkpoint(mgr, 1, new_gen, new_disc)
        mgr.wait_until_finished()
        template = {"params": new_gen.params, "batch_stats": {}}
        variables, step = restore_inference_variables(
            make_checkpoint_manager(str(tmp_path / "ckpt")), template
        )
        assert step == 1
        restored_leaves = jax.tree.leaves(variables["params"])
        live_leaves = jax.tree.leaves(new_gen.params)
        for a, b_ in zip(restored_leaves, live_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_hmr_gradients_flow(self, images):
        cfg = HMRConfig(encoder="vit_ti16", hidden_size=64)
        model = HMRModel(config=cfg)
        variables = model.init(jax.random.key(0), images)

        def loss(params):
            out = model.apply({"params": params}, images)
            return jnp.sum(out.all_params**2)

        grads = jax.grad(loss)(variables["params"])
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # Every encoder block receives gradient (residual stream intact).
        enc = grads["encoder"]
        for i in range(VIT_VARIANTS["vit_ti16"].depth):
            block_norm = sum(
                float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(enc[f"block{i}"])
            )
            assert block_norm > 0.0
