"""Torch-checkpoint import: converted weights reproduce torch outputs.

The strongest cross-framework test in the suite: the torch reference
pipeline (benchmarks/torch_reference.TorchHMR — independently written) is
converted to Flax variables, and both frameworks must produce the same
features/params for the same images.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from benchmarks.torch_reference import TorchHMR
from human_3d_reconstruction_tpu.models import HMRConfig, HMRModel, ResNet50
from human_3d_reconstruction_tpu.models.regressor import default_mean_params
from human_3d_reconstruction_tpu.utils.torch_import import (
    import_torch_hmr_state_dict,
    import_torch_resnet50,
)
from tests.oracle_smpl_torch import SMPLOracle


@pytest.fixture(scope="module")
def torch_model(smpl_model):
    torch.manual_seed(0)
    m = TorchHMR(SMPLOracle(smpl_model)).eval()
    # align IEF seed with our default mean params (cam scale 0.9)
    m.mean_params.copy_(torch.from_numpy(np.asarray(default_mean_params())))
    return m


class TestResNetImport:
    def test_features_match(self, torch_model, rng):
        images = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)

        flax_model = ResNet50()
        template = flax_model.init(jax.random.key(0), jnp.asarray(images))
        enc_state = {
            k[len("encoder."):]: v
            for k, v in torch_model.state_dict().items()
            if k.startswith("encoder.")
        }
        params, stats = import_torch_resnet50(enc_state, prefix_style="bench")
        variables = {"params": params, "batch_stats": stats}

        ours = np.asarray(flax_model.apply(variables, jnp.asarray(images)))
        with torch.no_grad():
            theirs = (
                torch_model.encoder(torch.from_numpy(images).permute(0, 3, 1, 2))
                .numpy()
            )
        np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


class TestTorchvisionDepths:
    """Every torchvision depth imports and matches: 18/34 are TRUE basic-block
    nets (512-d feature), 50 bottleneck — exercised via torchvision key naming
    (TorchResNetTV state_dicts are key-identical to torchvision's)."""

    @pytest.mark.parametrize(
        "depth,encoder,feat_dim",
        [(18, "resnet18", 512), (34, "resnet34", 512), (50, "resnet50", 2048)],
    )
    def test_depth_imports_and_matches(self, depth, encoder, feat_dim, rng):
        from benchmarks.torch_reference import TorchResNetTV
        from human_3d_reconstruction_tpu.models.hmr import _RESNET_VARIANTS
        from human_3d_reconstruction_tpu.models.resnet import ResNetConfig

        torch.manual_seed(depth)
        tm = TorchResNetTV(depth).eval()
        images = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)

        stages, block = _RESNET_VARIANTS[encoder]
        flax_model = ResNet50(config=ResNetConfig(stage_sizes=stages, block=block))
        template = flax_model.init(jax.random.key(0), jnp.asarray(images))
        params, stats = import_torch_resnet50(
            tm.state_dict(), prefix_style="torchvision"
        )
        variables = {"params": params, "batch_stats": stats}

        # Structure must match the freshly-initialized model exactly.
        import chex

        chex.assert_trees_all_equal_structs(
            variables, jax.tree.map(np.asarray, template)
        )
        chex.assert_trees_all_equal_shapes(
            variables, jax.tree.map(np.asarray, template)
        )

        ours = np.asarray(flax_model.apply(variables, jnp.asarray(images)))
        assert ours.shape == (2, feat_dim)
        with torch.no_grad():
            theirs = tm(torch.from_numpy(images).permute(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


class TestViTImport:
    """timm-named ViT checkpoints import exactly (cls pool) — the parity
    bridge for the transformer-encoder torch line (models/vit.py)."""

    def _torch_vit(self, **kw):
        from benchmarks.torch_reference import TorchViT

        torch.manual_seed(7)
        return TorchViT(**kw).eval()

    def test_cls_pool_matches_exactly(self, rng):
        import dataclasses

        from human_3d_reconstruction_tpu.models.vit import ViTConfig, ViTEncoder
        from human_3d_reconstruction_tpu.utils.torch_import import import_torch_vit

        tm = self._torch_vit(
            dim=64, depth=2, num_heads=4, patch_size=8, img_size=32
        )
        images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

        cfg = ViTConfig(width=64, depth=2, num_heads=4, patch_size=8, pool="cls")
        model = ViTEncoder(config=cfg)
        template = model.init(jax.random.key(0), jnp.asarray(images))
        params = import_torch_vit(tm.state_dict(), pool="cls")

        import chex

        chex.assert_trees_all_equal_structs(
            {"params": params}, jax.tree.map(np.asarray, template)
        )
        chex.assert_trees_all_equal_shapes(
            {"params": params}, jax.tree.map(np.asarray, template)
        )

        ours = np.asarray(
            model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(images))
        )
        with torch.no_grad():
            theirs = tm(torch.from_numpy(images).permute(0, 3, 1, 2), pool="cls").numpy()
        np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)

    def test_mean_pool_warm_start_structure(self, rng):
        """Mean-pool import drops the cls rows; the result must be a valid
        params tree for the cls-free architecture (warm start, not identity —
        the docstring documents why)."""
        from human_3d_reconstruction_tpu.models.vit import ViTConfig, ViTEncoder
        from human_3d_reconstruction_tpu.utils.torch_import import import_torch_vit

        tm = self._torch_vit(dim=64, depth=2, num_heads=4, patch_size=8, img_size=32)
        images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

        cfg = ViTConfig(width=64, depth=2, num_heads=4, patch_size=8, pool="mean")
        model = ViTEncoder(config=cfg)
        template = model.init(jax.random.key(0), jnp.asarray(images))
        params = import_torch_vit(tm.state_dict(), pool="mean")

        import chex

        chex.assert_trees_all_equal_structs(
            {"params": params}, jax.tree.map(np.asarray, template)
        )
        chex.assert_trees_all_equal_shapes(
            {"params": params}, jax.tree.map(np.asarray, template)
        )
        # pos_embed rows are the patch rows of the checkpoint (cls dropped).
        np.testing.assert_array_equal(
            params["pos_embed"], tm.pos_embed.detach().numpy()[:, 1:]
        )
        feat = model.apply(
            {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(images)
        )
        assert np.isfinite(np.asarray(feat)).all()

    def test_unknown_pool_raises(self):
        from human_3d_reconstruction_tpu.utils.torch_import import import_torch_vit

        tm = self._torch_vit(dim=64, depth=1, num_heads=4, patch_size=8, img_size=32)
        with pytest.raises(ValueError, match="unknown pool"):
            import_torch_vit(tm.state_dict(), pool="max")


class TestFullHMRImport:
    def test_params_match_torch_pipeline(self, torch_model, smpl_model, rng):
        images = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)

        model = HMRModel(config=HMRConfig())
        template = model.init(jax.random.key(0), jnp.asarray(images))
        variables = import_torch_hmr_state_dict(
            torch_model.state_dict(), template, prefix_style="bench"
        )
        out = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(images))

        # torch side: run encoder + IEF manually (TorchHMR.forward also does
        # SMPL; replicate just the param stream).
        with torch.no_grad():
            timg = torch.from_numpy(images).permute(0, 3, 1, 2)
            feat = torch_model.encoder(timg)
            params = torch_model.mean_params.expand(2, -1)
            for _ in range(3):
                x = torch.relu(torch_model.fc1(torch.cat([feat, params], dim=1)))
                x = torch.relu(torch_model.fc2(x))
                params = params + torch_model.out(x)
        np.testing.assert_allclose(
            np.asarray(out.all_params[-1]), params.numpy(), atol=5e-3, rtol=1e-3
        )

    def test_structure_mismatch_fails_loudly(self, torch_model, rng):
        model = HMRModel(config=HMRConfig(num_iterations=3, hidden_size=512))
        template = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        with pytest.raises((AssertionError, ValueError)):
            import_torch_hmr_state_dict(
                torch_model.state_dict(), template, prefix_style="bench"
            )
