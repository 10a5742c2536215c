"""Keypoint heatmap head: target rendering, soft-argmax decode, HMR wiring,
training loss, and the self-contained hybrid refinement serving path.

SURVEY.md section 4 items 3 (shape/jit contracts) and 5 (integration smoke);
the head itself is beyond-reference scope (it replaces the reference
family's EXTERNAL 2D detector dependency in the hybrid fitting path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
from human_3d_reconstruction_tpu.models import HMRConfig, HMRModel
from human_3d_reconstruction_tpu.models.keypoint_head import (
    KeypointHead,
    gaussian_heatmap_targets,
    heatmap_loss,
    soft_argmax,
    soft_argmax_windowed,
)

pytestmark = pytest.mark.fast


def _random_kp(rng, B, K, margin=0.3):
    """Keypoints away from the border so the Gaussian mass stays in-map."""
    return rng.uniform(-1 + margin, 1 - margin, (B, K, 2)).astype(np.float32)


class TestTargetsAndDecode:
    def test_target_peaks_at_keypoint(self):
        rng = np.random.default_rng(0)
        kp = jnp.asarray(_random_kp(rng, 3, NUM_KP))
        vis = jnp.ones((3, NUM_KP), jnp.float32)
        t = gaussian_heatmap_targets(kp, vis, 56, 56)
        assert t.shape == (3, 56, 56, NUM_KP)
        # Peak value ~1 (cell-center discretization keeps it close).
        assert float(jnp.max(t)) <= 1.0 + 1e-6
        assert float(jnp.min(jnp.max(t, axis=(1, 2)))) > 0.8
        # Peak location: nearest cell to the keypoint.
        b, k = 1, 4
        flat = np.asarray(t[b, :, :, k]).argmax()
        iy, ix = np.unravel_index(flat, (56, 56))
        cx = (ix + 0.5) / 56 * 2 - 1
        cy = (iy + 0.5) / 56 * 2 - 1
        cell = 2.0 / 56
        assert abs(cx - float(kp[b, k, 0])) <= cell
        assert abs(cy - float(kp[b, k, 1])) <= cell

    def test_invisible_joint_renders_zero(self):
        kp = jnp.zeros((1, NUM_KP, 2))
        vis = jnp.ones((1, NUM_KP)).at[0, 3].set(0.0)
        t = gaussian_heatmap_targets(kp, vis, 32, 32)
        assert float(jnp.max(jnp.abs(t[0, :, :, 3]))) == 0.0
        assert float(jnp.max(t[0, :, :, 2])) > 0.8

    def test_soft_argmax_recovers_target_coords(self):
        rng = np.random.default_rng(1)
        kp = jnp.asarray(_random_kp(rng, 4, NUM_KP))
        vis = jnp.ones((4, NUM_KP), jnp.float32)
        t = gaussian_heatmap_targets(kp, vis, 56, 56)
        coords, conf = soft_argmax(t)
        # Sub-cell decode: the expectation of a symmetric Gaussian is its
        # center; border truncation is excluded by the margin.
        err = float(jnp.max(jnp.abs(coords - kp)))
        assert err < 2.0 / 56, err
        assert float(jnp.min(conf)) > 0.8

    def test_soft_argmax_confidence_low_on_flat_map(self):
        flat = jnp.full((1, 56, 56, NUM_KP), 0.01)
        _, conf = soft_argmax(flat)
        assert float(jnp.max(conf)) < 0.05

    def test_windowed_matches_global_on_clean_gaussian(self):
        """Single clean mode: the two decodes agree to sub-cell precision
        (the window is centered within half a cell of the true mode, so
        truncated-Gaussian bias is far below one cell)."""
        rng = np.random.default_rng(5)
        kp = jnp.asarray(_random_kp(rng, 4, NUM_KP))
        vis = jnp.ones((4, NUM_KP), jnp.float32)
        t = gaussian_heatmap_targets(kp, vis, 56, 56)
        cg, _ = soft_argmax(t)
        cw, confw = soft_argmax_windowed(t)
        assert float(jnp.max(jnp.abs(cw - kp))) < 2.0 / 56
        assert float(jnp.max(jnp.abs(cw - cg))) < 0.5 / 56
        assert float(jnp.min(confw)) > 0.8

    def test_windowed_rejects_secondary_mode(self):
        """Bimodal map (the symmetric-limb ambiguity): a 0.5-amplitude
        secondary peak drags the GLOBAL expectation toward the average of
        the modes; the windowed decode stays on the dominant peak."""
        K = NUM_KP
        primary = jnp.full((1, K, 2), -0.5, jnp.float32)
        secondary = jnp.full((1, K, 2), 0.5, jnp.float32)
        vis = jnp.ones((1, K), jnp.float32)
        t = (
            gaussian_heatmap_targets(primary, vis, 56, 56)
            + 0.5 * gaussian_heatmap_targets(secondary, vis, 56, 56)
        )
        cg, _ = soft_argmax(t)
        cw, _ = soft_argmax_windowed(t)
        # Global: pulled ~1/3 of the way to the secondary mode.
        assert float(jnp.min(jnp.abs(cg - primary))) > 0.2
        # Windowed: within one cell of the true dominant mode.
        assert float(jnp.max(jnp.abs(cw - primary))) < 2.0 / 56

    def test_windowed_decode_in_model(self):
        """kp_decode='windowed' wires through HMRModel; bad value raises."""
        cfg = HMRConfig(
            encoder="resnet18", kp_head=True, kp_head_filters=32,
            kp_decode="windowed",
        )
        model = HMRModel(config=cfg)
        imgs = jnp.asarray(
            np.random.default_rng(6).normal(size=(1, 64, 64, 3)).astype(np.float32)
        )
        variables = model.init(jax.random.key(0), imgs)
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, imgs)
        assert out.kp2d_det.shape == (1, NUM_KP, 2)
        assert np.isfinite(np.asarray(out.kp2d_det)).all()
        bad = HMRModel(config=HMRConfig(
            encoder="resnet18", kp_head=True, kp_head_filters=32,
            kp_decode="nope",
        ))
        with pytest.raises(ValueError, match="kp_decode"):
            bad.init(jax.random.key(0), imgs)

    def test_heatmap_loss_zero_on_exact_and_masks_invisible(self):
        rng = np.random.default_rng(2)
        kp = jnp.asarray(_random_kp(rng, 2, NUM_KP))
        vis = jnp.ones((2, NUM_KP), jnp.float32)
        t = gaussian_heatmap_targets(kp, vis, 32, 32)
        assert float(heatmap_loss(t, kp, vis)) < 1e-12
        # Corrupt ONE joint's map; masking that joint removes the loss.
        bad = t.at[:, :, :, 5].add(1.0)
        assert float(heatmap_loss(bad, kp, vis)) > 1e-3
        vis_m = vis.at[:, 5].set(0.0)
        assert float(heatmap_loss(bad, kp, vis_m)) < 1e-12


class TestHMRWiring:
    @pytest.fixture(scope="class")
    def kp_model_and_vars(self):
        cfg = HMRConfig(encoder="resnet18", kp_head=True, kp_head_filters=32)
        model = HMRModel(config=cfg)
        imgs = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
        )
        variables = model.init(jax.random.key(0), imgs)
        return model, variables, imgs

    def test_output_shapes(self, kp_model_and_vars):
        model, variables, imgs = kp_model_and_vars
        out = model.apply(variables, imgs, train=False)
        # 64px crop -> 2x2 spatial -> 3 deconvs -> 16x16 maps.
        assert out.heatmaps.shape == (2, 16, 16, NUM_KP)
        assert out.kp2d_det.shape == (2, NUM_KP, 2)
        assert out.kp_conf.shape == (2, NUM_KP)
        assert float(jnp.max(jnp.abs(out.kp2d_det))) <= 1.0
        assert "kp_head" in variables["params"]

    def test_theta_identical_to_headless_model(self, kp_model_and_vars):
        """The head is a pure ADD-ON: encoder/regressor params from the
        kp_head model produce bit-identical theta through the headless
        model (the spatial-return refactor must not perturb pooling)."""
        model, variables, imgs = kp_model_and_vars
        out = model.apply(variables, imgs, train=False)
        headless = HMRModel(config=HMRConfig(encoder="resnet18"))
        sub = {
            "params": {k: v for k, v in variables["params"].items() if k != "kp_head"},
            "batch_stats": variables["batch_stats"],
        }
        out2 = headless.apply(sub, imgs, train=False)
        np.testing.assert_array_equal(np.asarray(out.theta), np.asarray(out2.theta))
        assert out2.heatmaps is None and out2.kp2d_det is None

    def test_vit_encoder_head(self):
        """ViT: the patch-token grid feeds the head (auto 2 deconvs ->
        stride-4 maps, matching the resnet head resolution)."""
        model = HMRModel(config=HMRConfig(encoder="vit_ti16", kp_head=True,
                                          kp_head_filters=32))
        imgs = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 64, 64, 3)).astype(np.float32)
        )
        variables = model.init(jax.random.key(0), imgs)
        out = model.apply(variables, imgs, train=False)
        # 64px crop, patch 16 -> 4x4 tokens -> 2 deconvs -> 16x16 (stride 4).
        assert out.heatmaps.shape == (2, 16, 16, NUM_KP)
        assert out.kp2d_det.shape == (2, NUM_KP, 2)

    def test_hourglass_encoder_head(self):
        """Hourglass: the pre-pool map is already stride 4 — zero deconvs."""
        model = HMRModel(config=HMRConfig(encoder="hourglass", kp_head=True,
                                          kp_head_filters=32))
        imgs = jnp.asarray(
            np.random.default_rng(4).normal(size=(1, 64, 64, 3)).astype(np.float32)
        )
        variables = model.init(jax.random.key(0), imgs)
        out = model.apply(variables, imgs, train=False)
        assert out.heatmaps.shape == (1, 16, 16, NUM_KP)
        assert out.kp_conf.shape == (1, NUM_KP)


class TestTraining:
    def test_train_step_learns_heatmaps(self):
        """Overfit smoke: with kp_heatmap weight on, the heatmap loss is
        reported and decreases on a repeated batch."""
        import dataclasses

        from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model
        from human_3d_reconstruction_tpu.train.trainer import (
            TrainConfig,
            create_states,
            make_jitted_train_step,
        )

        smpl_model = synthetic_smpl_model(seed=0)
        config = TrainConfig(
            crop_size=32,
            use_adversarial=False,
            aug_rot_max=0.0,
            aug_scale_jitter=0.0,
            aug_flip=False,
            hmr=HMRConfig(
                encoder="resnet18", hidden_size=64, kp_head=True,
                kp_head_filters=32,
            ),
        )
        config = dataclasses.replace(
            config,
            loss_weights=dataclasses.replace(config.loss_weights, kp_heatmap=100.0),
        )
        gen, disc, model, disc_mod, g_tx, d_tx = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        step_fn = make_jitted_train_step(
            config, model, disc_mod, g_tx, d_tx, donate=False
        )
        rng = np.random.default_rng(0)
        B = 4
        batch = {
            "images": rng.uniform(0, 255, (B, 48, 48, 3)).astype(np.float32),
            "centers": np.full((B, 2), 24.0, np.float32),
            "scales": np.full((B,), 40.0, np.float32),
            "kp2d": np.concatenate(
                [
                    rng.uniform(14, 34, (B, NUM_KP, 2)).astype(np.float32),
                    np.ones((B, NUM_KP, 1), np.float32),
                ],
                axis=2,
            ),
            "joints3d": rng.normal(0, 0.3, (B, NUM_KP, 3)).astype(np.float32),
            "has_3d": np.ones((B,), np.float32),
            "theta": np.zeros((B, 72), np.float32),
            "beta": np.zeros((B, 10), np.float32),
            "has_smpl": np.ones((B,), np.float32),
        }
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())
        mt = jnp.zeros((B, 72))
        mb = jnp.zeros((B, 10))
        key = jax.random.key(1)
        losses = []
        for _ in range(8):
            gen, disc, metrics = step_fn(gen, disc, smpl_params, batch, mt, mb, key)
            losses.append(float(metrics["loss_kp_hm"]))
        assert losses[-1] < losses[0], losses


class TestServingSelfRefine:
    def test_recover_without_kp2d(self):
        """Self-contained hybrid path: refine_steps with NO kp2d argument."""
        from human_3d_reconstruction_tpu.serving import MeshRecoverySession
        from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

        smpl_model = synthetic_smpl_model(seed=0)
        cfg = HMRConfig(
            encoder="resnet18", hidden_size=64, kp_head=True, kp_head_filters=32
        )
        model = HMRModel(config=cfg)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        session = MeshRecoverySession(
            variables, smpl_model, hmr_config=cfg, crop_size=64,
            smpl_path="xla", buckets=(2,), optimize=False,
        )
        frame = np.random.default_rng(0).uniform(0, 255, (96, 96, 3)).astype(np.uint8)
        boxes = np.asarray([[48.0, 48.0, 60.0], [40.0, 50.0, 50.0]], np.float32)
        people = session.recover(frame, boxes, refine_steps=3)
        assert len(people) == 2
        assert all(np.isfinite(p.theta).all() for p in people)
        # The refined thetas differ from the pure-regression ones.
        base = session.recover(frame, boxes)
        assert not np.allclose(people[0].theta, base[0].theta)

    def test_headless_model_still_requires_kp2d(self):
        from human_3d_reconstruction_tpu.serving import MeshRecoverySession
        from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

        smpl_model = synthetic_smpl_model(seed=0)
        cfg = HMRConfig(encoder="resnet18", hidden_size=64)
        model = HMRModel(config=cfg)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        session = MeshRecoverySession(
            variables, smpl_model, hmr_config=cfg, crop_size=64,
            smpl_path="xla", buckets=(2,), optimize=False,
        )
        frame = np.zeros((96, 96, 3), np.uint8)
        with pytest.raises(ValueError, match="kp2d"):
            session.recover(frame, [[48.0, 48.0, 60.0]], refine_steps=3)
