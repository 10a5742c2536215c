"""Trainer integration: one fused step runs, loss decreases on a fixed batch,
checkpoint round-trips, DP sharding matches single-device (SURVEY.md
section 4 items 5/6).

Uses a small crop size to keep CPU runtime sane — the step function is
resolution-agnostic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.data.datasets import SyntheticImageDataset, collate
from human_3d_reconstruction_tpu.models.hmr import HMRConfig
from human_3d_reconstruction_tpu.parallel import make_mesh, replicate, shard_batch
from human_3d_reconstruction_tpu.train.trainer import (
    TrainConfig,
    create_states,
    make_checkpoint_manager,
    make_train_step,
    restore_latest,
    save_checkpoint,
)

CROP = 64


def small_config(**kw) -> TrainConfig:
    return TrainConfig(crop_size=CROP, g_lr=1e-4, d_lr=1e-4, hmr=HMRConfig(), **kw)


def batch_to_dict(batch) -> dict:
    return {
        "images": jnp.asarray(batch.images),
        "centers": jnp.asarray(batch.centers),
        "scales": jnp.asarray(batch.scales),
        "kp2d": jnp.asarray(batch.kp2d),
        "joints3d": jnp.asarray(batch.joints3d),
        "has_3d": jnp.asarray(batch.has_3d),
        "theta": jnp.asarray(batch.theta),
        "beta": jnp.asarray(batch.beta),
        "has_smpl": jnp.asarray(batch.has_smpl),
    }


@pytest.fixture(scope="module")
def setup(smpl_model):
    config = small_config()
    gen, disc, model, disc_mod, g_tx, d_tx = create_states(
        config, jax.random.key(0), smpl_model.as_dict()
    )
    step_fn = jax.jit(make_train_step(config, model, disc_mod, g_tx, d_tx))
    smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())
    ds = SyntheticImageDataset(smpl_model, n=8, frame_hw=(96, 96), seed=0)
    batch = batch_to_dict(collate([ds[i] for i in range(8)]))
    mosh_t = jnp.asarray(
        np.random.default_rng(5).normal(scale=0.2, size=(8, 72)).astype(np.float32)
    )
    mosh_b = jnp.asarray(
        np.random.default_rng(6).normal(size=(8, 10)).astype(np.float32)
    )
    return config, step_fn, gen, disc, smpl_params, batch, mosh_t, mosh_b


class TestTrainStep:
    def test_single_step_runs_and_is_finite(self, setup):
        _, step_fn, gen, disc, smpl_params, batch, mt, mb = setup
        new_gen, new_disc, metrics = step_fn(
            gen, disc, smpl_params, batch, mt, mb, jax.random.key(1)
        )
        assert int(new_gen.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
        # params actually moved
        moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), gen.params, new_gen.params)
        assert max(jax.tree.leaves(moved)) > 0

    def test_overfit_fixed_batch(self, setup):
        """Supervised loss drops on a repeated batch (SURVEY section 4 item 5)."""
        _, step_fn, gen, disc, smpl_params, batch, mt, mb = setup
        losses = []
        for i in range(12):
            gen, disc, metrics = step_fn(
                gen, disc, smpl_params, batch, mt, mb, jax.random.key(2)
            )
            supervised = (
                float(metrics["loss_kp2d"])
                + float(metrics["loss_3d"])
                + float(metrics["loss_param"])
            )
            losses.append(supervised)
        assert losses[-1] < losses[0] * 0.9, losses

    def test_hourglass_encoder_trains(self, smpl_model, setup):
        """The hourglass encoder variant runs the full adversarial G+D
        step and its supervised loss drops — the variant is trainable,
        not just forward-shape-correct (test_models covers that)."""
        config = TrainConfig(
            crop_size=CROP, g_lr=1e-4, d_lr=1e-4,
            hmr=HMRConfig(encoder="hourglass"),
        )
        gen, disc, model, disc_mod, g_tx, d_tx = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        step_fn = jax.jit(make_train_step(config, model, disc_mod, g_tx, d_tx))
        _, _, _, _, smpl_params, batch, mt, mb = setup
        losses = []
        for _ in range(8):
            gen, disc, metrics = step_fn(
                gen, disc, smpl_params, batch, mt, mb, jax.random.key(2)
            )
            losses.append(
                float(metrics["loss_kp2d"])
                + float(metrics["loss_3d"])
                + float(metrics["loss_param"])
            )
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_rot6d_regressor_trains(self, smpl_model, setup):
        """rot_rep='rot6d' runs the full adversarial G+D step and its
        supervised loss drops — the 6D stream's output-boundary conversion
        (rot6d -> axis-angle) backpropagates cleanly through every loss."""
        config = TrainConfig(
            crop_size=CROP, g_lr=1e-4, d_lr=1e-4,
            hmr=HMRConfig(encoder="resnet18", hidden_size=128, rot_rep="rot6d"),
        )
        gen, disc, model, disc_mod, g_tx, d_tx = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        step_fn = jax.jit(make_train_step(config, model, disc_mod, g_tx, d_tx))
        _, _, _, _, smpl_params, batch, mt, mb = setup
        losses = []
        for _ in range(8):
            gen, disc, metrics = step_fn(
                gen, disc, smpl_params, batch, mt, mb, jax.random.key(2)
            )
            losses.append(
                float(metrics["loss_kp2d"])
                + float(metrics["loss_3d"])
                + float(metrics["loss_param"])
            )
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_uint8_images_accepted(self, setup):
        """The host ships uint8 pixels (4x less H2D); the step casts on
        device and must match the f32 path on pre-quantized values."""
        _, step_fn, gen, disc, smpl_params, batch, mt, mb = setup
        quantized = jnp.clip(jnp.rint(batch["images"]), 0, 255)
        b_f32 = {**batch, "images": quantized}
        b_u8 = {**batch, "images": quantized.astype(jnp.uint8)}
        g_f, _, m_f = step_fn(gen, disc, smpl_params, b_f32, mt, mb, jax.random.key(3))
        g_u, _, m_u = step_fn(gen, disc, smpl_params, b_u8, mt, mb, jax.random.key(3))
        np.testing.assert_allclose(
            float(m_f["loss_g"]), float(m_u["loss_g"]), rtol=1e-5
        )

    def test_pallas_smpl_in_loss_matches_xla(self, smpl_model, setup):
        """The fused Pallas SMPL (Pallas fwd + Pallas bwd) inside the train
        loss must produce the same step as the XLA twin: identical metrics
        and updated params to f32 tolerance (interpret mode on CPU)."""
        from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
        from human_3d_reconstruction_tpu.ops.fused_smpl import smpl_forward_fused

        config, _, gen, disc, smpl_params, batch, mt, mb = setup
        _, _, model, disc_mod, g_tx, d_tx = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        prepared = prepare_fused_smpl(smpl_model.as_dict())
        step_xla = jax.jit(make_train_step(config, model, disc_mod, g_tx, d_tx))
        step_pal = jax.jit(
            make_train_step(
                config, model, disc_mod, g_tx, d_tx,
                smpl_apply=lambda _, t, b: smpl_forward_fused(prepared, t, b),
            )
        )
        gx, dx, m_xla = step_xla(gen, disc, smpl_params, batch, mt, mb, jax.random.key(1))
        gp, dp, m_pal = step_pal(gen, disc, smpl_params, batch, mt, mb, jax.random.key(1))
        for k in m_xla:
            np.testing.assert_allclose(
                float(m_xla[k]), float(m_pal[k]), rtol=1e-4, atol=1e-5, err_msg=k
            )
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), gx.params, gp.params
        )
        assert max(jax.tree.leaves(diffs)) < 1e-4, max(jax.tree.leaves(diffs))

    def test_no_adversarial_mode(self, smpl_model, setup):
        config = small_config(use_adversarial=False)
        gen, disc, model, disc_mod, g_tx, d_tx = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        step_fn = jax.jit(make_train_step(config, model, disc_mod, g_tx, d_tx))
        _, _, _, _, smpl_params, batch, mt, mb = setup
        _, new_disc, metrics = step_fn(gen, disc, smpl_params, batch, mt, mb, jax.random.key(0))
        assert "loss_d" not in metrics
        # disc untouched
        same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)), disc.params, new_disc.params)
        assert all(jax.tree.leaves(same))


class TestDataParallel:
    def test_sharded_step_matches_unsharded(self, setup):
        """DP over the 8-device CPU mesh == single-device math
        (SURVEY.md section 4 item 6)."""
        _, step_fn, gen, disc, smpl_params, batch, mt, mb = setup
        ref_gen, _, ref_metrics = step_fn(
            gen, disc, smpl_params, batch, mt, mb, jax.random.key(3)
        )

        mesh = make_mesh()
        assert mesh.devices.size == 8
        sharded_batch = shard_batch(batch, mesh)
        gen_r = replicate(gen, mesh)
        disc_r = replicate(disc, mesh)
        smpl_r = replicate(smpl_params, mesh)
        dp_gen, _, dp_metrics = step_fn(
            gen_r, disc_r, smpl_r, sharded_batch, mt, mb, jax.random.key(3)
        )

        np.testing.assert_allclose(
            float(dp_metrics["loss_g"]), float(ref_metrics["loss_g"]), rtol=2e-4
        )
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), ref_gen.params, dp_gen.params
        )
        # AdamW normalizes the gradient, so ulp-level reduction-order noise
        # in sharded grads surfaces at the learning-rate scale (1e-4);
        # anything well under 1e-3 means the DP math is equivalent.
        assert max(jax.tree.leaves(diffs)) < 5e-4


class TestCheckpoint:
    def test_save_restore_roundtrip(self, setup, tmp_path):
        _, step_fn, gen, disc, smpl_params, batch, mt, mb = setup
        gen1, disc1, _ = step_fn(gen, disc, smpl_params, batch, mt, mb, jax.random.key(4))
        mgr = make_checkpoint_manager(str(tmp_path / "ckpt"))
        save_checkpoint(mgr, 1, gen1, disc1)
        mgr.wait_until_finished()

        restored_gen, restored_disc, step = restore_latest(mgr, gen, disc)
        assert step == 1
        same = jax.tree.map(
            lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
            jax.device_get(gen1.params),
            restored_gen.params,
        )
        assert all(jax.tree.leaves(same))

    def test_restore_empty_returns_template(self, setup, tmp_path):
        _, _, gen, disc, *_ = setup
        mgr = make_checkpoint_manager(str(tmp_path / "empty_ckpt"))
        g, d, step = restore_latest(mgr, gen, disc)
        assert step == 0

    def test_restore_inference_specific_step(self, setup, tmp_path):
        """restore_inference_variables(step=N) picks the requested save
        (e.g. the best-val step of an --eval_every run), not the newest,
        and names the available steps when N doesn't exist."""
        from human_3d_reconstruction_tpu.train.trainer import (
            restore_inference_variables,
        )

        _, step_fn, gen, disc, smpl_params, batch, mt, mb = setup
        gen1, disc1, _ = step_fn(gen, disc, smpl_params, batch, mt, mb, jax.random.key(4))
        mgr = make_checkpoint_manager(str(tmp_path / "steps_ckpt"))
        save_checkpoint(mgr, 5, gen, disc)     # older weights
        save_checkpoint(mgr, 7, gen1, disc1)   # newest weights
        mgr.wait_until_finished()

        template = {
            "params": jax.device_get(gen.params),
            "batch_stats": jax.device_get(gen.batch_stats),
        }
        v5, step = restore_inference_variables(mgr, template, step=5)
        assert step == 5
        leaf5 = np.asarray(jax.tree.leaves(v5["params"])[0])
        leaf_old = np.asarray(jax.tree.leaves(jax.device_get(gen.params))[0])
        np.testing.assert_allclose(leaf5, leaf_old)

        v_latest, step = restore_inference_variables(mgr, template)
        assert step == 7

        with pytest.raises(ValueError, match=r"\[5, 7\]"):
            restore_inference_variables(mgr, template, step=6)


class TestSpinFitting:
    """SPIN-style in-graph fitting supervision (TrainConfig.spin_fit_steps)."""

    @pytest.fixture(scope="class")
    def spin_setup(self, smpl_model):
        import dataclasses

        config = TrainConfig(
            crop_size=CROP, g_lr=1e-4, d_lr=1e-4,
            hmr=HMRConfig(encoder="resnet18", hidden_size=128),
            spin_fit_steps=8,
        )
        config = dataclasses.replace(
            config,
            loss_weights=dataclasses.replace(config.loss_weights, spin=60.0),
        )
        gen, disc, model, disc_mod, g_tx, d_tx = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        step_fn = jax.jit(make_train_step(config, model, disc_mod, g_tx, d_tx))
        return config, step_fn, gen, disc

    def test_step_runs_and_metrics_present(self, spin_setup, setup):
        _, step_fn, gen, disc = spin_setup
        _, _, _, _, smpl_params, batch, mt, mb = setup
        batch = {**batch, "has_smpl": jnp.zeros_like(batch["has_smpl"])}
        new_gen, _, metrics = step_fn(
            gen, disc, smpl_params, batch, mt, mb, jax.random.key(1)
        )
        assert "loss_spin" in metrics and "spin_accept_frac" in metrics
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
        frac = float(metrics["spin_accept_frac"])
        assert 0.0 <= frac <= 1.0

    def test_real_gt_excluded(self, spin_setup, setup):
        """Samples WITH real SMPL GT never get pseudo-GT supervision: with
        has_smpl all-ones the spin loss is exactly zero."""
        _, step_fn, gen, disc = spin_setup
        _, _, _, _, smpl_params, batch, mt, mb = setup
        batch = {**batch, "has_smpl": jnp.ones_like(batch["has_smpl"])}
        _, _, metrics = step_fn(
            gen, disc, smpl_params, batch, mt, mb, jax.random.key(1)
        )
        assert float(metrics["loss_spin"]) == 0.0
        assert float(metrics["spin_accept_frac"]) == 0.0

    def test_fits_accepted_as_training_progresses(self, spin_setup, setup):
        """With no SMPL GT anywhere, the gate eventually accepts fits (the
        fitter only has to beat the raw prediction at the mean pose)."""
        _, step_fn, gen, disc = spin_setup
        _, _, _, _, smpl_params, batch, mt, mb = setup
        batch = {**batch, "has_smpl": jnp.zeros_like(batch["has_smpl"])}
        fracs = []
        for i in range(6):
            gen, disc, metrics = step_fn(
                gen, disc, smpl_params, batch, mt, mb, jax.random.key(i)
            )
            fracs.append(float(metrics["spin_accept_frac"]))
        assert max(fracs) > 0.0, fracs


class TestAugmentedTraining:
    def test_step_with_full_augmentation(self, smpl_model, setup):
        """Rotation/scale/flip aug enabled -> gather preprocess path in the
        train step still produces finite losses and updates."""
        config = small_config(
            aug_rot_max=0.3, aug_scale_jitter=0.1, aug_flip=True
        )
        gen, disc, model, disc_mod, g_tx, d_tx = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        step_fn = jax.jit(make_train_step(config, model, disc_mod, g_tx, d_tx))
        _, _, _, _, smpl_params, batch, mt, mb = setup
        new_gen, _, metrics = step_fn(
            gen, disc, smpl_params, batch, mt, mb, jax.random.key(9)
        )
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
        assert int(new_gen.step) == 1


class TestInferenceRestore:
    def test_restore_variables_from_training_checkpoint(self, setup, tmp_path):
        """Inference CLIs restore {params, batch_stats} out of a GenState
        checkpoint (regression: demo --checkpoint failed on tree mismatch)."""
        from human_3d_reconstruction_tpu.train.trainer import (
            restore_inference_variables,
        )

        _, step_fn, gen, disc, smpl_params, batch, mt, mb = setup
        gen1, disc1, _ = step_fn(gen, disc, smpl_params, batch, mt, mb, jax.random.key(8))
        mgr = make_checkpoint_manager(str(tmp_path / "ckpt_inf"))
        save_checkpoint(mgr, 1, gen1, disc1)
        mgr.wait_until_finished()

        template = {"params": gen.params, "batch_stats": gen.batch_stats}
        variables, step = restore_inference_variables(mgr, template)
        assert step == 1
        same = jax.tree.map(
            lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
            jax.device_get(gen1.params),
            variables["params"],
        )
        assert all(jax.tree.leaves(same))
        assert set(variables) == {"params", "batch_stats"}

    def test_restore_empty_dir_returns_template(self, setup, tmp_path):
        from human_3d_reconstruction_tpu.train.trainer import (
            restore_inference_variables,
        )

        _, _, gen, *_ = setup
        mgr = make_checkpoint_manager(str(tmp_path / "none"))
        template = {"params": gen.params, "batch_stats": gen.batch_stats}
        variables, step = restore_inference_variables(mgr, template)
        assert step == 0 and variables is template


class TestDataEchoing:
    def test_echoed_steps_draw_fresh_augmentations(self, setup):
        """Echoing's soundness rests on per-step on-device augmentation:
        the trainer folds gen_state.step into the aug RNG, so the E echo
        steps of one host batch train on E different augmented views."""
        from human_3d_reconstruction_tpu.train.trainer import _device_preprocess

        config = small_config(aug_flip=True, aug_scale_jitter=0.2)
        _, _, _, _, _, batch, _, _ = setup
        key = jax.random.key(7)
        # exactly the trainer's fold: rng_aug = split(fold_in(rng, step))[0]
        crops0, *_ = _device_preprocess(
            config, batch, jax.random.split(jax.random.fold_in(key, 0))[0]
        )
        crops1, *_ = _device_preprocess(
            config, batch, jax.random.split(jax.random.fold_in(key, 1))[0]
        )
        assert not np.allclose(np.asarray(crops0), np.asarray(crops1))


class TestLrSchedule:
    def test_cosine_schedule_decays_updates(self, smpl_model):
        """create_states(lr_schedule='cosine') must shrink the generator's
        update magnitude as the step count advances."""
        import optax

        from human_3d_reconstruction_tpu.train.trainer import TrainConfig, create_states

        config = TrainConfig(
            crop_size=32, lr_schedule="cosine", lr_decay_steps=10
        )
        gen, _, _, _, g_tx, _ = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        grads = jax.tree.map(jnp.ones_like, gen.params)
        opt_state = gen.opt_state
        norms = []
        params = gen.params
        for _ in range(10):
            updates, opt_state = g_tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            norms.append(float(optax.global_norm(updates)))
        assert norms[-1] < 0.2 * norms[1], norms  # decayed to ~5%

    def test_unknown_schedule_raises(self, smpl_model):
        from human_3d_reconstruction_tpu.train.trainer import TrainConfig, create_states

        with pytest.raises(ValueError):
            create_states(
                TrainConfig(crop_size=32, lr_schedule="warmup", lr_decay_steps=5),
                jax.random.key(0), smpl_model.as_dict(),
            )

    def test_inference_restore_from_cosine_checkpoint(self, smpl_model, tmp_path):
        """A checkpoint trained with lr_schedule='cosine' has a different
        adamw state STRUCTURE (scale_by_schedule step count); the inference
        restore must handle both forms."""
        from human_3d_reconstruction_tpu.train.trainer import (
            TrainConfig,
            create_states,
            make_checkpoint_manager,
            restore_inference_variables,
            save_checkpoint,
        )

        config = TrainConfig(crop_size=32, lr_schedule="cosine", lr_decay_steps=100)
        gen, disc, model, *_ = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        mgr = make_checkpoint_manager(str(tmp_path / "ck"))
        save_checkpoint(mgr, 5, gen, disc)
        mgr.wait_until_finished()

        template = {"params": gen.params, "batch_stats": gen.batch_stats}
        mgr2 = make_checkpoint_manager(str(tmp_path / "ck"))
        variables, step = restore_inference_variables(mgr2, template)
        assert step == 5
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(variables["params"])[0]),
            np.asarray(jax.tree.leaves(gen.params)[0]),
        )

    def test_checkpoint_meta_tags_optimizer_structure(self, smpl_model, tmp_path):
        """save_checkpoint persists the g-optimizer structure tag (VERDICT
        r3 weak #5) so restore rebuilds the exact skeleton with no
        exception probing; a pre-r4 checkpoint WITHOUT the meta item still
        restores via the legacy probe path."""
        import shutil

        from human_3d_reconstruction_tpu.train.trainer import (
            TrainConfig,
            _opt_structure_tag,
            create_states,
            make_checkpoint_manager,
            restore_inference_variables,
            save_checkpoint,
        )

        for schedule, want_tag in (("", "adamw"), ("cosine", "adamw+schedule")):
            config = TrainConfig(
                crop_size=32, lr_schedule=schedule,
                lr_decay_steps=100 if schedule else 0,
            )
            gen, disc, *_ = create_states(
                config, jax.random.key(0), smpl_model.as_dict()
            )
            assert _opt_structure_tag(gen.params, gen.opt_state) == want_tag
            d = tmp_path / f"ck_{want_tag.replace('+', '_')}"
            mgr = make_checkpoint_manager(str(d))
            save_checkpoint(mgr, 3, gen, disc)
            mgr.wait_until_finished()
            # the meta item landed on disk next to gen/disc
            metas = list(d.glob("*/meta"))
            assert metas, list(d.rglob("*"))
            template = {"params": gen.params, "batch_stats": gen.batch_stats}
            variables, step = restore_inference_variables(
                make_checkpoint_manager(str(d)), template
            )
            assert step == 3
            # legacy shape: deleting the meta item falls back to probing
            shutil.rmtree(metas[0])
            variables, step = restore_inference_variables(
                make_checkpoint_manager(str(d)), template
            )
            assert step == 3


class TestAugModeValidation:
    def test_unknown_rot_mode_raises(self, setup):
        """A typo'd mode must fail loudly, not fall through to the 90x
        slower per-sample gather branch."""
        from human_3d_reconstruction_tpu.train.trainer import _device_preprocess

        config = small_config(aug_rot_max=0.3, aug_rot_mode="Batch")
        _, _, _, _, _, batch, _, _ = setup
        with pytest.raises(ValueError, match="aug_rot_mode"):
            _device_preprocess(config, batch, jax.random.key(0))
