"""Dataset-derived IEF mean seed (VERDICT r2 item 6).

Covers the rotation-mean math (chordal SO(3) mean, not naive axis-angle
averaging), persistence, and the wiring: a non-default mean must reach the
IEFRegressor and change its iteration-0 output, and inference CLIs must
restore the persisted file.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.smpl.mean_params import (
    _log_so3_np,
    _rodrigues_np,
    load_mean_params,
    maybe_load_mean_params,
    mean_params_file,
    mean_params_from_pool,
    resolve_mean_params,
    save_mean_params,
)

pytestmark = pytest.mark.fast  # pre-commit lane: `pytest -m fast` (<5 min warm)


class TestRotationMean:
    def test_rodrigues_log_roundtrip(self, rng):
        aa = rng.normal(scale=1.0, size=(50, 3))
        back = _log_so3_np(_rodrigues_np(aa))
        # Round trip up to the 2-pi ambiguity: compare rotation matrices.
        np.testing.assert_allclose(
            _rodrigues_np(back), _rodrigues_np(aa), atol=1e-8
        )

    def test_identical_pool_mean_is_the_pose(self, rng):
        theta = rng.normal(scale=0.7, size=(1, 72))
        pool = np.repeat(theta, 16, axis=0)
        betas = rng.normal(size=(16, 10))
        mean = mean_params_from_pool(pool, betas)
        np.testing.assert_allclose(
            _rodrigues_np(mean[:72].reshape(24, 3)),
            _rodrigues_np(theta.reshape(24, 3)),
            atol=1e-5,
        )
        np.testing.assert_allclose(mean[72:82], betas.mean(0), atol=1e-6)
        np.testing.assert_allclose(mean[82:], [0.9, 0.0, 0.0], atol=0)

    def test_chordal_mean_beats_linear_mean_at_wraparound(self):
        """Two rotations of +/-(pi - 0.1) about x: the linear axis-angle mean
        is ~0 (identity) but the true rotation mean is one of the two near-pi
        rotations' geodesic midpoint — which here is angle pi-ish about x or
        the identity? The two rotations differ by ~0.2 rad, so their mean
        must stay within ~0.1 rad of EACH, far from the identity."""
        a = np.zeros((2, 72))
        a[0, 0] = np.pi - 0.1
        a[1, 0] = -(np.pi - 0.1)
        mean = mean_params_from_pool(a, np.zeros((2, 10)))
        R_mean = _rodrigues_np(mean[:3][None])[0]
        R_a = _rodrigues_np(a[0, :3][None])[0]
        # Geodesic distance to member 0 should be ~0.1 rad, not ~pi.
        cos = np.clip((np.trace(R_mean.T @ R_a) - 1) / 2, -1, 1)
        assert np.arccos(cos) < 0.2, np.arccos(cos)

    def test_near_pi_log_finite(self):
        aa = np.array([[np.pi, 0.0, 0.0], [0.0, np.pi - 1e-9, 0.0]])
        out = _log_so3_np(_rodrigues_np(aa))
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(_rodrigues_np(out), _rodrigues_np(aa), atol=1e-6)


class TestPersistenceAndWiring:
    def test_roundtrip_and_maybe_load(self, tmp_path, rng):
        mean = mean_params_from_pool(
            rng.normal(scale=0.3, size=(32, 72)), rng.normal(size=(32, 10))
        )
        save_mean_params(mean_params_file(tmp_path), mean)
        np.testing.assert_array_equal(load_mean_params(mean_params_file(tmp_path)), mean)
        np.testing.assert_array_equal(maybe_load_mean_params(tmp_path), mean)
        assert maybe_load_mean_params(tmp_path / "nonexistent") is None

    def test_resolve_specs(self, tmp_path, rng):
        from human_3d_reconstruction_tpu.data.datasets import MoshParamSource

        assert resolve_mean_params("", tmp_path) is None
        mosh = MoshParamSource(
            rng.normal(scale=0.3, size=(64, 72)).astype(np.float32),
            rng.normal(size=(64, 10)).astype(np.float32),
        )
        mean = resolve_mean_params("mosh", tmp_path, mosh)
        assert mean.shape == (85,)
        # persisted for inference restore
        np.testing.assert_array_equal(maybe_load_mean_params(tmp_path), mean)
        # path spec loads the same file
        np.testing.assert_array_equal(
            resolve_mean_params(str(mean_params_file(tmp_path)), tmp_path), mean
        )
        with pytest.raises(ValueError):
            resolve_mean_params("mosh", tmp_path, None)

    def test_resolve_mirrors_and_clears_the_canonical_seed(self, tmp_path, rng):
        """Inference unconditionally restores <ckpt>/mean_params.npz, so
        training must keep that file in sync with the seed it actually
        used: a path spec mirrors into the dir, and the neutral '' spec
        REMOVES a stale seed left by an earlier run."""
        from human_3d_reconstruction_tpu.data.datasets import MoshParamSource

        mosh = MoshParamSource(
            rng.normal(scale=0.3, size=(32, 72)).astype(np.float32),
            rng.normal(size=(32, 10)).astype(np.float32),
        )
        # external npz spec -> mirrored into the checkpoint dir
        ext_dir = tmp_path / "elsewhere"
        mean = resolve_mean_params("mosh", ext_dir, mosh)
        ckpt = tmp_path / "ckpt"
        got = resolve_mean_params(str(mean_params_file(ext_dir)), ckpt)
        np.testing.assert_array_equal(got, mean)
        np.testing.assert_array_equal(maybe_load_mean_params(ckpt), mean)
        # retrain in the same dir with the neutral seed -> stale file gone
        assert resolve_mean_params("", ckpt) is None
        assert maybe_load_mean_params(ckpt) is None

    def test_mean_changes_iteration0_output(self, smpl_model, rng):
        """create_states(mean_params=...) must propagate to the regressor:
        iteration-0 params of the two seeds differ by ~the seed difference."""
        from human_3d_reconstruction_tpu.train.trainer import TrainConfig, create_states

        config = TrainConfig(crop_size=32)
        mean = mean_params_from_pool(
            rng.normal(scale=0.5, size=(16, 72)), rng.normal(size=(16, 10))
        )
        img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

        outs = {}
        for key, mp in (("default", None), ("mosh", mean)):
            gen, _, model, *_ = create_states(
                config, jax.random.key(0), smpl_model.as_dict(), mean_params=mp
            )
            out = model.apply(
                {"params": gen.params, "batch_stats": gen.batch_stats}, img
            )
            outs[key] = np.asarray(out.all_params[0])
        assert model.mean_params is not None
        diff = np.abs(outs["mosh"] - outs["default"]).max()
        assert diff > 0.01, diff  # seeds differ -> iteration-0 differs

    def test_build_model_restores_persisted_mean(self, tmp_path, rng):
        from human_3d_reconstruction_tpu.cli.common import build_model
        from human_3d_reconstruction_tpu.config import PRESETS

        mean = mean_params_from_pool(
            rng.normal(scale=0.3, size=(8, 72)), rng.normal(size=(8, 10))
        )
        save_mean_params(mean_params_file(tmp_path), mean)
        config = dataclasses.replace(
            PRESETS["single_image"], checkpoint_dir=str(tmp_path)
        )
        model = build_model(config)
        np.testing.assert_allclose(np.asarray(model.mean_params), mean, atol=0)
        # No persisted file -> neutral default.
        config2 = dataclasses.replace(
            PRESETS["single_image"], checkpoint_dir=str(tmp_path / "empty")
        )
        assert build_model(config2).mean_params is None

    def test_build_model_seed_follows_checkpoint_arg(self, tmp_path, rng):
        """The seed must come from the SAME dir as the restored weights
        (ADVICE r3): --checkpoint=<run> resolves <run>/mean_params.npz,
        --checkpoint=<run>/best resolves the parent's seed, and a seedless
        run dir yields the neutral seed even when config.checkpoint_dir
        points at a directory that HAS a (different run's) seed."""
        from human_3d_reconstruction_tpu.cli.common import build_model
        from human_3d_reconstruction_tpu.config import PRESETS

        other = tmp_path / "other_run"
        other.mkdir()
        mean_other = mean_params_from_pool(
            rng.normal(scale=0.3, size=(8, 72)), rng.normal(size=(8, 10))
        )
        save_mean_params(mean_params_file(other), mean_other)

        run = tmp_path / "run"
        (run / "best").mkdir(parents=True)
        mean_run = mean_params_from_pool(
            rng.normal(scale=0.5, size=(8, 72)), rng.normal(size=(8, 10))
        )
        save_mean_params(mean_params_file(run), mean_run)

        config = dataclasses.replace(
            PRESETS["single_image"], checkpoint_dir=str(other)
        )
        # --checkpoint=<run>: seed from <run>, NOT config.checkpoint_dir
        m = build_model(config, {"checkpoint": str(run)})
        np.testing.assert_allclose(np.asarray(m.mean_params), mean_run, atol=0)
        # --checkpoint=<run>/best: seed from the parent run dir
        m = build_model(config, {"checkpoint": str(run / "best")})
        np.testing.assert_allclose(np.asarray(m.mean_params), mean_run, atol=0)
        # seedless run dir: neutral seed, no fallback to another run's seed
        bare = tmp_path / "neutral_run"
        bare.mkdir()
        assert build_model(config, {"checkpoint": str(bare)}).mean_params is None
        # no --checkpoint: config.checkpoint_dir as before
        m = build_model(config, {})
        np.testing.assert_allclose(np.asarray(m.mean_params), mean_other, atol=0)

    def test_neutral_resolve_refuses_to_orphan_a_resumed_run(self, tmp_path, rng):
        """resolve_mean_params('') deletes a stale seed only in a FRESH dir;
        once checkpoints exist (auto-resume territory) it raises instead of
        silently switching the resumed run to the neutral seed (ADVICE r3)."""
        from human_3d_reconstruction_tpu.data.datasets import MoshParamSource

        mosh = MoshParamSource(
            rng.normal(scale=0.3, size=(16, 72)).astype(np.float32),
            rng.normal(size=(16, 10)).astype(np.float32),
        )
        ckpt = tmp_path / "ckpt"
        resolve_mean_params("mosh", ckpt, mosh)
        (ckpt / "100").mkdir()  # orbax step dir -> this dir is a live run
        with pytest.raises(ValueError, match="silently switch seeds"):
            resolve_mean_params("", ckpt)
        # the seed survives the refusal
        assert maybe_load_mean_params(ckpt) is not None
        # a 'best' subtree alone also counts as a live run
        ckpt2 = tmp_path / "ckpt2"
        resolve_mean_params("mosh", ckpt2, mosh)
        (ckpt2 / "best").mkdir()
        with pytest.raises(ValueError):
            resolve_mean_params("", ckpt2)
        # fresh dir (no checkpoints): stale seed removed as before
        ckpt3 = tmp_path / "ckpt3"
        resolve_mean_params("mosh", ckpt3, mosh)
        assert resolve_mean_params("", ckpt3) is None
        assert maybe_load_mean_params(ckpt3) is None
