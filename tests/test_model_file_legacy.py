"""Legacy SMPL .pkl loading (chumpy-pickled) and eval index streaming."""

import pickle
import sys
import types

import numpy as np
import pytest

from human_3d_reconstruction_tpu.smpl import load_smpl_model


def make_chumpy_style_pkl(path, model):
    """Craft a pickle that references chumpy.ch.Ch without chumpy installed,
    by injecting a stand-in module during dumping (mimics real SMPL pkls)."""

    class Ch:
        def __init__(self, x):
            self.x = np.asarray(x)

        def __reduce__(self):
            # classic chumpy objects pickle via class + state dict
            return (_reconstruct_ch, (self.x,))

    def _reconstruct_ch(x):
        c = Ch.__new__(Ch)
        c.x = x
        return c

    # Register fake module so pickle records "chumpy.ch" as the source.
    mod = types.ModuleType("chumpy")
    sub = types.ModuleType("chumpy.ch")
    Ch.__module__ = "chumpy.ch"
    Ch.__qualname__ = "Ch"
    _reconstruct_ch.__module__ = "chumpy.ch"
    _reconstruct_ch.__qualname__ = "_reconstruct_ch"
    sub.Ch = Ch
    sub._reconstruct_ch = _reconstruct_ch
    mod.ch = sub
    sys.modules["chumpy"] = mod
    sys.modules["chumpy.ch"] = sub
    try:
        # kintree legacy layout: (2, 24) with 4294967295 at root
        kintree = np.stack(
            [
                np.where(model.kintree_parents < 0, 4294967295, model.kintree_parents).astype(
                    np.int64
                ),
                np.arange(24, dtype=np.int64),
            ]
        )
        blob = {
            "v_template": Ch(model.v_template),
            "shapedirs": Ch(model.shapedirs),
            "posedirs": model.posedirs.reshape(6890 * 3, -1),  # legacy flat layout
            "J_regressor": model.J_regressor,
            "weights": Ch(model.weights),
            "kintree_table": kintree,
            "f": model.faces,
        }
        with open(path, "wb") as f:
            pickle.dump(blob, f, protocol=2)
    finally:
        del sys.modules["chumpy"]
        del sys.modules["chumpy.ch"]


class TestLegacyPkl:
    def test_chumpy_pkl_loads_without_chumpy(self, tmp_path, smpl_model):
        assert "chumpy" not in sys.modules
        pkl = tmp_path / "smpl_legacy.pkl"
        make_chumpy_style_pkl(pkl, smpl_model)
        assert "chumpy" not in sys.modules  # dump-time shim cleaned up

        loaded = load_smpl_model(pkl)
        np.testing.assert_allclose(loaded.v_template, smpl_model.v_template, atol=1e-6)
        np.testing.assert_allclose(loaded.posedirs, smpl_model.posedirs, atol=1e-6)
        np.testing.assert_array_equal(loaded.kintree_parents, smpl_model.kintree_parents)
        assert loaded.kintree_parents[0] == -1  # 4294967295 normalized

    def test_loaded_model_forward_matches(self, tmp_path, smpl_model, rng):
        import jax.numpy as jnp

        from human_3d_reconstruction_tpu.smpl import smpl_forward

        pkl = tmp_path / "smpl_legacy.pkl"
        make_chumpy_style_pkl(pkl, smpl_model)
        loaded = load_smpl_model(pkl)

        pose = jnp.asarray(rng.normal(0, 0.5, (2, 72)).astype(np.float32))
        betas = jnp.asarray(rng.normal(size=(2, 10)).astype(np.float32))
        a = smpl_forward(smpl_model.as_dict(), pose, betas)
        b = smpl_forward(loaded.as_dict(), pose, betas)
        np.testing.assert_allclose(np.asarray(a.verts), np.asarray(b.verts), atol=1e-5)


class TestEvalIndexStreaming:
    def test_load_eval_batches_with_actions(self, tmp_path, rng):
        import cv2

        from human_3d_reconstruction_tpu.eval.protocol import load_eval_batches

        n = 5
        paths = []
        for i in range(n):
            p = f"f{i}.png"
            cv2.imwrite(str(tmp_path / p), rng.integers(0, 255, (50, 60, 3)).astype(np.uint8))
            paths.append(p)
        np.savez(
            tmp_path / "h36m_idx.npz",
            image_paths=np.asarray(paths),
            centers=np.tile([[30.0, 25.0]], (n, 1)).astype(np.float32),
            scales=np.full((n,), 40.0, np.float32),
            keypoints=rng.normal(size=(n, 17, 3)).astype(np.float32),
            joints3d=rng.normal(scale=0.3, size=(n, 17, 3)).astype(np.float32),
            actions=np.asarray([0, 0, 1, 2, 2], np.int64),
        )
        batches = list(load_eval_batches(tmp_path / "h36m_idx.npz", batch_size=2))
        assert len(batches) == 3  # 2+2+1(padded to 2)
        # The ragged tail is padded to the full batch so one compiled program
        # serves the whole eval run; n_valid marks the real frames.
        assert all(b.images.shape[0] == 2 for b in batches)
        assert [b.n_valid for b in batches] == [2, 2, 1]
        assert batches[0].gt_joints3d.shape == (2, 14, 3)
        np.testing.assert_array_equal(batches[1].actions, [1, 2])
        np.testing.assert_array_equal(batches[2].actions, [2, 2])  # pad repeats last

    def test_padded_tail_scores_only_real_frames(self, tmp_path, rng):
        import cv2

        from human_3d_reconstruction_tpu.eval.protocol import (
            load_eval_batches,
            run_protocol,
        )

        n = 3
        paths = []
        for i in range(n):
            p = f"g{i}.png"
            cv2.imwrite(str(tmp_path / p), rng.integers(0, 255, (50, 60, 3)).astype(np.uint8))
            paths.append(p)
        np.savez(
            tmp_path / "idx.npz",
            image_paths=np.asarray(paths),
            centers=np.tile([[30.0, 25.0]], (n, 1)).astype(np.float32),
            scales=np.full((n,), 40.0, np.float32),
            keypoints=rng.normal(size=(n, 17, 3)).astype(np.float32),
            joints3d=rng.normal(scale=0.3, size=(n, 17, 3)).astype(np.float32),
        )
        shapes_seen = set()
        batches = list(load_eval_batches(tmp_path / "idx.npz", batch_size=2))

        def predict(images, centers, scales, batch=None):
            shapes_seen.add(images.shape)
            return batch.gt_joints3d  # perfect prediction incl. pad rows

        report = run_protocol(predict, iter(batches))
        assert report.num_frames == 3  # pads not counted
        assert len(shapes_seen) == 1  # ONE program shape for the whole run
        assert report.mpjpe_mm < 1e-6
