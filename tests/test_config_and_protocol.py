"""Config system, eval protocol, and annotation converter tests."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from human_3d_reconstruction_tpu.config import PRESETS, load_config
from human_3d_reconstruction_tpu.eval.protocol import (
    run_protocol,
    synthetic_eval_batches,
)


class TestConfig:
    def test_presets_cover_baseline_configs(self):
        assert set(PRESETS) == {
            "smpl_only", "single_image", "batched_crops", "h36m_eval", "multi_person"
        }

    def test_override_nested(self):
        cfg = load_config(["single_image", "--train.g_lr=3e-05", "--data.batch_size=32"])
        assert cfg.train.g_lr == 3e-5
        assert cfg.data.batch_size == 32

    def test_override_bool_and_float(self):
        cfg = load_config(["single_image", "--train.aug_flip=true", "--train.aug_rot_max=0.3"])
        assert cfg.train.aug_flip is True
        assert np.isclose(cfg.train.aug_rot_max, 0.3)

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            load_config(["single_image", "--nope.x=1"])

    def test_unknown_preset_raises(self):
        with pytest.raises(KeyError):
            load_config(["not_a_preset"])

    def test_sources_tuple_override(self):
        cfg = load_config(
            ["single_image", '--data.sources=[["lsp", "a.npz", 1.0]]']
        )
        assert cfg.data.sources == (["lsp", "a.npz", 1.0],)


class TestProtocol:
    def test_perfect_predictor_scores_zero(self, smpl_model):
        batches = list(synthetic_eval_batches(smpl_model, num_batches=2, batch_size=4))
        gts = {i: b.gt_joints3d for i, b in enumerate(batches)}
        calls = {"i": 0}

        def oracle_predict(images, centers, scales):
            out = gts[calls["i"]]
            calls["i"] += 1
            return jnp.asarray(out)

        report = run_protocol(oracle_predict, iter(batches))
        assert report.num_frames == 8
        assert report.mpjpe_mm < 1e-3
        assert report.pa_mpjpe_mm < 1e-3

    def test_biased_predictor_measured(self, smpl_model):
        batches = list(synthetic_eval_batches(smpl_model, num_batches=1, batch_size=4))

        def biased(images, centers, scales):
            # 10 mm x-offset on joint 0 (r_ankle). Protocol rooting is at the
            # pelvis proxy (hip midpoint), so the error stays ON that joint:
            # MPJPE is exactly 10/14 mm. (PA-MPJPE may exceed it — Procrustes
            # centroid alignment spreads a single-joint bias over all 14.)
            out = batches[0].gt_joints3d.copy()
            out[:, 0, 0] += 0.010
            return jnp.asarray(out)

        report = run_protocol(biased, iter(batches))
        np.testing.assert_allclose(report.mpjpe_mm, 10.0 / 14.0, rtol=1e-4)
        assert 0.1 < report.pa_mpjpe_mm < 20.0
        # Bridging metric: under the LEGACY ankle rooting the same bias
        # lands on the ROOT joint, so all 13 non-root joints shift by
        # 10 mm and the rooted joint-0 error is 0: MPJPE = 130/14 mm.
        np.testing.assert_allclose(
            report.mpjpe_ankle_rooted_mm, 130.0 / 14.0, rtol=1e-4
        )

    def test_report_table_and_json(self, smpl_model, tmp_path):
        batches = list(synthetic_eval_batches(smpl_model, num_batches=1, batch_size=4))
        report = run_protocol(
            lambda i, c, s: jnp.asarray(batches[0].gt_joints3d),
            iter(batches),
            report_path=tmp_path / "r.json",
        )
        table = report.table()
        assert "ALL" in table and "MPJPE" in table
        assert "bridge" in table
        blob = json.loads((tmp_path / "r.json").read_text())
        assert "per_action" in blob
        assert "mpjpe_ankle_rooted_mm" in blob


class TestConverters:
    def test_coco_converter(self, tmp_path):
        from human_3d_reconstruction_tpu.cli.convert_annotations import convert_coco

        kp = np.zeros((17, 3))
        kp[:8, :2] = np.random.default_rng(0).uniform(10, 90, (8, 2))
        kp[:8, 2] = 2
        blob = {
            "images": [{"id": 7, "file_name": "x.jpg"}],
            "annotations": [
                {
                    "image_id": 7,
                    "num_keypoints": 8,
                    "iscrowd": 0,
                    "keypoints": kp.flatten().tolist(),
                    "bbox": [10, 10, 60, 90],
                },
                {  # filtered: too few keypoints
                    "image_id": 7,
                    "num_keypoints": 2,
                    "iscrowd": 0,
                    "keypoints": kp.flatten().tolist(),
                    "bbox": [0, 0, 5, 5],
                },
            ],
        }
        src = tmp_path / "coco.json"
        src.write_text(json.dumps(blob))
        n = convert_coco(str(src), str(tmp_path / "out.npz"))
        assert n == 1
        z = np.load(tmp_path / "out.npz", allow_pickle=True)
        assert z["keypoints"].shape == (1, 17, 3)
        assert float(z["scales"][0]) == pytest.approx(90 * 1.2)
        # vis flag: only "labeled+visible" (=2) kept
        assert z["keypoints"][0, :8, 2].sum() == 8

    def test_lsp_converter(self, tmp_path):
        from scipy.io import savemat

        from human_3d_reconstruction_tpu.cli.convert_annotations import convert_lsp

        rng = np.random.default_rng(0)
        joints = np.zeros((3, 14, 2))
        joints[:2] = rng.uniform(0, 100, (2, 14, 2))
        joints[2] = 0.0  # LSP: 0 = visible
        savemat(tmp_path / "joints.mat", {"joints": joints})
        n = convert_lsp(str(tmp_path / "joints.mat"), str(tmp_path / "lsp.npz"))
        assert n == 2
        z = np.load(tmp_path / "lsp.npz", allow_pickle=True)
        assert z["keypoints"].shape == (2, 14, 3)
        assert np.all(z["keypoints"][:, :, 2] == 1.0)  # occluded flag inverted

    def test_mpii_converter(self, tmp_path):
        from human_3d_reconstruction_tpu.cli.convert_annotations import convert_mpii

        rows = [
            {
                "image": "a.jpg",
                "joints": np.random.default_rng(0).uniform(0, 100, (16, 2)).tolist(),
                "joints_vis": [1] * 16,
                "center": [50, 50],
                "scale": 1.5,
            }
        ]
        src = tmp_path / "mpii.json"
        src.write_text(json.dumps(rows))
        n = convert_mpii(str(src), str(tmp_path / "mpii.npz"))
        assert n == 1
        z = np.load(tmp_path / "mpii.npz", allow_pickle=True)
        assert float(z["scales"][0]) == pytest.approx(300.0)  # 1.5 * 200

    def test_h36m_converter(self, tmp_path):
        import h5py

        from human_3d_reconstruction_tpu.cli.convert_annotations import convert_h36m

        with h5py.File(tmp_path / "annot.h5", "w") as f:
            f["imgname"] = np.asarray([b"s1.jpg", b"s2.jpg"])
            f["center"] = np.asarray([[50.0, 50], [60, 60]])
            f["scale"] = np.asarray([1.0, 1.1])
            f["part"] = np.zeros((2, 17, 2))
            f["S"] = np.zeros((2, 17, 3))
            f["action"] = np.asarray([0, 3])
        n = convert_h36m(str(tmp_path / "annot.h5"), str(tmp_path / "h36m.npz"))
        assert n == 2
        z = np.load(tmp_path / "h36m.npz", allow_pickle=True)
        assert "joints3d" in z and "actions" in z
        assert float(z["scales"][0]) == pytest.approx(200.0)

    def test_box_from_keypoints(self):
        from human_3d_reconstruction_tpu.cli.convert_annotations import (
            box_from_keypoints,
        )

        kp = np.array([[0, 0, 1], [100, 40, 1], [50, 20, 0]], np.float32)
        center, scale = box_from_keypoints(kp)
        np.testing.assert_allclose(center, [50, 20])
        assert scale == pytest.approx(120.0)  # 100 * 1.2


class TestFlipAveragedEval:
    def test_unflip_is_involution_and_exact_on_mirrored_pairs(self):
        import jax.numpy as jnp

        from human_3d_reconstruction_tpu.eval.protocol import unflip_joints3d

        rng = np.random.default_rng(5)
        j = jnp.asarray(rng.normal(0, 0.3, (4, 14, 3)).astype(np.float32))
        # Involution: applying the un-flip twice is the identity.
        np.testing.assert_allclose(
            np.asarray(unflip_joints3d(unflip_joints3d(j))), np.asarray(j),
            atol=0,
        )
        # A prediction that IS the mirror of j (what a perfectly
        # equivariant network would output on the flipped crop) un-flips
        # back to j exactly, so flip-averaging adds zero bias.
        mirrored = unflip_joints3d(j)
        avg = 0.5 * (j + unflip_joints3d(mirrored))
        np.testing.assert_allclose(np.asarray(avg), np.asarray(j), atol=0)

    def test_left_right_labels_swap(self):
        import jax.numpy as jnp

        from human_3d_reconstruction_tpu.data.skeleton import LSP_FLIP_MAP
        from human_3d_reconstruction_tpu.eval.protocol import unflip_joints3d

        # Joint k carries value k in y: after unflip, slot k must hold the
        # value of its mirror partner (label swap), with x negated.
        j = jnp.stack(
            [
                jnp.arange(14, dtype=jnp.float32),
                jnp.arange(14, dtype=jnp.float32) * 10,
                jnp.arange(14, dtype=jnp.float32) * 100,
            ],
            axis=-1,
        )[None]
        out = np.asarray(unflip_joints3d(j))[0]
        for k in range(14):
            partner = int(LSP_FLIP_MAP[k])
            assert out[k, 1] == partner * 10.0
            assert out[k, 0] == -float(partner)
