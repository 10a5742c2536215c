"""Converter-to-training integration: original distribution format ->
convert_annotations -> npz index -> dataset adapter -> MixedLoader -> one
fused train step, per source (VERDICT r1 item 7; SURVEY §2 dataset row).

All sources share one batch shape so the train step compiles ONCE for the
whole module.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.cli.convert_annotations import (
    convert_3dhp,
    convert_coco,
    convert_h36m,
    convert_lsp,
    convert_mosh,
    convert_mpii,
)
from human_3d_reconstruction_tpu.data.datasets import MixedLoader, make_dataset
from human_3d_reconstruction_tpu.models.hmr import HMRConfig
from human_3d_reconstruction_tpu.train.trainer import (
    TrainConfig,
    create_states,
    make_train_step,
)

HW = (64, 64)
BATCH = 4
CROP = 32


def _write_images(root, rel_paths, rng):
    import cv2

    for p in rel_paths:
        path = root / p
        path.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(path), rng.integers(0, 255, (*HW, 3)).astype(np.uint8))


@pytest.fixture(scope="module")
def train_setup(smpl_model):
    config = TrainConfig(crop_size=CROP, hmr=HMRConfig())
    gen, disc, model, disc_mod, g_tx, d_tx = create_states(
        config, jax.random.key(0), smpl_model.as_dict()
    )
    step_fn = jax.jit(make_train_step(config, model, disc_mod, g_tx, d_tx))
    smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())
    return step_fn, gen, disc, smpl_params


def _one_train_step(train_setup, dataset, name):
    step_fn, gen, disc, smpl_params = train_setup
    batch = next(iter(MixedLoader([dataset], batch_size=BATCH, seed=0)))
    batch_dict = {
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
    assert batch_dict["images"].shape == (BATCH, *HW, 3), name
    rng = np.random.default_rng(1)
    mt = jnp.asarray(rng.normal(scale=0.2, size=(BATCH, 72)).astype(np.float32))
    mb = jnp.asarray(rng.normal(size=(BATCH, 10)).astype(np.float32))
    new_gen, _, metrics = step_fn(
        gen, disc, smpl_params, batch_dict, mt, mb, jax.random.key(2)
    )
    assert int(new_gen.step) == 1, name
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (name, k, float(v))


class TestConverterToTraining:
    def test_lsp_mat_to_train_step(self, tmp_path, rng, train_setup):
        """LSP ships joints.mat (3, 14, N) with an OCCLUDED flag row."""
        from scipy.io import savemat

        N = 6
        joints = np.zeros((3, 14, N))
        joints[0] = rng.uniform(5, 59, (14, N))  # x
        joints[1] = rng.uniform(5, 59, (14, N))  # y
        joints[2] = rng.integers(0, 2, (14, N))  # occluded flag
        savemat(tmp_path / "joints.mat", {"joints": joints})
        n = convert_lsp(str(tmp_path / "joints.mat"), str(tmp_path / "lsp.npz"))
        assert n == N
        _write_images(tmp_path, [f"images/im{i + 1:04d}.jpg" for i in range(N)], rng)
        _one_train_step(train_setup, make_dataset("lsp", tmp_path / "lsp.npz"), "lsp")

    def test_coco_json_to_train_step(self, tmp_path, rng, train_setup):
        N = 5
        images = [{"id": i, "file_name": f"coco/{i}.jpg"} for i in range(N)]
        anns = []
        for i in range(N):
            kp = np.zeros((17, 3))
            kp[:, 0] = rng.uniform(5, 59, 17)
            kp[:, 1] = rng.uniform(5, 59, 17)
            kp[:, 2] = 2  # labeled + visible
            anns.append(
                {
                    "image_id": i,
                    "num_keypoints": 17,
                    "iscrowd": 0,
                    "keypoints": kp.flatten().tolist(),
                    "bbox": [5.0, 5.0, 50.0, 50.0],
                }
            )
        (tmp_path / "ann.json").write_text(
            json.dumps({"images": images, "annotations": anns})
        )
        n = convert_coco(str(tmp_path / "ann.json"), str(tmp_path / "coco.npz"))
        assert n == N
        _write_images(tmp_path, [im["file_name"] for im in images], rng)
        _one_train_step(train_setup, make_dataset("coco", tmp_path / "coco.npz"), "coco")

    def test_mpii_json_to_train_step(self, tmp_path, rng, train_setup):
        N = 5
        rows = []
        for i in range(N):
            rows.append(
                {
                    "image": f"mpii/{i}.jpg",
                    "joints": rng.uniform(5, 59, (16, 2)).tolist(),
                    "joints_vis": [1] * 16,
                    "center": [32.0, 32.0],
                    "scale": 0.25,  # 200px units -> 50 px
                }
            )
        (tmp_path / "mpii.json").write_text(json.dumps(rows))
        n = convert_mpii(str(tmp_path / "mpii.json"), str(tmp_path / "mpii.npz"))
        assert n == N
        _write_images(tmp_path, [r["image"] for r in rows], rng)
        _one_train_step(train_setup, make_dataset("mpii", tmp_path / "mpii.npz"), "mpii")

    def test_h36m_h5_to_train_step(self, tmp_path, rng, train_setup):
        import h5py

        N = 5
        with h5py.File(tmp_path / "annot.h5", "w") as f:
            f["imgname"] = np.asarray([f"h36m/{i}.jpg".encode() for i in range(N)])
            f["center"] = np.tile([[32.0, 32.0]], (N, 1)).astype(np.float32)
            f["scale"] = np.full((N,), 0.25, np.float32)  # 200px units
            f["part"] = rng.uniform(5, 59, (N, 17, 2)).astype(np.float32)
            f["S"] = rng.normal(scale=0.3, size=(N, 17, 3)).astype(np.float32)
            f["pose"] = rng.normal(scale=0.2, size=(N, 72)).astype(np.float32)
            f["shape"] = rng.normal(size=(N, 10)).astype(np.float32)
            f["action"] = rng.integers(0, 15, (N,)).astype(np.int64)
        n = convert_h36m(str(tmp_path / "annot.h5"), str(tmp_path / "h36m.npz"))
        assert n == N
        _write_images(tmp_path, [f"h36m/{i}.jpg" for i in range(N)], rng)
        ds = make_dataset("h36m", tmp_path / "h36m.npz")
        rec = ds[0]
        assert float(rec.has_3d) == 1.0 and float(rec.has_smpl) == 1.0
        _one_train_step(train_setup, ds, "h36m")

    def test_3dhp_mat_to_train_step(self, tmp_path, rng, train_setup):
        """3DHP ships annot.mat with per-camera cells: annot2 (F, 56) px,
        annot3 (F, 84) camera-frame mm, 28 joints per frame."""
        from scipy.io import savemat

        F, CAMS = 3, 2
        annot2 = np.empty((CAMS, 1), object)
        annot3 = np.empty((CAMS, 1), object)
        for c in range(CAMS):
            annot2[c, 0] = rng.uniform(5, 59, (F, 56))
            annot3[c, 0] = rng.normal(scale=300.0, size=(F, 84))  # mm
        savemat(tmp_path / "annot.mat", {"annot2": annot2, "annot3": annot3})
        n = convert_3dhp(str(tmp_path / "annot.mat"), str(tmp_path / "3dhp.npz"))
        assert n == F * CAMS
        z = np.load(tmp_path / "3dhp.npz")
        assert z["keypoints"].shape == (n, 17, 3)
        assert z["joints3d"].shape == (n, 17, 3)
        # mm -> m conversion happened
        assert np.abs(z["joints3d"]).max() < 3.0
        _write_images(tmp_path, [str(p) for p in z["image_paths"]], rng)
        ds = make_dataset("mpi_inf_3dhp", tmp_path / "3dhp.npz")
        rec = ds[0]
        assert float(rec.has_3d) == 1.0 and float(rec.has_smpl) == 0.0
        _one_train_step(train_setup, ds, "mpi_inf_3dhp")

    def test_3dhp_joint_identity(self, tmp_path):
        """Each written slot must carry the documented source joint (ADVICE
        r3: slots 14-16 are pelvis, spine, head = official 0-based 28-joint
        indices 4, 3, 6). Encode the source joint index in the x coordinate
        and read it back per output slot."""
        from scipy.io import savemat

        from human_3d_reconstruction_tpu.cli.convert_annotations import (
            _3DHP_28_TO_17,
        )

        a2 = np.zeros((1, 56))
        a2[0, 0::2] = np.arange(28)  # x = source joint index
        a2[0, 1::2] = 100.0
        a3 = np.zeros((1, 84))
        a3[0, 0::3] = np.arange(28) * 1000.0  # x(mm) = 1000 * source index
        annot2 = np.empty((1, 1), object)
        annot3 = np.empty((1, 1), object)
        annot2[0, 0], annot3[0, 0] = a2, a3
        savemat(tmp_path / "annot.mat", {"annot2": annot2, "annot3": annot3})
        from human_3d_reconstruction_tpu.cli.convert_annotations import convert_3dhp

        convert_3dhp(str(tmp_path / "annot.mat"), str(tmp_path / "id.npz"))
        z = np.load(tmp_path / "id.npz")
        np.testing.assert_array_equal(z["keypoints"][0, :, 0], _3DHP_28_TO_17)
        np.testing.assert_allclose(z["joints3d"][0, :, 0], _3DHP_28_TO_17)
        # pelvis, spine, head slots pinned to the official indices
        np.testing.assert_array_equal(_3DHP_28_TO_17[-3:], [4, 3, 6])

    def test_mosh_raw_to_train_step(self, tmp_path, rng, train_setup, smpl_model):
        """Raw mosh dumps: a dir of per-sequence pickles (chumpy-era keys,
        per-sequence single beta) + an npz variant -> MoshParamSource ->
        the real-pose feed of one adversarial train step."""
        import pickle

        from human_3d_reconstruction_tpu.data.datasets import MoshParamSource

        d = tmp_path / "mosh" / "subject"
        d.mkdir(parents=True)
        with open(d / "seq1.pkl", "wb") as f:
            pickle.dump(
                {
                    "new_poses": rng.normal(scale=0.3, size=(4, 72)).astype(np.float64),
                    "betas": rng.normal(size=(10,)).astype(np.float64),
                },
                f,
            )
        # SMPL-H-style dump: wider pose rows, per-frame betas.
        np.savez(
            d / "seq2.npz",
            poses=rng.normal(scale=0.3, size=(3, 156)).astype(np.float32),
            betas=rng.normal(size=(3, 16)).astype(np.float32),
        )
        n = convert_mosh(str(tmp_path / "mosh"), str(tmp_path / "mosh.npz"))
        assert n == 7
        src = MoshParamSource.from_npz(tmp_path / "mosh.npz")
        assert src.thetas.shape == (7, 72) and src.betas.shape == (7, 10)
        mt, mb = src.sample(np.random.default_rng(0), BATCH)

        step_fn, gen, disc, smpl_params = train_setup
        from human_3d_reconstruction_tpu.data.datasets import SyntheticImageDataset

        ds = SyntheticImageDataset(smpl_model, n=8, frame_hw=HW, seed=3)
        from human_3d_reconstruction_tpu.data.datasets import MixedLoader

        batch = next(iter(MixedLoader([ds], batch_size=BATCH, seed=0)))
        batch_dict = {
            f: jnp.asarray(getattr(batch, f))
            for f in (
                "images", "centers", "scales", "kp2d", "joints3d",
                "has_3d", "theta", "beta", "has_smpl",
            )
        }
        new_gen, _, metrics = step_fn(
            gen, disc, smpl_params, batch_dict,
            jnp.asarray(mt), jnp.asarray(mb), jax.random.key(4),
        )
        assert int(new_gen.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
