"""Dataset adapter tests: remap tables, synthetic source, collation, mixing."""

import numpy as np

from human_3d_reconstruction_tpu.data.datasets import (
    Batch,
    DATASET_REGISTRY,
    MixedLoader,
    MoshParamSource,
    SyntheticImageDataset,
    collate,
)
from human_3d_reconstruction_tpu.data.skeleton import (
    COCO_TO_LSP14,
    LSP_FLIP_MAP,
    NUM_KP,
    remap_keypoints,
)


class TestRemap:
    def test_coco_missing_joints_get_zero_vis(self, rng):
        kp_coco = rng.normal(size=(17, 3)).astype(np.float32)
        kp_coco[:, 2] = 1.0
        out = remap_keypoints(kp_coco, COCO_TO_LSP14)
        assert out.shape == (14, 3)
        assert out[12, 2] == 0.0 and out[13, 2] == 0.0  # neck, head_top absent
        np.testing.assert_allclose(out[0], kp_coco[16])  # r_ankle

    def test_flip_map_is_involution(self):
        assert np.array_equal(LSP_FLIP_MAP[LSP_FLIP_MAP], np.arange(14))

    def test_registry_names(self):
        assert set(DATASET_REGISTRY) == {
            "lsp", "lsp_ext", "mpii", "coco", "h36m", "mpi_inf_3dhp"
        }


class TestSynthetic:
    def test_record_schema(self, smpl_model):
        ds = SyntheticImageDataset(smpl_model, n=4, seed=0)
        r = ds[0]
        assert r.image.shape == (256, 256, 3)
        assert r.kp2d.shape == (NUM_KP, 3)
        assert r.joints3d.shape == (NUM_KP, 3)
        assert float(r.has_3d) == 1.0 and float(r.has_smpl) == 1.0
        # 3D joints are root-relative (centered).
        np.testing.assert_allclose(r.joints3d.mean(axis=0), 0.0, atol=1e-5)

    def test_deterministic(self, smpl_model):
        a = SyntheticImageDataset(smpl_model, n=2, seed=3)[1]
        b = SyntheticImageDataset(smpl_model, n=2, seed=3)[1]
        np.testing.assert_array_equal(a.image, b.image)
        np.testing.assert_array_equal(a.theta, b.theta)

    def test_explicit_theta_beta_streams(self, smpl_model):
        """The bench_smoothing clip path: caller-supplied (theta, beta)
        streams drive joints/kp2d/rendering exactly like sampled ones."""
        rng = np.random.default_rng(0)
        thetas = rng.normal(scale=0.3, size=(3, 72)).astype(np.float32)
        betas = rng.normal(scale=0.8, size=(3, 10)).astype(np.float32)
        ds = SyntheticImageDataset(
            smpl_model, frame_hw=(64, 64), seed=0,
            render_mode="skeleton", thetas=thetas, betas=betas,
        )
        assert len(ds) == 3
        r = ds[1]
        np.testing.assert_array_equal(r.theta, thetas[1])
        np.testing.assert_array_equal(r.beta, betas[1])
        # Same (theta, beta) index through the sampled-constructor path must
        # give identical joints: overriding the streams changes nothing else.
        ds2 = SyntheticImageDataset(
            smpl_model, frame_hw=(64, 64), seed=0,
            render_mode="skeleton", thetas=thetas[1:2], betas=betas[1:2],
        )
        np.testing.assert_allclose(ds2[0].joints3d, r.joints3d, atol=1e-6)
        import pytest

        with pytest.raises(ValueError):
            SyntheticImageDataset(smpl_model, thetas=thetas[:, :5])
        with pytest.raises(ValueError):
            SyntheticImageDataset(smpl_model, thetas=thetas, betas=betas[:2])


class TestCollateAndLoader:
    def test_collate_pads_to_max(self, smpl_model):
        ds = SyntheticImageDataset(smpl_model, n=2, seed=0)
        r0, r1 = ds[0], ds[1]
        r1.image = r1.image[:200, :180]  # ragged
        batch = collate([r0, r1])
        assert batch.images.shape == (2, 256, 256, 3)
        assert np.allclose(batch.images[1, 200:], 0.0)

    def test_mixed_loader_yields_batches(self, smpl_model):
        ds1 = SyntheticImageDataset(smpl_model, n=4, seed=0)
        ds2 = SyntheticImageDataset(smpl_model, n=4, seed=9)
        loader = MixedLoader([ds1, ds2], batch_size=3, weights=[0.5, 0.5], seed=0)
        batch = next(iter(loader))
        assert isinstance(batch, Batch)
        assert batch.images.shape[0] == 3
        assert batch.theta.shape == (3, 72)

    def test_parallel_loader_matches_serial(self, smpl_model):
        """num_workers must not change the stream: batch k depends only on
        (seed, k), never on thread scheduling."""
        import itertools

        ds1 = SyntheticImageDataset(smpl_model, n=6, seed=0)
        ds2 = SyntheticImageDataset(smpl_model, n=6, seed=9)

        def take(num_workers, n=5):
            loader = MixedLoader(
                [ds1, ds2], batch_size=4, weights=[0.7, 0.3], seed=7,
                num_workers=num_workers,
            )
            return list(itertools.islice(iter(loader), n))

        serial, threaded = take(0), take(4)
        for a, b in zip(serial, threaded):
            np.testing.assert_array_equal(a.images, b.images)
            np.testing.assert_array_equal(a.theta, b.theta)
            np.testing.assert_array_equal(a.kp2d, b.kp2d)


class TestMosh:
    def test_synthetic_pool(self):
        src = MoshParamSource.synthetic(np.random.default_rng(0), n=128)
        t, b = src.sample(np.random.default_rng(1), 16)
        assert t.shape == (16, 72) and b.shape == (16, 10)
        # near-upright root: much smaller than body pose noise
        assert np.abs(t[:, :3]).std() < np.abs(t[:, 3:]).std() * 2

    def test_synthetic_pool_is_correlated_manifold(self):
        """Pool samples must be correlated (anchor mixing), not iid noise —
        real mosh poses lie on a manifold; the discriminator's "real" class
        should too."""
        src = MoshParamSource.synthetic(np.random.default_rng(0), n=2048)
        t = src.thetas - src.thetas.mean(axis=0)
        # Effective rank of the pose pool: iid Gaussian 72-d data has ~72
        # comparable singular values; anchor-mixed data concentrates.
        s = np.linalg.svd(t, compute_uv=False)
        energy = np.cumsum(s**2) / np.sum(s**2)
        dims_for_90pct = int(np.searchsorted(energy, 0.9)) + 1
        assert dims_for_90pct < 60, dims_for_90pct
        # hinge joints (knees 4,5 / elbows 18,19) move more than root
        amp = np.abs(src.thetas).reshape(-1, 24, 3).mean(axis=(0, 2))
        assert amp[4] > 2 * amp[0] and amp[18] > 2 * amp[0]

    def test_npz_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        thetas = rng.normal(size=(8, 72)).astype(np.float32)
        betas = rng.normal(size=(8, 10)).astype(np.float32)
        np.savez(tmp_path / "mosh.npz", thetas=thetas, betas=betas)
        src = MoshParamSource.from_npz(tmp_path / "mosh.npz")
        np.testing.assert_array_equal(src.thetas, thetas)


class TestAnnotationDataset:
    def test_npz_index_loading(self, tmp_path, rng):
        """End-to-end adapter: write an npz index + images, read records."""
        import cv2

        img_dir = tmp_path
        paths = []
        for i in range(2):
            p = f"im{i}.png"
            cv2.imwrite(str(img_dir / p), rng.integers(0, 255, (60, 80, 3)).astype(np.uint8))
            paths.append(p)
        np.savez(
            tmp_path / "index.npz",
            image_paths=np.asarray(paths),
            centers=np.tile([[40.0, 30.0]], (2, 1)).astype(np.float32),
            scales=np.asarray([50.0, 55.0], np.float32),
            keypoints=rng.normal(size=(2, 14, 3)).astype(np.float32),
        )
        ds = DATASET_REGISTRY["lsp"](tmp_path / "index.npz")
        assert len(ds) == 2
        rec = ds[1]
        assert rec.image.shape == (60, 80, 3)
        assert rec.kp2d.shape == (14, 3)
        assert float(rec.has_3d) == 0.0 and float(rec.has_smpl) == 0.0

    def test_thetas_without_betas_do_not_mark_smpl_gt(self, tmp_path, rng):
        """An index carrying thetas but no betas must not set has_smpl —
        the param loss would otherwise supervise beta toward an
        unannotated zero vector."""
        import cv2

        cv2.imwrite(
            str(tmp_path / "im0.png"),
            rng.integers(0, 255, (40, 40, 3)).astype(np.uint8),
        )
        np.savez(
            tmp_path / "index.npz",
            image_paths=np.asarray(["im0.png"]),
            centers=np.asarray([[20.0, 20.0]], np.float32),
            scales=np.asarray([30.0], np.float32),
            keypoints=rng.normal(size=(1, 17, 3)).astype(np.float32),
            joints3d=rng.normal(size=(1, 17, 3)).astype(np.float32),
            thetas=rng.normal(size=(1, 72)).astype(np.float32),
            # no betas
        )
        rec = DATASET_REGISTRY["h36m"](tmp_path / "index.npz")[0]
        assert float(rec.has_smpl) == 0.0
        assert float(rec.has_3d) == 1.0
        np.testing.assert_array_equal(rec.beta, np.zeros(10, np.float32))


class TestRenderedSyntheticProtocol:
    """render_skeleton=True makes image -> pose learnable (VERDICT r2 #2)."""

    def test_blobs_land_on_projected_joints(self, smpl_model):
        from human_3d_reconstruction_tpu.data.datasets import (
            SyntheticImageDataset,
            _joint_palette,
        )

        ds = SyntheticImageDataset(
            smpl_model, n=4, frame_hw=(128, 128), seed=5, render_skeleton=True
        )
        pal = _joint_palette()
        rec = ds[2]
        img = rec.image - rec.image.mean(axis=(0, 1))
        # Matched-filter check: each in-frame joint's color signature must
        # respond strongly AT the projected keypoint relative to background
        # (14 signatures can't be orthogonal in RGB — joint identity also
        # lives in spatial/kinematic context, like real imagery — so we
        # assert local detectability, not global argmax uniqueness).
        for k in range(14):
            gx, gy = ds.kp2d_px[2, k]
            if not (4 <= gx < 124 and 4 <= gy < 124):
                continue
            resp = img @ pal[k]
            at_joint = resp[int(gy), int(gx)]
            assert at_joint > resp.mean() + 2.0 * resp.std(), (
                k, at_joint, resp.mean(), resp.std(),
            )

    def test_deterministic_and_distinct_across_seeds(self, smpl_model):
        from human_3d_reconstruction_tpu.data.datasets import SyntheticImageDataset

        a = SyntheticImageDataset(smpl_model, n=2, frame_hw=(64, 64), seed=1, render_skeleton=True)
        b = SyntheticImageDataset(smpl_model, n=2, frame_hw=(64, 64), seed=1, render_skeleton=True)
        np.testing.assert_array_equal(a[0].image, b[0].image)
        # A different seed draws different poses -> different frames and
        # a disjoint pose set (the train/val split property).
        c = SyntheticImageDataset(smpl_model, n=2, frame_hw=(64, 64), seed=2, render_skeleton=True)
        assert np.abs(a[0].theta - c[0].theta).max() > 1e-3
        assert np.abs(a[0].image - c[0].image).max() > 1.0
