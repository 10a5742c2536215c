"""On-device preprocessing tests: crop/resize/rotate/flip vs cv2 oracle,
keypoint/image alignment, normalization range.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.data import (
    affine_crop,
    normalize_image,
    preprocess_crops,
    transform_keypoints,
)

cv2 = pytest.importorskip("cv2")


def make_image(rng, H=120, W=160):
    # Smooth image so bilinear implementations agree closely.
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack(
        [
            128 + 100 * np.sin(x / 17.0) * np.cos(y / 13.0),
            128 + 80 * np.cos(x / 11.0),
            128 + 60 * np.sin(y / 7.0),
        ],
        axis=-1,
    ).astype(np.float32)
    return img


class TestAffineCrop:
    def test_identity_crop_matches_cv2_resize(self, rng):
        """Pure crop+resize path vs cv2.warpAffine oracle."""
        img = make_image(rng)
        center = np.array([80.0, 60.0], np.float32)
        scale = 96.0
        out_size = 64
        ours = np.asarray(
            affine_crop(jnp.asarray(img), jnp.asarray(center), jnp.asarray(scale), out_size=out_size)
        )
        # cv2 oracle: map crop->source with the same convention.
        s = scale / out_size
        M = np.array(
            [
                [s, 0, center[0] - s * (out_size / 2 - 0.5)],
                [0, s, center[1] - s * (out_size / 2 - 0.5)],
            ],
            np.float32,
        )
        Minv = cv2.invertAffineTransform(M)
        theirs = cv2.warpAffine(img, Minv, (out_size, out_size), flags=cv2.INTER_LINEAR)
        # Interior only (border handling differs).
        np.testing.assert_allclose(ours[2:-2, 2:-2], theirs[2:-2, 2:-2], atol=0.75)

    def test_flip_mirrors(self, rng):
        img = make_image(rng)
        c = jnp.asarray([80.0, 60.0])
        s = jnp.asarray(64.0)
        plain = np.asarray(affine_crop(jnp.asarray(img), c, s, out_size=32))
        flipped = np.asarray(affine_crop(jnp.asarray(img), c, s, flip=1.0, out_size=32))
        np.testing.assert_allclose(flipped, plain[:, ::-1], atol=1e-3)

    def test_rotation_180_is_double_flip(self, rng):
        img = make_image(rng)
        c = jnp.asarray([80.0, 60.0])
        s = jnp.asarray(64.0)
        rot180 = np.asarray(affine_crop(jnp.asarray(img), c, s, rot=np.pi, out_size=32))
        plain = np.asarray(affine_crop(jnp.asarray(img), c, s, out_size=32))
        np.testing.assert_allclose(rot180, plain[::-1, ::-1], atol=0.75)

    def test_out_of_bounds_zero_padded(self, rng):
        img = make_image(rng)
        crop = np.asarray(
            affine_crop(jnp.asarray(img), jnp.asarray([0.0, 0.0]), jnp.asarray(100.0), out_size=32)
        )
        assert np.allclose(crop[:5, :5], 0.0)  # top-left corner is outside
        assert crop[20:, 20:].max() > 1.0      # bottom-right has image content


class TestKeypointAlignment:
    @pytest.mark.parametrize("rot,flip", [(0.0, 0.0), (0.4, 0.0), (0.0, 1.0), (-0.3, 1.0)])
    def test_peak_tracks_keypoint(self, rot, flip):
        """A bright dot at keypoint location lands where transform_keypoints
        says it should, under every augmentation combo."""
        H, W = 120, 160
        kp_src = np.array([[97.0, 55.0]], np.float32)
        img = np.zeros((H, W, 1), np.float32)
        img[int(kp_src[0, 1]), int(kp_src[0, 0]), 0] = 1000.0

        center = jnp.asarray([80.0, 60.0])
        scale = jnp.asarray(90.0)
        out_size = 96
        crop = np.asarray(
            affine_crop(jnp.asarray(img), center, scale, rot=rot, flip=flip, out_size=out_size)
        )[:, :, 0]
        kp_crop = np.asarray(
            transform_keypoints(jnp.asarray(kp_src), center, scale, rot=rot, flip=flip, out_size=out_size)
        )[0]
        # normalized [-1,1] -> pixel coords
        px = (kp_crop + 1.0) / 2.0 * out_size - 0.5
        peak = np.unravel_index(np.argmax(crop), crop.shape)  # (y, x)
        assert abs(peak[1] - px[0]) <= 1.5, (peak, px)
        assert abs(peak[0] - px[1]) <= 1.5, (peak, px)

    def test_flip_map_permutes(self):
        kp = jnp.asarray([[10.0, 0.0], [-10.0, 0.0]]) + 100.0
        flip_map = jnp.asarray([1, 0])
        out = np.asarray(
            transform_keypoints(
                kp, jnp.asarray([100.0, 100.0]), jnp.asarray(50.0), flip=1.0, flip_map=flip_map
            )
        )
        # After mirroring, left/right swap; with the permutation the first
        # entry should be the mirrored second keypoint.
        np.testing.assert_allclose(out[0, 0], 10.0 / 25.0, atol=1e-5)


class TestBatchedPreprocess:
    def test_shapes_and_range(self, rng):
        imgs = np.stack([make_image(rng) for _ in range(3)])
        centers = np.tile(np.array([[80.0, 60.0]], np.float32), (3, 1))
        scales = np.array([90.0, 100.0, 110.0], np.float32)
        crops = np.asarray(
            preprocess_crops(jnp.asarray(imgs), jnp.asarray(centers), jnp.asarray(scales), out_size=64)
        )
        assert crops.shape == (3, 64, 64, 3)
        assert crops.min() >= -1.0 - 1e-5 and crops.max() <= 1.0 + 1e-5

    def test_normalize_image(self):
        x = jnp.asarray([0.0, 127.5, 255.0])
        np.testing.assert_allclose(np.asarray(normalize_image(x)), [-1.0, 0.0, 1.0], atol=1e-6)


class TestSeparableFastPath:
    def test_matches_gather_path(self, rng):
        """separable_crop == affine_crop at rot=0, incl. flip and borders."""
        from human_3d_reconstruction_tpu.data.preprocess import separable_crop

        img = make_image(rng)
        for center, scale, flip in [
            ([80.0, 60.0], 90.0, 0.0),
            ([80.0, 60.0], 90.0, 1.0),
            ([10.0, 5.0], 120.0, 0.0),   # heavy out-of-bounds
            ([150.0, 110.0], 40.0, 1.0),
        ]:
            a = np.asarray(
                affine_crop(jnp.asarray(img), jnp.asarray(center), jnp.asarray(scale),
                            flip=flip, out_size=48)
            )
            b = np.asarray(
                separable_crop(jnp.asarray(img), jnp.asarray(center), jnp.asarray(scale),
                               flip=flip, out_size=48)
            )
            np.testing.assert_allclose(a, b, atol=1e-3, err_msg=str((center, scale, flip)))

    def test_preprocess_crops_uses_fast_path_consistently(self, rng):
        """Batched entry point: rots=None (fast) == rots=zeros (gather)."""
        imgs = np.stack([make_image(rng) for _ in range(2)])
        centers = np.tile(np.array([[80.0, 60.0]], np.float32), (2, 1))
        scales = np.array([90.0, 100.0], np.float32)
        fast = np.asarray(
            preprocess_crops(jnp.asarray(imgs), jnp.asarray(centers), jnp.asarray(scales),
                             out_size=48)
        )
        slow = np.asarray(
            preprocess_crops(jnp.asarray(imgs), jnp.asarray(centers), jnp.asarray(scales),
                             rots=jnp.zeros((2,)), out_size=48)
        )
        np.testing.assert_allclose(fast, slow, atol=2e-5)

    def test_bf16_serving_path_close_to_exact(self, rng):
        """dtype=bfloat16 (serving fast path): bf16 out, error below the
        bf16 encoder's own input rounding (~4e-3 of the [-1, 1] range)."""
        imgs = np.stack([make_image(rng) for _ in range(2)])
        centers = np.tile(np.array([[80.0, 60.0]], np.float32), (2, 1))
        scales = np.array([90.0, 100.0], np.float32)
        exact = np.asarray(
            preprocess_crops(jnp.asarray(imgs), jnp.asarray(centers),
                             jnp.asarray(scales), out_size=48)
        )
        fast = preprocess_crops(
            jnp.asarray(imgs), jnp.asarray(centers), jnp.asarray(scales),
            out_size=48, dtype=jnp.bfloat16,
        )
        assert fast.dtype == jnp.bfloat16
        err = np.abs(np.asarray(fast, np.float32) - exact).max()
        assert err < 2.5e-2, err  # interp sums of bf16-rounded pixels


class TestShearRotateCrop:
    """MXU 3-shear rotation crop (batch-shared angle) vs the gather path."""

    def _affine_images(self, B, H, W):
        gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        img = np.stack([0.3 * gx + 0.1 * gy + 10, 0.5 * gy + 5,
                        0.2 * gx + 0.4 * gy], axis=-1)
        return np.broadcast_to(img, (B, H, W, 3)).copy()

    def test_exact_on_affine_images(self):
        """Any chain of bilinear resamples reproduces affine content
        exactly, so on linear-gradient images the 3-shear path must equal
        affine_crop to float precision — for every flip pattern and both
        rotation signs."""
        from functools import partial

        from human_3d_reconstruction_tpu.data.preprocess import (
            affine_crop,
            rotated_separable_crop,
        )

        B, H, W, S = 3, 128, 128, 64
        imgs = jnp.asarray(self._affine_images(B, H, W))
        centers = jnp.tile(jnp.asarray([[64.0, 64.0]]), (B, 1))
        scales = jnp.full((B,), 60.0)
        for rot in (0.3, -0.25, 0.0):
            rots = jnp.full((B,), rot)
            for flips in ([0, 0, 0], [1, 1, 1], [0, 1, 0]):
                fl = jnp.asarray(flips, jnp.float32)
                ref = jax.vmap(partial(affine_crop, out_size=S))(
                    imgs, centers, scales, rots, fl
                )
                got = rotated_separable_crop(
                    imgs, centers, scales, jnp.asarray(rot), fl, out_size=S
                )
                np.testing.assert_allclose(
                    np.asarray(got)[:, 8:-8, 8:-8],
                    np.asarray(ref)[:, 8:-8, 8:-8],
                    atol=5e-4, err_msg=f"rot={rot} flips={flips}",
                )

    def test_exact_on_affine_images_odd_size(self):
        """ODD out_size: the oversized window must pad by an even amount so
        the center-crop lands exactly on the shear-rotation center — a
        forced-even window puts odd sizes 0.5 px off (failed before
        `_rot_window_size`)."""
        from functools import partial

        from human_3d_reconstruction_tpu.data.preprocess import (
            affine_crop,
            rotated_separable_crop,
        )

        B, H, W, S = 2, 128, 128, 65
        imgs = jnp.asarray(self._affine_images(B, H, W))
        centers = jnp.tile(jnp.asarray([[64.0, 64.0]]), (B, 1))
        scales = jnp.full((B,), 60.0)
        fl = jnp.asarray([0.0, 1.0])
        for rot in (0.3, -0.2):
            ref = jax.vmap(partial(affine_crop, out_size=S))(
                imgs, centers, scales, jnp.full((B,), rot), fl
            )
            got = rotated_separable_crop(
                imgs, centers, scales, jnp.asarray(rot), fl, out_size=S
            )
            np.testing.assert_allclose(
                np.asarray(got)[:, 8:-8, 8:-8],
                np.asarray(ref)[:, 8:-8, 8:-8],
                atol=5e-4, err_msg=f"rot={rot}",
            )

    def test_blob_lands_on_transformed_keypoint(self, rng):
        """Geometric alignment: a Gaussian blob at source point p must
        appear at transform_keypoints(p) in the rotated crop."""
        from human_3d_reconstruction_tpu.data.preprocess import (
            rotated_separable_crop,
            transform_keypoints,
        )

        H = W = 160
        S = 96
        p = np.asarray([96.0, 70.0])
        gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        blob = np.exp(-((gx - p[0]) ** 2 + (gy - p[1]) ** 2) / (2 * 3.0**2))
        img = np.repeat(blob[None, :, :, None], 3, axis=-1).astype(np.float32)

        center = jnp.asarray([80.0, 80.0])
        scale = jnp.asarray(120.0)
        rot = 0.35
        for flip in (0.0, 1.0):
            crop = rotated_separable_crop(
                jnp.asarray(img), center[None], scale[None],
                jnp.asarray(rot), jnp.asarray([flip]), out_size=S,
            )[0]
            resp = np.asarray(crop[..., 0])
            cy, cx = np.unravel_index(np.argmax(resp), resp.shape)
            kp = transform_keypoints(
                jnp.asarray(p)[None], center, scale,
                rot=jnp.asarray(rot), flip=jnp.asarray(flip),
            )[0]
            # [-1, 1] crop coords -> pixel coords
            ex = (float(kp[0]) + 1.0) * 0.5 * S - 0.5
            ey = (float(kp[1]) + 1.0) * 0.5 * S - 0.5
            assert np.hypot(cx - ex, cy - ey) < 1.5, (cx, cy, ex, ey, flip)

    def test_close_to_gather_path_on_smooth_images(self, rng):
        """On smooth (non-affine) content the 3-shear chain blurs slightly
        more than single-pass bilinear; bound the difference."""
        from functools import partial

        from human_3d_reconstruction_tpu.data.preprocess import (
            affine_crop,
            rotated_separable_crop,
        )
        from scipy.ndimage import gaussian_filter

        B, H, W, S = 2, 128, 128, 64
        raw = rng.uniform(0, 255, (B, H, W, 3))
        imgs = jnp.asarray(
            gaussian_filter(raw, sigma=(0, 3, 3, 0)).astype(np.float32)
        )
        centers = jnp.tile(jnp.asarray([[64.0, 64.0]]), (B, 1))
        scales = jnp.full((B,), 70.0)
        rot = 0.3
        ref = jax.vmap(partial(affine_crop, out_size=S))(
            imgs, centers, scales, jnp.full((B,), rot), jnp.zeros((B,))
        )
        got = rotated_separable_crop(
            imgs, centers, scales, jnp.asarray(rot), jnp.zeros((B,)), out_size=S
        )
        diff = np.abs(np.asarray(got)[:, 6:-6, 6:-6] - np.asarray(ref)[:, 6:-6, 6:-6])
        assert diff.max() < 6.0, diff.max()  # of 255 range, smooth content

    def test_trainer_batch_mode_uses_shared_angle(self, rng):
        """aug_rot_mode='batch' (default) must transform kp/j3d/theta with
        the SAME angle for every sample, consistent with the image path —
        the pose-aug invariance test covers geometry; here pin sharing."""
        from human_3d_reconstruction_tpu.train import trainer as T

        B = 4
        batch = {
            "images": jnp.asarray(rng.uniform(0, 255, (B, 48, 48, 3)).astype(np.float32)),
            "centers": jnp.tile(jnp.asarray([[24.0, 24.0]]), (B, 1)),
            "scales": jnp.full((B,), 40.0),
            "kp2d": jnp.asarray(
                np.concatenate([rng.uniform(4, 44, (B, 14, 2)), np.ones((B, 14, 1))], 2)
                .astype(np.float32)),
            "joints3d": jnp.asarray(rng.normal(scale=0.3, size=(B, 14, 3)).astype(np.float32)),
            "has_3d": jnp.ones((B,)),
            "theta": jnp.asarray(rng.normal(scale=0.3, size=(B, 72)).astype(np.float32)),
            "beta": jnp.zeros((B, 10)),
            "has_smpl": jnp.ones((B,)),
        }
        config = T.TrainConfig(crop_size=32, aug_rot_max=0.4)
        crops, kp2d, vis, j3d, theta = T._device_preprocess(
            config, batch, jax.random.key(3)
        )
        # Recover each sample's implied rotation from the j3d transform:
        # the xy rotation angle between input and output joints.
        j_in = np.asarray(batch["joints3d"])
        j_out = np.asarray(j3d)
        angles = []
        for b in range(B):
            a, o = j_in[b, :, :2], j_out[b, :, :2]
            num = np.sum(a[:, 0] * o[:, 1] - a[:, 1] * o[:, 0])
            den = np.sum(a[:, 0] * o[:, 0] + a[:, 1] * o[:, 1])
            angles.append(np.arctan2(num, den))
        assert np.ptp(angles) < 1e-5, angles  # one shared angle
        assert abs(angles[0]) > 1e-3  # and it actually rotated


class TestBucketRotatedCrop:
    """Per-sample angles via K shared-angle rotations + select."""

    def test_matches_per_sample_affine_on_affine_images(self):
        from functools import partial

        from human_3d_reconstruction_tpu.data.preprocess import (
            affine_crop,
            bucket_rotated_separable_crop,
        )

        B, H, W, S, K = 4, 128, 128, 64, 5
        gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        img = np.stack([0.3 * gx + 0.1 * gy + 10, 0.5 * gy + 5,
                        0.2 * gx + 0.4 * gy], axis=-1)
        imgs = jnp.asarray(np.broadcast_to(img, (B, H, W, 3)).copy())
        centers = jnp.tile(jnp.asarray([[64.0, 64.0]]), (B, 1))
        scales = jnp.full((B,), 60.0)
        bucket_angles = jnp.linspace(-0.3, 0.3, K)
        assign = jnp.asarray([0, 2, 4, 1], jnp.int32)
        flips = jnp.asarray([0.0, 1.0, 0.0, 1.0])

        got = bucket_rotated_separable_crop(
            imgs, centers, scales, bucket_angles, assign, flips, out_size=S
        )
        ref = jax.vmap(partial(affine_crop, out_size=S))(
            imgs, centers, scales, bucket_angles[assign], flips
        )
        np.testing.assert_allclose(
            np.asarray(got)[:, 8:-8, 8:-8], np.asarray(ref)[:, 8:-8, 8:-8],
            atol=5e-4,
        )

    def test_trainer_bucket_mode_invariance_and_diversity(self, rng):
        """bucket mode: per-sample DIFFERENT angles, with the GT theta/j3d
        transformed by the same quantized angles (exact invariance)."""
        from human_3d_reconstruction_tpu.smpl.forward import smpl_forward
        from human_3d_reconstruction_tpu.train import trainer as T
        from tests.test_pose_aug import _mirror_symmetric_smpl_params

        B = 8
        params = {k: jnp.asarray(v) for k, v in _mirror_symmetric_smpl_params().items()}
        theta = rng.normal(scale=0.5, size=(B, 72)).astype(np.float32)
        beta = np.zeros((B, 10), np.float32)
        decoded = smpl_forward(params, jnp.asarray(theta), jnp.asarray(beta))
        j3d = np.asarray(decoded.eval_joints)
        j3d = (j3d - j3d.mean(axis=1, keepdims=True)).astype(np.float32)
        batch = {
            "images": jnp.asarray(rng.uniform(0, 255, (B, 48, 48, 3)).astype(np.float32)),
            "centers": jnp.tile(jnp.asarray([[24.0, 24.0]]), (B, 1)),
            "scales": jnp.full((B,), 40.0),
            "kp2d": jnp.asarray(
                np.concatenate([rng.uniform(4, 44, (B, 14, 2)), np.ones((B, 14, 1))], 2)
                .astype(np.float32)),
            "joints3d": jnp.asarray(j3d),
            "has_3d": jnp.ones((B,)),
            "theta": jnp.asarray(theta),
            "beta": jnp.asarray(beta),
            "has_smpl": jnp.ones((B,)),
        }
        config = T.TrainConfig(
            crop_size=32, aug_rot_max=0.4, aug_flip=True,
            aug_rot_mode="bucket", aug_rot_buckets=8,
        )
        crops, kp2d, vis, j3d_aug, theta_aug = T._device_preprocess(
            config, batch, jax.random.key(11)
        )
        redecoded = smpl_forward(params, theta_aug, jnp.asarray(beta))
        pred = np.asarray(redecoded.eval_joints)
        pred = pred - pred.mean(axis=1, keepdims=True)
        target = np.asarray(j3d_aug)
        target = target - target.mean(axis=1, keepdims=True)
        np.testing.assert_allclose(pred, target, atol=1e-4)
        # angle diversity: recover implied per-sample rotations
        angs = []
        for b in range(B):
            a, o = j3d[b, :, :2], target[b, :, :2]
            num = np.sum(a[:, 0] * o[:, 1] - a[:, 1] * o[:, 0])
            den = np.sum(a[:, 0] * o[:, 0] + a[:, 1] * o[:, 1])
            angs.append(np.arctan2(num, den))
        assert np.ptp(angs) > 0.05, angs
