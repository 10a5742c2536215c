"""On-device preprocessing tests: crop/resize/rotate/flip vs cv2 oracle,
keypoint/image alignment, normalization range.
"""

import numpy as np
import pytest

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
