"""Rasterizer tests: C++ vs numpy twin equivalence, occlusion, projection."""

import numpy as np

from human_3d_reconstruction_tpu.viz import (
    overlay_mesh,
    overlay_meshes,
    project_verts_to_pixels,
    rasterizer_backend,
)


def square_mesh(cx, cy, half, z):
    """Two triangles forming an axis-aligned square at depth z."""
    verts = np.array(
        [
            [cx - half, cy - half, z],
            [cx + half, cy - half, z],
            [cx + half, cy + half, z],
            [cx - half, cy + half, z],
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


class TestRasterizer:
    def test_cpp_backend_builds(self):
        assert rasterizer_backend() == "cpp"

    def test_covers_expected_pixels(self):
        img = np.zeros((64, 64, 3), np.float32)
        verts, faces = square_mesh(32, 32, 10, 1.0)
        out = overlay_mesh(img, verts, faces, color=(255, 0, 0), alpha=1.0)
        assert out[32, 32, 0] > 0  # center covered
        assert out[32, 32, 1] == 0  # red only
        assert np.all(out[5, 5] == 0)  # corner untouched
        # coverage area ~ (2*10)^2
        covered = (out[:, :, 0] > 0).sum()
        assert 300 < covered < 500, covered

    def test_zbuffer_occlusion(self):
        img = np.zeros((64, 64, 3), np.float32)
        near_v, near_f = square_mesh(32, 32, 8, 0.5)
        far_v, far_f = square_mesh(32, 32, 8, 2.0)
        verts = np.concatenate([near_v, far_v])
        faces = np.concatenate([near_f, far_f + 4]).astype(np.int32)
        # near mesh listed SECOND must still win (z-buffer, not paint order)
        verts_swapped = np.concatenate([far_v, near_v])
        faces_swapped = np.concatenate([far_f, near_f + 4]).astype(np.int32)
        a = overlay_mesh(img, verts, faces, color=(200, 0, 0), alpha=1.0)
        b = overlay_mesh(img, verts_swapped, faces_swapped, color=(200, 0, 0), alpha=1.0)
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_cpp_matches_numpy_twin(self, rng):
        img = rng.uniform(0, 255, (48, 48, 3)).astype(np.float32)
        verts = rng.uniform(5, 43, (30, 3)).astype(np.float32)
        faces = rng.integers(0, 30, (40, 3)).astype(np.int32)
        cpp = overlay_mesh(img, verts, faces, alpha=0.7)
        ref = overlay_mesh(img, verts, faces, alpha=0.7, force_numpy=True)
        np.testing.assert_allclose(cpp, ref, atol=1e-3)

    def test_alpha_blend(self):
        img = np.full((32, 32, 3), 100.0, np.float32)
        verts, faces = square_mesh(16, 16, 6, 1.0)
        out = overlay_mesh(img, verts, faces, color=(255, 255, 255), alpha=0.5)
        center = out[16, 16]
        # blend of 100 and 255*lambert(=1.0 for flat square) at 0.5
        np.testing.assert_allclose(center, (100 + 255) / 2, atol=1.0)

    def test_out_of_frame_verts_safe(self, rng):
        img = np.zeros((32, 32, 3), np.float32)
        verts = rng.uniform(-100, 200, (20, 3)).astype(np.float32)
        faces = rng.integers(0, 20, (30, 3)).astype(np.int32)
        out = overlay_mesh(img, verts, faces)  # must not crash
        assert out.shape == img.shape

    def test_degenerate_faces_ignored(self):
        img = np.zeros((32, 32, 3), np.float32)
        verts = np.array([[10, 10, 1], [20, 20, 1], [30, 5, 1]], np.float32)
        faces = np.array([[0, 0, 0], [1, 1, 2]], np.int32)  # degenerate
        out = overlay_mesh(img, verts, faces, alpha=1.0)
        assert np.all(out == 0)


class TestProjection:
    def test_matches_keypoint_convention(self):
        """project_verts_to_pixels == orthographic_project -> crop -> frame px."""
        import jax.numpy as jnp

        from human_3d_reconstruction_tpu.utils.geometry import orthographic_project

        rng = np.random.default_rng(0)
        verts = rng.normal(size=(10, 3)).astype(np.float32)
        cam = np.array([0.9, 0.1, -0.2], np.float32)
        center = np.array([120.0, 90.0], np.float32)
        scale = 140.0

        px = project_verts_to_pixels(verts, cam, center, scale)
        crop_xy = np.asarray(
            orthographic_project(jnp.asarray(verts[None]), jnp.asarray(cam[None]))
        )[0]
        expected = center + crop_xy * (scale / 2.0)
        np.testing.assert_allclose(px[:, :2], expected, atol=1e-5)

    def test_multi_person_overlay(self, rng):
        img = np.zeros((96, 96, 3), np.float32)
        v1, faces = square_mesh(0.0, 0.0, 0.5, 1.0)  # model space
        out = overlay_meshes(
            img,
            [v1, v1],
            faces,
            cams=[np.array([1.0, 0, 0]), np.array([1.0, 0, 0])],
            centers=[np.array([25.0, 25.0]), np.array([70.0, 70.0])],
            scales=[30.0, 30.0],
        )
        assert out[25, 25].sum() > 0
        assert out[70, 70].sum() > 0
        assert out[25, 70].sum() == 0


class TestDraw:
    def test_keypoints_drawn(self, rng):
        from human_3d_reconstruction_tpu.viz.draw import draw_keypoints

        img = np.zeros((64, 64, 3), np.float32)
        kp = np.asarray([[20.0, 20.0], [40.0, 40.0]] + [[0.0, 0.0]] * 12)
        vis = np.asarray([1.0, 1.0] + [0.0] * 12)
        out = draw_keypoints(img, kp, vis=vis, skeleton=((0, 1),))
        assert out[20, 20].sum() > 0          # dot
        assert out[30, 30].sum() > 0          # bone midpoint
        assert out[5, 50].sum() == 0          # elsewhere untouched
        assert img.sum() == 0                 # input not mutated

    def test_crop_to_pixels_inverse(self, rng):
        from human_3d_reconstruction_tpu.viz.draw import crop_coords_to_pixels
        import jax.numpy as jnp

        from human_3d_reconstruction_tpu.data.preprocess import transform_keypoints

        kp_src = rng.uniform(20, 100, (5, 2)).astype(np.float32)
        center = np.asarray([60.0, 50.0], np.float32)
        scale = 80.0
        crop = np.asarray(
            transform_keypoints(jnp.asarray(kp_src), jnp.asarray(center), jnp.asarray(scale))
        )
        back = crop_coords_to_pixels(crop, center, scale)
        np.testing.assert_allclose(back, kp_src, atol=1e-4)
