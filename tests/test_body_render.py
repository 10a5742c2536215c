"""Shaded-body synthetic protocol (viz/body_render.py; VERDICT r3 weak #4).

The hardened replacement for blob skeletons: posed SMPL surface, Lambert
shading under random lights, body-attached texture, randomized background.
Tests pin the properties the protocol's validity rests on: local topology
(tiled fast path), determinism per (pose, key), pose-dependence of pixels,
and exact projection agreement with the dataset's kp2d convention.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model
from human_3d_reconstruction_tpu.viz.body_render import (
    body_vertex_colors,
    local_surface_faces,
    make_frame_renderer,
)

FRAME = (96, 96)


@pytest.fixture(scope="module")
def body():
    model = synthetic_smpl_model(seed=0)
    v_template = np.asarray(model.as_dict()["v_template"])
    return model, v_template


class TestTopology:
    def test_faces_valid_and_local(self, body):
        _, v = body
        faces = local_surface_faces(v)
        assert faces.dtype == np.int32 and faces.shape[1] == 3
        assert faces.min() >= 0 and faces.max() < len(v)
        # no degenerate triangles
        assert (faces[:, 0] != faces[:, 1]).all()
        assert (faces[:, 1] != faces[:, 2]).all()
        assert (faces[:, 0] != faces[:, 2]).all()
        # LOCALITY is what routes the tiled rasterizer to its binned fast
        # path: every triangle spans nearest template neighbors, so its
        # extent is centimeters, not the random-triple topology's meters.
        tri = v[faces]
        extent = np.linalg.norm(tri.max(axis=1) - tri.min(axis=1), axis=1)
        assert np.median(extent) < 0.10, float(np.median(extent))
        assert extent.max() < 0.8, float(extent.max())

    def test_vertex_colors_in_unit_range(self, body):
        _, v = body
        c = body_vertex_colors(v, seed=0)
        assert c.shape == (len(v), 3)
        assert c.min() >= 0.0 and c.max() <= 1.0
        # texture varies over the surface (it's a texture, not a constant)
        assert c.std(axis=0).mean() > 0.01


class TestRenderer:
    @pytest.fixture(scope="class")
    def rendered(self, body):
        import jax

        from human_3d_reconstruction_tpu.smpl.forward import smpl_forward

        model, v = body
        faces = local_surface_faces(v)
        colors = body_vertex_colors(v)
        render = make_frame_renderer(faces, colors, FRAME, chunk_frames=4)
        params = {k: jnp.asarray(a) for k, a in model.as_dict().items()}
        rng = np.random.default_rng(0)
        thetas = rng.normal(scale=0.3, size=(4, 72)).astype(np.float32)
        betas = rng.normal(scale=0.8, size=(4, 10)).astype(np.float32)
        out = jax.jit(lambda p, b: smpl_forward(params, p, b))(thetas, betas)
        mu = np.asarray(out.eval_joints[:, :14]).mean(axis=1, keepdims=True)
        verts_c = np.asarray(out.verts) - mu
        H, W = FRAME
        centers = np.tile([[W / 2.0, H / 2.0]], (4, 1)).astype(np.float32)
        scales = np.full((4,), min(H, W) * 0.8, np.float32)
        keys = np.arange(4, dtype=np.uint32)
        imgs = render(verts_c, centers, scales, keys)
        return render, verts_c, centers, scales, keys, imgs

    def test_shape_dtype_and_determinism(self, rendered):
        render, verts_c, centers, scales, keys, imgs = rendered
        assert imgs.shape == (4, *FRAME, 3) and imgs.dtype == np.uint8
        again = render(verts_c, centers, scales, keys)
        np.testing.assert_array_equal(imgs, again)

    def test_pose_changes_pixels_key_changes_background(self, rendered):
        render, verts_c, centers, scales, keys, imgs = rendered
        # same key, different pose -> different image (pose is visible)
        swap = render(verts_c[::-1].copy(), centers, scales, keys)
        assert not np.array_equal(swap[0], imgs[0])
        # same pose, different key -> different image (light/bg vary)
        other = render(verts_c, centers, scales, keys + 1000)
        assert not np.array_equal(other[0], imgs[0])

    def test_body_lands_in_the_person_box(self, rendered, body):
        """Projection must match the dataset's kp2d convention: the body's
        hit mask (recomputed via the depth rasterizer with the same
        mapping) covers a sane fraction of the box around `center`."""
        from human_3d_reconstruction_tpu.viz.tiled_raster import (
            rasterize_depth_tiled,
        )

        model, v = body
        _, verts_c, centers, scales, _, imgs = rendered
        faces = jnp.asarray(local_surface_faces(v))
        H, W = FRAME
        xy = centers[0][None] + verts_c[0][:, :2] * (0.9 * scales[0] / 2.0)
        verts_px = jnp.asarray(
            np.concatenate([xy, verts_c[0][:, 2:3]], axis=1, dtype=np.float32)
        )
        z = rasterize_depth_tiled(verts_px, faces, H, W)
        frac = float(np.isfinite(np.asarray(z)).mean())
        assert 0.05 < frac < 0.9, frac
        # and the rendered frame differs from ITS OWN background exactly on
        # a comparable number of pixels: re-render with the body pushed out
        # of frame -> pure background; diff mask ~ hit mask.
        far = verts_c[:1] + np.asarray([10.0, 0, 0], np.float32)
        bg_only = make_frame_renderer(
            local_surface_faces(v), body_vertex_colors(v), FRAME, chunk_frames=4
        )(
            np.repeat(far, 4, 0),
            centers,
            scales,
            np.arange(4, dtype=np.uint32),
        )
        diff = (imgs[0] != bg_only[0]).any(axis=-1).mean()
        assert abs(float(diff) - frac) < 0.15, (float(diff), frac)


class TestDatasetMeshMode:
    def test_mesh_mode_dataset(self, body):
        from human_3d_reconstruction_tpu.data.datasets import (
            SyntheticImageDataset,
        )

        model, _ = body
        ds = SyntheticImageDataset(
            model, n=3, frame_hw=FRAME, seed=5, render_mode="mesh"
        )
        r0, r1 = ds[0], ds[1]
        assert r0.image.dtype == np.uint8 and r0.image.shape == (*FRAME, 3)
        assert not np.array_equal(r0.image, r1.image)
        # deterministic across instances (train/val reproducibility)
        ds2 = SyntheticImageDataset(
            model, n=3, frame_hw=FRAME, seed=5, render_mode="mesh"
        )
        np.testing.assert_array_equal(ds2[0].image, r0.image)
        # kp/joints identical to the blob protocol's (same poses, same
        # camera): only the IMAGE changed
        ds_blob = SyntheticImageDataset(
            model, n=3, frame_hw=FRAME, seed=5, render_mode="skeleton"
        )
        np.testing.assert_array_equal(ds_blob.kp2d_px, ds.kp2d_px)
        np.testing.assert_array_equal(ds_blob.joints3d, ds.joints3d)

    def test_unknown_mode_raises(self, body):
        from human_3d_reconstruction_tpu.data.datasets import (
            SyntheticImageDataset,
        )

        model, _ = body
        with pytest.raises(ValueError):
            SyntheticImageDataset(model, n=2, render_mode="wireframe")
