"""Device rasterizer vs the host numpy oracle (viz/renderer.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from human_3d_reconstruction_tpu.viz.device_raster import (
    lambert_shade,
    overlay_meshes_device,
    rasterize_scene,
    silhouette,
)
from human_3d_reconstruction_tpu.viz.renderer import overlay_mesh


@pytest.fixture()
def random_mesh(rng):
    """A cloud of ~40 random triangles inside a 64x64 viewport."""
    V = 30
    verts = np.stack(
        [
            rng.uniform(4, 60, V),
            rng.uniform(4, 60, V),
            rng.uniform(-1.0, 1.0, V),
        ],
        axis=1,
    ).astype(np.float32)
    faces = rng.integers(0, V, (40, 3)).astype(np.int32)
    return verts, faces


class TestRasterizeScene:
    def test_matches_numpy_oracle(self, random_mesh, rng):
        verts, faces = random_mesh
        image = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
        color = np.asarray([120.0, 160.0, 255.0], np.float32)

        ref = overlay_mesh(image, verts, faces, color=color, force_numpy=True)
        got = np.asarray(
            overlay_meshes_device(
                jnp.asarray(image),
                jnp.asarray(verts)[None],
                jnp.asarray(faces),
                jnp.asarray(color)[None],
            )
        )
        # f32 vs f64 barycentric edges: a tiny rim of pixels may flip.
        diff = np.abs(ref - got).max(axis=-1)
        mismatched = float((diff > 1.0).mean())
        assert mismatched < 0.01, f"{mismatched:.3%} of pixels disagree"

    def test_occlusion_order(self):
        """A near triangle must win the z-test over a far one exactly."""
        verts = np.asarray(
            [
                # far triangle (z=1.0) covering the center
                [8, 8, 1.0], [56, 8, 1.0], [32, 56, 1.0],
                # near triangle (z=0.0), same footprint
                [8, 8, 0.0], [56, 8, 0.0], [32, 56, 0.0],
            ],
            np.float32,
        )
        faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        shade = np.asarray([0.2, 0.9], np.float32)
        colors = np.asarray([[255, 0, 0], [0, 255, 0]], np.float32)
        zbuf, sh, col, hit = rasterize_scene(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(shade),
            jnp.asarray(colors), 64, 64,
        )
        assert bool(hit[20, 32])
        assert float(zbuf[20, 32]) == 0.0
        assert float(sh[20, 32]) == pytest.approx(0.9)
        np.testing.assert_allclose(np.asarray(col[20, 32]), [0, 255, 0])

    def test_chunk_size_invariance(self, random_mesh):
        """Result is independent of the scan chunking."""
        verts, faces = random_mesh
        shade = lambert_shade(jnp.asarray(verts), jnp.asarray(faces))
        col = jnp.ones((len(faces), 3), jnp.float32)
        a = rasterize_scene(
            jnp.asarray(verts), jnp.asarray(faces), shade, col, 64, 64, chunk=7
        )
        b = rasterize_scene(
            jnp.asarray(verts), jnp.asarray(faces), shade, col, 64, 64, chunk=64
        )
        for x, y in zip(a, b):
            # different chunk shapes fuse differently (FMA contraction):
            # tiny fp drift is expected, winners must not change
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)

    def test_silhouette_mask(self):
        verts = np.asarray(
            [[8, 8, 0.5], [56, 8, 0.5], [32, 56, 0.5]], np.float32
        )
        faces = np.asarray([[0, 1, 2]], np.int32)
        mask = np.asarray(silhouette(jnp.asarray(verts), jnp.asarray(faces), 64, 64))
        assert mask[20, 32] == 1.0   # inside
        assert mask[2, 2] == 0.0     # outside
        assert 0.0 < mask.mean() < 0.5

    def test_multi_person_one_program(self, random_mesh, rng):
        """Two meshes rasterize in one call; the nearer one wins overlap."""
        verts, faces = random_mesh
        near = verts.copy()
        near[:, 2] -= 10.0
        image = jnp.zeros((64, 64, 3), jnp.float32)
        colors = jnp.asarray([[255, 0, 0], [0, 0, 255]], jnp.float32)
        out = np.asarray(
            overlay_meshes_device(
                image,
                jnp.asarray(np.stack([verts, near])),
                jnp.asarray(faces),
                colors,
                alpha=1.0,
            )
        )
        # wherever both cover, blue (near) must dominate red
        assert out[..., 2].sum() > out[..., 0].sum()

    def test_soft_silhouette_approximates_hard(self):
        from human_3d_reconstruction_tpu.viz.device_raster import soft_silhouette

        verts = np.asarray(
            [[8, 8, 0.5], [56, 8, 0.5], [32, 56, 0.5]], np.float32
        )
        faces = np.asarray([[0, 1, 2]], np.int32)
        hard = np.asarray(silhouette(jnp.asarray(verts), jnp.asarray(faces), 64, 64))
        soft = np.asarray(
            soft_silhouette(jnp.asarray(verts), jnp.asarray(faces), 64, 64,
                            sharpness=8.0)
        )
        # deep-inside ~1, far-outside ~0, transition only near edges
        assert soft[20, 32] > 0.95 and soft[2, 2] < 0.05
        assert np.abs(soft - hard).mean() < 0.05

    def test_soft_silhouette_gradients_flow(self):
        import jax

        from human_3d_reconstruction_tpu.viz.device_raster import soft_silhouette

        verts = jnp.asarray(
            [[8.0, 8.0, 0.5], [56.0, 8.0, 0.5], [32.0, 56.0, 0.5]]
        )
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        target = silhouette(verts + jnp.asarray([4.0, 0.0, 0.0]), faces, 64, 64)

        def iou_loss(v):
            m = soft_silhouette(v, faces, 64, 64, sharpness=2.0)
            inter = jnp.sum(m * target)
            union = jnp.sum(m + target) - inter
            return 1.0 - inter / union

        g = jax.grad(iou_loss)(verts)
        assert np.all(np.isfinite(np.asarray(g)))
        # the loss must pull vertices toward the shifted target (+x)
        assert float(g[:, 0].sum()) < 0.0

    def test_depth_only_matches_full_pipeline(self, random_mesh):
        """rasterize_depth == rasterize_scene's depth buffer."""
        from human_3d_reconstruction_tpu.viz.device_raster import rasterize_depth

        verts, faces = random_mesh
        shade = lambert_shade(jnp.asarray(verts), jnp.asarray(faces))
        col = jnp.ones((len(faces), 3), jnp.float32)
        zfull, *_ = rasterize_scene(
            jnp.asarray(verts), jnp.asarray(faces), shade, col, 64, 64
        )
        zonly = rasterize_depth(jnp.asarray(verts), jnp.asarray(faces), 64, 64)
        a, b = np.asarray(zfull), np.asarray(zonly)
        assert (np.isfinite(a) == np.isfinite(b)).all()
        np.testing.assert_allclose(
            a[np.isfinite(a)], b[np.isfinite(b)], atol=1e-5
        )

    def test_exported_session_empty_boxes(self):
        """(regression) ExportedRecoverySession.recover([]) returns []."""
        # guarded in serving_export.recover; no artifact needed to assert
        # the early return path via a stub
        from human_3d_reconstruction_tpu.serving_export import (
            ExportedRecoverySession,
        )

        srv = ExportedRecoverySession.__new__(ExportedRecoverySession)
        srv.frame_shape = (8, 8)
        srv.buckets = (1,)
        out = srv.recover(np.zeros((8, 8, 3), np.float32), [])
        assert out == []
