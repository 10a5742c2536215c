"""Tiled rasterizer equivalence (VERDICT r2 item 3).

Equality bar: the binned path must match the dense rasterizer EXACTLY on
local meshes (binning is a conservative bbox superset), and the overflow
path must route to the dense program (equality trivially). Soft silhouette
matches within the documented slack band and carries matching gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.viz.device_raster import (
    lambert_shade,
    rasterize_depth,
    rasterize_scene,
    soft_silhouette,
)
from human_3d_reconstruction_tpu.viz.mesh_io import uv_sphere
from human_3d_reconstruction_tpu.viz.tiled_raster import (
    _tile_bins,
    rasterize_depth_tiled,
    rasterize_scene_tiled,
    soft_silhouette_tiled,
)

H, W = 96, 128


def _sphere_px(rows=16, cols=24, radius=30.0, center=(60.0, 50.0, 2.0)):
    """Local-topology mesh in pixel space (the realistic workload shape)."""
    v, f = uv_sphere(rows, cols, radius=radius, center=center)
    return jnp.asarray(v), jnp.asarray(f)


def _random_mesh(rng, n_verts=60, n_faces=90):
    """Random-triple topology: huge triangles, NO locality -> overflow."""
    v = np.stack(
        [
            rng.uniform(0, W, n_verts),
            rng.uniform(0, H, n_verts),
            rng.uniform(1.0, 5.0, n_verts),
        ],
        axis=1,
    ).astype(np.float32)
    f = rng.integers(0, n_verts, (n_faces, 3)).astype(np.int32)
    return jnp.asarray(v), jnp.asarray(f)


class TestBins:
    def test_bins_conservative(self):
        v, f = _sphere_px()
        tri = np.asarray(v)[np.asarray(f)]
        idx, valid, overflow = jax.jit(
            lambda t: _tile_bins(t, th=3, tw=4, ts=32, cap=512, expand=0.0)
        )(jnp.asarray(tri))
        assert not bool(overflow)
        idx, valid = np.asarray(idx), np.asarray(valid)
        # every triangle whose bbox touches a tile is in that tile's bin
        for t_lin in range(12):
            ty, tx = divmod(t_lin, 4)
            x0, y0 = tx * 32, ty * 32
            xmin = tri[:, :, 0].min(1); xmax = tri[:, :, 0].max(1)
            ymin = tri[:, :, 1].min(1); ymax = tri[:, :, 1].max(1)
            want = np.where(
                (xmin < x0 + 32) & (xmax >= x0) & (ymin < y0 + 32) & (ymax >= y0)
            )[0]
            got = set(idx[t_lin][valid[t_lin]].tolist())
            assert got == set(want.tolist()), t_lin

    def test_overflow_flag(self, rng):
        v, f = _random_mesh(rng)
        tri = jnp.asarray(np.asarray(v)[np.asarray(f)])
        _, _, overflow = _tile_bins(tri, th=6, tw=8, ts=16, cap=8, expand=0.0)
        assert bool(overflow)


class TestDepthEquality:
    def test_local_mesh_exact(self):
        v, f = _sphere_px()
        dense = np.asarray(rasterize_depth(v, f, H, W))
        for tile, cap in ((32, 512), (16, 384), (48, 640)):
            tiled = np.asarray(
                rasterize_depth_tiled(v, f, H, W, tile=tile, cap=cap)
            )
            np.testing.assert_array_equal(tiled, dense), (tile, cap)

    def test_overflow_falls_back_dense(self, rng):
        v, f = _random_mesh(rng)
        dense = np.asarray(rasterize_depth(v, f, H, W))
        tiled = np.asarray(rasterize_depth_tiled(v, f, H, W, tile=16, cap=128))
        np.testing.assert_array_equal(tiled, dense)

    def test_multi_mesh_concat(self):
        v1, f1 = _sphere_px(center=(40.0, 40.0, 2.0))
        v2, f2 = _sphere_px(center=(80.0, 60.0, 3.0))
        v = jnp.concatenate([v1, v2])
        f = jnp.concatenate([f1, f2 + v1.shape[0]])
        np.testing.assert_array_equal(
            np.asarray(rasterize_depth_tiled(v, f, H, W)),
            np.asarray(rasterize_depth(v, f, H, W)),
        )


class TestSceneEquality:
    def test_payload_exact(self):
        v, f = _sphere_px()
        shade = lambert_shade(v, f)
        color = jnp.asarray(
            np.random.default_rng(0).uniform(0, 255, (f.shape[0], 3)).astype(np.float32)
        )
        dz, dsh, dcol, dhit = rasterize_scene(v, f, shade, color, H, W)
        tz, tsh, tcol, thit = rasterize_scene_tiled(v, f, shade, color, H, W)
        np.testing.assert_array_equal(np.asarray(tz), np.asarray(dz))
        np.testing.assert_array_equal(np.asarray(thit), np.asarray(dhit))
        # shade/color: same winner unless two faces tie on z exactly.
        np.testing.assert_allclose(np.asarray(tsh), np.asarray(dsh), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tcol), np.asarray(dcol), atol=1e-4)

    def test_payload_overflow_dense(self, rng):
        v, f = _random_mesh(rng)
        shade = lambert_shade(v, f)
        color = jnp.ones((f.shape[0], 3), jnp.float32)
        dz, dsh, dcol, dhit = rasterize_scene(v, f, shade, color, H, W)
        tz, tsh, tcol, thit = rasterize_scene_tiled(
            v, f, shade, color, H, W, tile=16, cap=128
        )
        np.testing.assert_array_equal(np.asarray(tz), np.asarray(dz))
        np.testing.assert_array_equal(np.asarray(tsh), np.asarray(dsh))


class TestSoftEquality:
    def test_soft_matches_within_slack(self):
        v, f = _sphere_px()
        dense = np.asarray(soft_silhouette(v, f, H, W, sharpness=2.0))
        tiled = np.asarray(soft_silhouette_tiled(v, f, H, W, sharpness=2.0))
        assert np.abs(tiled - dense).max() < 1e-3

    def test_soft_gradients_match(self):
        v, f = _sphere_px(rows=8, cols=12)
        target = jnp.zeros((H, W))

        def loss_dense(vv):
            return jnp.mean((soft_silhouette(vv, f, H, W, sharpness=2.0) - target) ** 2)

        def loss_tiled(vv):
            return jnp.mean(
                (soft_silhouette_tiled(vv, f, H, W, sharpness=2.0) - target) ** 2
            )

        gd = np.asarray(jax.grad(loss_dense)(v))
        gt = np.asarray(jax.grad(loss_tiled)(v))
        assert np.all(np.isfinite(gt))
        scale = np.abs(gd).max() + 1e-12
        assert np.abs(gt - gd).max() / scale < 1e-2, np.abs(gt - gd).max() / scale

    def test_soft_overflow_dense(self, rng):
        v, f = _random_mesh(rng)
        dense = np.asarray(soft_silhouette(v, f, H, W, sharpness=1.0))
        tiled = np.asarray(
            soft_silhouette_tiled(v, f, H, W, sharpness=1.0, tile=16, cap=64)
        )
        np.testing.assert_allclose(tiled, dense, atol=1e-5)


class TestChunkInvariance:
    def test_depth_chunk_and_tile_invariance(self):
        v, f = _sphere_px()
        ref = np.asarray(rasterize_depth_tiled(v, f, H, W, tile=32, cap=512, chunk=512))
        for chunk in (128, 256):
            out = np.asarray(
                rasterize_depth_tiled(v, f, H, W, tile=32, cap=512, chunk=chunk)
            )
            np.testing.assert_array_equal(out, ref)


class TestVmappedTiled:
    """The fitting path vmaps the soft render over persons with
    fallback=False — cover exactly that usage shape."""

    def test_vmapped_soft_equals_dense(self):
        v1, f = _sphere_px(rows=8, cols=12, center=(60.0, 50.0, 2.0))
        v2 = v1 + jnp.asarray([12.0, -6.0, 0.5])
        batch_v = jnp.stack([v1, v2])

        tiled = jax.vmap(
            lambda v: soft_silhouette_tiled(
                v, f, H, W, sharpness=2.0, cap=512, fallback=False
            )
        )(batch_v)
        dense = jax.vmap(lambda v: soft_silhouette(v, f, H, W, sharpness=2.0))(
            batch_v
        )
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(dense), atol=1e-5)

    def test_sorted_grad_matches_scatter_grad(self):
        """sorted_grad=True: identical forward, gradients equal to the
        scatter-VJP path (summation-order fp noise aside)."""
        v, f = _sphere_px(rows=10, cols=14)
        target = jnp.zeros((H, W))

        def loss(vv, sorted_grad):
            s = soft_silhouette_tiled(
                vv, f, H, W, sharpness=2.0, cap=512,
                fallback=False, sorted_grad=sorted_grad,
            )
            return jnp.mean((s - target) ** 2)

        s_a = soft_silhouette_tiled(v, f, H, W, sharpness=2.0, cap=512,
                                    fallback=False, sorted_grad=False)
        s_b = soft_silhouette_tiled(v, f, H, W, sharpness=2.0, cap=512,
                                    fallback=False, sorted_grad=True)
        np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))
        g_a = np.asarray(jax.grad(lambda x: loss(x, False))(v))
        g_b = np.asarray(jax.grad(lambda x: loss(x, True))(v))
        np.testing.assert_allclose(g_b, g_a, atol=2e-6)

    def test_full_span_no_fallback_handles_wide_triangles(self, rng):
        """With the dense fallback off (the fitting usage), a face bbox
        wider than the default 3-tile span must NOT be silently truncated:
        passing the full-grid span makes the binned result equal dense for
        ANY triangle size (fails on the pre-span-parameter code, which
        dropped the overflowing faces' far tiles)."""
        v, f = _random_mesh(rng, n_verts=40, n_faces=60)  # huge triangles
        span_full = max(-(-H // 16), -(-W // 16))  # 8 for 96x128 @ tile 16
        tiled = soft_silhouette_tiled(
            v, f, H, W, sharpness=1.0, tile=16, cap=128,
            fallback=False, span=span_full,
        )
        dense = soft_silhouette(v, f, H, W, sharpness=1.0)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(dense), atol=1e-5)

    def test_fitting_mask_raster_tiled(self, smpl_model):
        """refine_params(mask_raster='tiled') on a LOCAL topology matches
        the dense mask objective's refinement.

        Inputs come from a LOCAL fixed-seed generator, not the session
        `rng` fixture: that fixture is shared mutable state, so this
        test's poses used to depend on how many earlier tests consumed
        the stream — adding unrelated tests shifted it onto poses where
        the two 3-step adam trajectories (identical objectives up to fp
        reassociation) diverged past tolerance. Trajectory comparison is
        chaos-amplified by construction; the render-level tiled==dense
        equality is pinned exactly by the other tests in this file."""
        from human_3d_reconstruction_tpu.fitting import refine_params

        rng = np.random.default_rng(1234)
        params = {k: np.asarray(v) for k, v in smpl_model.as_dict().items()}
        # Replace the synthetic model's random-triple faces with a local
        # topology: each vertex + its two nearest neighbors.
        vt = params["v_template"]
        sub = vt[:512]
        d = np.linalg.norm(sub[:, None] - sub[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        nn = np.argsort(d, axis=1)[:, :2]
        params["faces"] = np.concatenate(
            [np.arange(512)[:, None], nn], axis=1
        ).astype(np.int32)

        B = 2
        theta = jnp.asarray(rng.normal(scale=0.2, size=(B, 72)).astype(np.float32))
        beta = jnp.zeros((B, 10))
        cam = jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]), (B, 1))
        kp2d = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 14, 2)).astype(np.float32))
        vis = jnp.ones((B, 14))
        masks = jnp.ones((B, 48, 48), jnp.float32)
        jparams = {k: jnp.asarray(v) for k, v in params.items()}

        outs = {}
        for mode in ("dense", "tiled"):
            outs[mode] = refine_params(
                jparams, theta, beta, cam, kp2d, vis, num_steps=3,
                masks=masks, lambda_mask=1.0, mask_raster=mode,
                mask_tile_cap=512,
            )
        # The soft-or's summation order differs between paths; Adam's
        # normalizer amplifies that fp noise over the steps — compare at the
        # noise-amplified scale, not exact.
        np.testing.assert_allclose(
            np.asarray(outs["tiled"].theta), np.asarray(outs["dense"].theta), atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(outs["tiled"].loss_history), np.asarray(outs["dense"].loss_history), rtol=1e-3, atol=1e-4
        )
