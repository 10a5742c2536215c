"""Mesh IO round-trips and the timing harness."""

import numpy as np

import jax.numpy as jnp

from human_3d_reconstruction_tpu.utils.profiling import Timing, sync, timeit
from human_3d_reconstruction_tpu.viz.mesh_io import load_obj, save_obj, save_ply


class TestMeshIO:
    def test_obj_roundtrip(self, tmp_path, rng):
        verts = rng.normal(size=(20, 3)).astype(np.float32)
        faces = rng.integers(0, 20, (30, 3))
        save_obj(tmp_path / "m.obj", verts, faces)
        v2, f2 = load_obj(tmp_path / "m.obj")
        np.testing.assert_allclose(v2, verts, atol=1e-5)
        np.testing.assert_array_equal(f2, faces)

    def test_ply_writes(self, tmp_path, rng):
        verts = rng.normal(size=(5, 3)).astype(np.float32)
        faces = rng.integers(0, 5, (4, 3))
        save_ply(tmp_path / "m.ply", verts, faces)
        text = (tmp_path / "m.ply").read_text()
        assert "element vertex 5" in text and "element face 4" in text


class TestProfiling:
    def test_timeit_returns_sane_stats(self):
        x = jnp.ones((64, 64))
        t = timeit(lambda: x @ x, reps=5, warmup=1)
        assert isinstance(t, Timing)
        assert 0 < t.p50_s <= t.p90_s
        assert t.mean_ms > 0

    def test_sync_forces_value(self):
        assert sync(jnp.full((4,), 2.0)) == 2.0
        assert sync({"a": jnp.zeros((2, 2))}) == 0.0
