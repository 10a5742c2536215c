"""Sharding primitive tests + DP inference over the virtual 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from human_3d_reconstruction_tpu.parallel import (
    DATA_AXIS,
    make_mesh,
    replicate,
    shard_batch,
)

import pytest

pytestmark = pytest.mark.fast  # pre-commit lane: `pytest -m fast` (<5 min warm)


class TestMeshPrimitives:
    def test_mesh_spans_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == (DATA_AXIS,)

    def test_shard_batch_layout(self, rng):
        mesh = make_mesh()
        batch = {
            "x": rng.normal(size=(16, 4)).astype(np.float32),   # divisible -> sharded
            "odd": rng.normal(size=(3, 4)).astype(np.float32),  # not -> replicated
            "scalar": np.float32(3.0),
        }
        placed = shard_batch(batch, mesh)
        x_shard = placed["x"].sharding
        assert x_shard.spec == P(DATA_AXIS)
        assert placed["odd"].sharding.spec in (P(), P(None))
        np.testing.assert_allclose(np.asarray(placed["x"]), batch["x"])

    def test_replicate(self, rng):
        mesh = make_mesh()
        tree = {"w": rng.normal(size=(4, 4)).astype(np.float32)}
        rep = replicate(tree, mesh)
        assert rep["w"].sharding.spec in (P(), P(None))


class TestDPInference:
    def test_sharded_recover_matches_single_device(self, smpl_model, rng):
        """Inference DP: batch sharded over 8 devices == unsharded values."""
        from human_3d_reconstruction_tpu.api import make_recover_mesh
        from human_3d_reconstruction_tpu.models import HMRConfig, HMRModel

        mesh = make_mesh()
        model = HMRModel(config=HMRConfig())
        images = jnp.asarray(rng.normal(size=(8, 64, 64, 3)).astype(np.float32))
        variables = model.init(jax.random.key(0), images[:1])
        smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())
        recover = make_recover_mesh(model)

        ref = recover(variables, smpl_params, images)

        images_s = jax.device_put(images, NamedSharding(mesh, P(DATA_AXIS)))
        vars_r = replicate(variables, mesh)
        smpl_r = replicate(smpl_params, mesh)
        out = recover(vars_r, smpl_r, images_s)

        np.testing.assert_allclose(
            np.asarray(out.verts), np.asarray(ref.verts), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.theta), np.asarray(ref.theta), atol=2e-4
        )
