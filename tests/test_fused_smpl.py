"""Pallas fused-SMPL kernel vs XLA twin equivalence (SURVEY.md section 4
item 2). On CPU the kernel runs in interpret mode; on TPU compiled — same
test code covers both.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.ops import prepare_fused_smpl, smpl_forward_fused
from human_3d_reconstruction_tpu.smpl import smpl_forward

pytestmark = pytest.mark.fast  # pre-commit lane: `pytest -m fast` (<5 min warm)


@pytest.fixture(scope="module")
def prepared(smpl_model):
    return prepare_fused_smpl(smpl_model.as_dict())


def random_inputs(rng, batch):
    pose = jnp.asarray(rng.normal(scale=0.7, size=(batch, 72)).astype(np.float32))
    betas = jnp.asarray(rng.normal(size=(batch, 10)).astype(np.float32))
    return pose, betas


class TestFusedEquivalence:
    @pytest.mark.parametrize("batch", [1, 4])
    def test_matches_xla_twin(self, smpl_model, prepared, rng, batch):
        pose, betas = random_inputs(rng, batch)
        ref = smpl_forward(smpl_model.as_dict(), pose, betas)
        fused = smpl_forward_fused(prepared, pose, betas)

        np.testing.assert_allclose(
            np.asarray(fused.verts), np.asarray(ref.verts), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(fused.joints), np.asarray(ref.joints), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(fused.eval_joints), np.asarray(ref.eval_joints), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(fused.rest_joints), np.asarray(ref.rest_joints), atol=2e-5
        )

    def test_raw_params_accepted(self, smpl_model, rng):
        """Un-prepacked params work too (repack happens in-trace)."""
        pose, betas = random_inputs(rng, 2)
        fused = smpl_forward_fused(smpl_model.as_dict(), pose, betas)
        ref = smpl_forward(smpl_model.as_dict(), pose, betas)
        np.testing.assert_allclose(
            np.asarray(fused.verts), np.asarray(ref.verts), atol=2e-5
        )

    def test_translation(self, smpl_model, prepared, rng):
        pose, betas = random_inputs(rng, 2)
        t = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
        fused = smpl_forward_fused(prepared, pose, betas, trans=t)
        base = smpl_forward_fused(prepared, pose, betas)
        np.testing.assert_allclose(
            np.asarray(fused.verts), np.asarray(base.verts) + np.asarray(t)[:, None], atol=1e-6
        )

    def test_jit(self, prepared, rng):
        pose, betas = random_inputs(rng, 2)
        f = jax.jit(lambda p, b: smpl_forward_fused(prepared, p, b).verts)
        out = f(pose, betas)
        assert out.shape == (2, 6890, 3)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_gradients_match_xla(self, smpl_model, prepared, rng):
        """Custom VJP (XLA-twin backward) == differentiating the twin."""
        pose, betas = random_inputs(rng, 2)

        def loss_fused(p, b):
            return jnp.sum(smpl_forward_fused(prepared, p, b).verts ** 2)

        def loss_ref(p, b):
            return jnp.sum(smpl_forward(smpl_model.as_dict(), p, b).verts ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1))(pose, betas)
        gr = jax.grad(loss_ref, argnums=(0, 1))(pose, betas)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-3)

    def test_padded_tail_is_zero_effect(self, smpl_model, prepared, rng):
        """Padding rows contribute nothing: vert count and values exact."""
        pose, betas = random_inputs(rng, 1)
        fused = smpl_forward_fused(prepared, pose, betas)
        assert fused.verts.shape[1] == smpl_model.v_template.shape[0]


class TestBF16Basis:
    def test_bf16_basis_within_parity_bar(self, smpl_model):
        """bf16 blendshape basis: looser than the twin bar (2e-5) but far
        inside the BASELINE 1e-3 m parity bar.

        Own fixed rng (not the shared session fixture): the max-error bound
        sits near the bf16 tail, so the inputs must be deterministic
        regardless of test execution order.
        """
        from human_3d_reconstruction_tpu.ops import prepare_fused_smpl

        prepared16 = prepare_fused_smpl(smpl_model.as_dict(), basis_dtype=jnp.bfloat16)
        pose, betas = random_inputs(np.random.default_rng(42), 4)
        ref = smpl_forward(smpl_model.as_dict(), pose, betas)
        fused16 = smpl_forward_fused(prepared16, pose, betas)

        err = float(jnp.abs(fused16.verts - ref.verts).max())
        assert err < 1e-3, err  # max tail ~0.7 mm observed; bar is 1 mm
        mean_err = float(jnp.abs(fused16.verts - ref.verts).mean())
        assert mean_err < 3e-4, mean_err  # typical ~0.1 mm (input-dependent)
        # joints come from the f32 folded regressor: still tight
        jerr = float(jnp.abs(fused16.joints - ref.joints).max())
        assert jerr < 1e-5, jerr


class TestVertTileSelection:
    def test_tile_table_matches_measured_good_configs(self, smpl_model):
        """Pin the VMEM tile heuristic to the hardware-measured envelope:
        every (batch, tile) pair below compiled and ran on the v5e; B=512
        with the pre-cap tiles (fwd 128 / bwd 128) OOM'd scoped VMEM
        (18.6 MB > 16 MB), hence the tile*batch cap."""
        from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
        from human_3d_reconstruction_tpu.ops.fused_smpl import _static_vert_tile

        prep = prepare_fused_smpl(smpl_model.as_dict())
        expected = {
            16: (512, 512),
            64: (512, 512),
            128: (512, 256),
            256: (256, 128),
        }
        Vp = prep["basis_dirs"].shape[2]
        for B, (fwd, bwd) in expected.items():
            assert _static_vert_tile(prep, B) == fwd, B
            assert _static_vert_tile(prep, B, backward=True) == bwd, B
            assert Vp % fwd == 0 and Vp % bwd == 0

    def test_large_batch_chunks_to_kernel_max(self, smpl_model):
        """B > _MAX_KERNEL_BATCH runs as chunked kernel calls (lax.map):
        values AND grads must match the XLA twin at B=512."""
        import jax
        import jax.numpy as jnp

        from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
        from human_3d_reconstruction_tpu.ops.fused_smpl import smpl_forward_fused
        from human_3d_reconstruction_tpu.smpl.forward import smpl_forward

        prep = prepare_fused_smpl(smpl_model.as_dict())
        raw = jax.tree.map(jnp.asarray, smpl_model.as_dict())
        B = 512
        rng = np.random.default_rng(3)
        pose = jnp.asarray(rng.normal(0, 0.3, (B, 72)).astype(np.float32))
        betas = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))

        v_f = smpl_forward_fused(prep, pose, betas).verts
        v_x = smpl_forward(raw, pose, betas).verts
        np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_x), atol=2e-5)

        # odd (non-multiple-of-chunk) batch: zero-padded to the next chunk
        # multiple and sliced back
        v_f260 = smpl_forward_fused(prep, pose[:260], betas[:260]).verts
        np.testing.assert_allclose(
            np.asarray(v_f260), np.asarray(v_x[:260]), atol=2e-5
        )

        g_f = jax.grad(lambda p: jnp.sum(smpl_forward_fused(prep, p, betas).verts ** 2))(pose)
        g_x = jax.grad(lambda p: jnp.sum(smpl_forward(raw, p, betas).verts ** 2))(pose)
        np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x), rtol=2e-3, atol=2e-2)
