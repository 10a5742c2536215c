"""Golden-value tests: JAX SMPL forward vs independent torch-CPU oracle.

SURVEY.md section 4 item 1: per-stage golden tests (rodrigues, blendshapes,
chain, LBS) at <=1e-3 (parity bar) and the pure-JAX path at ~1e-5 f32.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.smpl import smpl_forward
from human_3d_reconstruction_tpu.utils.geometry import (
    orthographic_project,
    rodrigues,
    rot6d_to_matrix,
    rotation_matrix_to_axis_angle,
)
from tests.oracle_smpl_torch import SMPLOracle, rodrigues_torch

pytestmark = pytest.mark.fast  # pre-commit lane: `pytest -m fast` (<5 min warm)


def random_params(rng, batch, num_betas=10, pose_scale=0.6):
    pose = rng.normal(scale=pose_scale, size=(batch, 72)).astype(np.float32)
    betas = rng.normal(scale=1.0, size=(batch, num_betas)).astype(np.float32)
    return pose, betas


class TestRodrigues:
    def test_matches_torch_quaternion_route(self, rng):
        aa = rng.normal(scale=1.2, size=(257, 3)).astype(np.float32)
        ours = np.asarray(rodrigues(jnp.asarray(aa)))
        theirs = rodrigues_torch(torch.from_numpy(aa)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-6)

    def test_identity_at_zero(self):
        R = np.asarray(rodrigues(jnp.zeros((4, 3))))
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-7)

    def test_small_angle_stable_gradient(self):
        g = jax.grad(lambda v: jnp.sum(rodrigues(v)))(jnp.full((3,), 1e-9))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_gradient_finite_at_exact_zero(self):
        """Regression: at an EXACTLY zero axis-angle the unselected
        (1-cos t)/t^2 branch's quotient-rule gradient used to divide by
        maximum(t^2, 1e-24)^2 — an f32 underflow to 0 -> inf, and
        0 * inf = NaN through jnp.where. Hit in practice by
        fitting.refine_params on a pose with an identity global rotation.
        The analytic gradient at 0 is d(sum R)/dv = sum of [v]_x basis
        derivatives: each component's skew pattern sums to 0."""
        g = jax.grad(lambda v: jnp.sum(rodrigues(v)))(jnp.zeros((3,)))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
        # Mixed batch (one zero row, one generic) stays finite everywhere.
        aa = jnp.asarray([[0.0, 0.0, 0.0], [0.3, -0.2, 0.5]])
        gb = jax.grad(lambda v: jnp.sum(rodrigues(v) ** 2))(aa)
        assert np.all(np.isfinite(np.asarray(gb)))

    def test_orthonormal(self, rng):
        aa = rng.normal(scale=2.0, size=(64, 3)).astype(np.float32)
        R = np.asarray(rodrigues(jnp.asarray(aa)))
        should_eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(should_eye, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_inverse_roundtrip(self, rng):
        aa = rng.uniform(-1.5, 1.5, size=(32, 3)).astype(np.float32)
        back = np.asarray(rotation_matrix_to_axis_angle(rodrigues(jnp.asarray(aa))))
        np.testing.assert_allclose(back, aa, atol=1e-4)


class TestRot6D:
    def test_valid_rotations(self, rng):
        x = rng.normal(size=(16, 6)).astype(np.float32)
        R = np.asarray(rot6d_to_matrix(jnp.asarray(x)))
        should_eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(should_eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_matrix_roundtrip(self, rng):
        """matrix_to_rot6d is the exact layout-inverse of rot6d_to_matrix:
        R -> 6d -> R is identity for rotation matrices (the Gram-Schmidt in
        rot6d_to_matrix is a no-op on already-orthonormal columns)."""
        from human_3d_reconstruction_tpu.utils.geometry import matrix_to_rot6d, rodrigues

        aa = rng.normal(scale=2.0, size=(32, 3)).astype(np.float32)
        R = rodrigues(jnp.asarray(aa))
        back = np.asarray(rot6d_to_matrix(matrix_to_rot6d(R)))
        np.testing.assert_allclose(back, np.asarray(R), atol=1e-5)


class TestSMPLForwardGolden:
    @pytest.fixture(scope="class")
    def oracle(self, smpl_model):
        return SMPLOracle(smpl_model)

    def test_full_forward_matches_oracle(self, smpl_model, oracle, rng):
        pose, betas = random_params(rng, batch=7)
        ours = smpl_forward(smpl_model.as_dict(), jnp.asarray(pose), jnp.asarray(betas))
        theirs = oracle(torch.from_numpy(pose), torch.from_numpy(betas))

        np.testing.assert_allclose(
            np.asarray(ours.verts), theirs["verts"].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours.joints), theirs["joints"].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours.rest_joints), theirs["rest_joints"].numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours.eval_joints), theirs["eval_joints"].numpy(), atol=1e-4
        )

    def test_matches_float64_oracle_within_parity_bar(self, smpl_model, oracle, rng):
        """BASELINE: MPJPE parity to 1e-3 (m scale -> 1 mm)."""
        pose, betas = random_params(rng, batch=4, pose_scale=1.0)
        ours = smpl_forward(smpl_model.as_dict(), jnp.asarray(pose), jnp.asarray(betas))
        o64 = oracle.double()(torch.from_numpy(pose), torch.from_numpy(betas))
        mpjpe_gap = np.linalg.norm(
            np.asarray(ours.joints) - o64["joints"].numpy(), axis=-1
        ).mean()
        assert mpjpe_gap < 1e-3, f"parity gap {mpjpe_gap} exceeds 1e-3"
        oracle.float()  # restore for other tests

    def test_zero_pose_zero_betas_is_template_like(self, smpl_model):
        B = 2
        out = smpl_forward(
            smpl_model.as_dict(), jnp.zeros((B, 72)), jnp.zeros((B, 10))
        )
        # Identity pose, zero shape: verts == v_template, joints == rest joints.
        np.testing.assert_allclose(
            np.asarray(out.verts[0]), smpl_model.v_template, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.joints), np.asarray(out.rest_joints), atol=1e-5
        )

    def test_translation(self, smpl_model, rng):
        pose, betas = random_params(rng, batch=3)
        t = rng.normal(size=(3, 3)).astype(np.float32)
        base = smpl_forward(smpl_model.as_dict(), jnp.asarray(pose), jnp.asarray(betas))
        moved = smpl_forward(
            smpl_model.as_dict(), jnp.asarray(pose), jnp.asarray(betas), trans=jnp.asarray(t)
        )
        np.testing.assert_allclose(
            np.asarray(moved.verts), np.asarray(base.verts) + t[:, None], atol=1e-6
        )

    def test_jit_and_grad(self, smpl_model, rng):
        pose, betas = random_params(rng, batch=2)
        params = jax.tree.map(jnp.asarray, smpl_model.as_dict())

        @jax.jit
        def loss(pose, betas):
            out = smpl_forward(params, pose, betas)
            return jnp.sum(out.verts**2) + jnp.sum(out.joints**2)

        g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(pose), jnp.asarray(betas))
        assert all(np.all(np.isfinite(np.asarray(x))) for x in g)

    def test_vmap_over_person_axis(self, smpl_model, rng):
        """Multi-person path: vmap(smpl) == flattened batch (SURVEY section 2)."""
        N, B = 3, 2
        pose = rng.normal(scale=0.5, size=(N, B, 72)).astype(np.float32)
        betas = rng.normal(size=(N, B, 10)).astype(np.float32)
        params = jax.tree.map(jnp.asarray, smpl_model.as_dict())

        vm = jax.vmap(lambda p, b: smpl_forward(params, p, b).verts)(
            jnp.asarray(pose), jnp.asarray(betas)
        )
        flat = smpl_forward(
            params, jnp.asarray(pose.reshape(-1, 72)), jnp.asarray(betas.reshape(-1, 10))
        ).verts.reshape(N, B, -1, 3)
        np.testing.assert_allclose(np.asarray(vm), np.asarray(flat), atol=1e-6)


class TestOrthographicProjection:
    def test_formula(self, rng):
        pts = rng.normal(size=(4, 24, 3)).astype(np.float32)
        cam = rng.normal(size=(4, 3)).astype(np.float32)
        out = np.asarray(orthographic_project(jnp.asarray(pts), jnp.asarray(cam)))
        expected = cam[:, None, 0:1] * (pts[:, :, :2] + cam[:, None, 1:3])
        np.testing.assert_allclose(out, expected, atol=1e-6)
