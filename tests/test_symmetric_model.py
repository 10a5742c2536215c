"""The bilateral-symmetry contract behind every flip feature.

Round-5 finding: the default synthetic template is NOT mirror-symmetric
(1.2 m max rest residual; its eval joints carry no left/right semantics at
all), which makes flip augmentation supervise unreachable targets — a 40k
run trained with aug_flip scored 56 mm on direct crops but 461 mm on
mirrored ones. These tests pin the three-part fix:

1. `template_mirror_error` measures the property,
2. `gate_flip_aug` disables flip aug on templates that fail it,
3. `synthetic_smpl_model(symmetric=True)` provides a template where the
   whole flip stack (flip_pose, LSP_FLIP_MAP, unflip_joints3d) is
   geometrically EXACT, certifying the transforms themselves are right.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from human_3d_reconstruction_tpu.data.skeleton import LSP_FLIP_MAP
from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model
from human_3d_reconstruction_tpu.smpl.forward import smpl_forward
from human_3d_reconstruction_tpu.smpl.pose_aug import (
    flip_pose,
    template_mirror_error,
)

pytestmark = pytest.mark.fast

MIRROR = np.array([-1.0, 1.0, 1.0], np.float32)


@pytest.fixture(scope="module")
def sym_model():
    return synthetic_smpl_model(seed=0, symmetric=True)


class TestTemplateMirrorError:
    def test_default_template_is_asymmetric(self, smpl_model):
        assert template_mirror_error(smpl_model.as_dict()) > 0.1

    def test_symmetric_template_mirrors(self, sym_model):
        assert template_mirror_error(sym_model.as_dict()) < 1e-3


class TestSymmetricModel:
    def test_schema_matches_default(self, sym_model, smpl_model):
        a, b = sym_model.as_dict(), smpl_model.as_dict()
        assert set(a) == set(b)
        for k in a:
            assert np.asarray(a[k]).shape == np.asarray(b[k]).shape, k

    def test_rows_stay_convex(self, sym_model):
        for name in ("J_regressor", "joint_regressor"):
            rows = np.asarray(getattr(sym_model, name))
            np.testing.assert_allclose(rows.sum(axis=1), 1.0, atol=1e-5)
            assert rows.min() >= 0.0
        w = np.asarray(sym_model.weights)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)

    def test_flip_pose_decodes_to_mirrored_joints(self, sym_model, rng):
        """THE certification: parameter-space flip == geometric mirror,
        including shape (betas) and pose-corrective blendshapes."""
        params = {k: jnp.asarray(v) for k, v in sym_model.as_dict().items()}
        theta = rng.normal(scale=0.4, size=(3, 72)).astype(np.float32)
        beta = rng.normal(scale=1.0, size=(3, 10)).astype(np.float32)
        j = np.asarray(
            smpl_forward(params, jnp.asarray(theta), jnp.asarray(beta)).eval_joints
        )[:, :14]
        j_f = np.asarray(
            smpl_forward(
                params, flip_pose(jnp.asarray(theta)), jnp.asarray(beta)
            ).eval_joints
        )[:, :14]
        jc = j - j.mean(axis=1, keepdims=True)
        jfc = j_f - j_f.mean(axis=1, keepdims=True)
        expect = jc[:, LSP_FLIP_MAP] * MIRROR
        np.testing.assert_allclose(jfc, expect, atol=2e-4)

    def test_unflip_inverts_flip_pose_decode(self, sym_model, rng):
        """eval.protocol.unflip_joints3d recovers the original joints from
        the mirrored decode — the flip-averaged eval's core identity."""
        from human_3d_reconstruction_tpu.eval.protocol import unflip_joints3d

        params = {k: jnp.asarray(v) for k, v in sym_model.as_dict().items()}
        theta = rng.normal(scale=0.4, size=(2, 72)).astype(np.float32)
        beta = rng.normal(scale=1.0, size=(2, 10)).astype(np.float32)
        j = np.asarray(
            smpl_forward(params, jnp.asarray(theta), jnp.asarray(beta)).eval_joints
        )[:, :14]
        j_f = np.asarray(
            smpl_forward(
                params, flip_pose(jnp.asarray(theta)), jnp.asarray(beta)
            ).eval_joints
        )[:, :14]
        jc = j - j.mean(axis=1, keepdims=True)
        jfc = j_f - j_f.mean(axis=1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(unflip_joints3d(jnp.asarray(jfc))), jc, atol=2e-4
        )

    def test_oracle_parity(self, sym_model, rng):
        """The symmetric construction is still a schema-exact SMPL model:
        torch-f64 oracle parity at the BASELINE bar."""
        import torch

        from tests.oracle_smpl_torch import SMPLOracle

        pose = rng.normal(scale=0.5, size=(2, 72)).astype(np.float32)
        betas = rng.normal(scale=1.0, size=(2, 10)).astype(np.float32)
        ours = smpl_forward(
            sym_model.as_dict(), jnp.asarray(pose), jnp.asarray(betas)
        )
        o64 = SMPLOracle(sym_model).double()(
            torch.from_numpy(pose), torch.from_numpy(betas)
        )
        gap = np.linalg.norm(
            np.asarray(ours.joints) - o64["joints"].numpy(), axis=-1
        ).mean()
        assert gap < 1e-3, gap


class TestGateFlipAug:
    def test_gates_off_on_asymmetric_template(self, smpl_model):
        from human_3d_reconstruction_tpu.train.trainer import (
            TrainConfig,
            gate_flip_aug,
        )

        msgs = []
        cfg = gate_flip_aug(
            TrainConfig(aug_flip=True), smpl_model.as_dict(), echo=msgs.append
        )
        assert cfg.aug_flip is False
        assert "DISABLED" in msgs[0]

    def test_keeps_on_for_symmetric_template(self, sym_model):
        from human_3d_reconstruction_tpu.train.trainer import (
            TrainConfig,
            gate_flip_aug,
        )

        cfg = gate_flip_aug(TrainConfig(aug_flip=True), sym_model.as_dict())
        assert cfg.aug_flip is True

    def test_noop_when_flip_already_off(self, smpl_model):
        from human_3d_reconstruction_tpu.train.trainer import (
            TrainConfig,
            gate_flip_aug,
        )

        cfg = gate_flip_aug(TrainConfig(aug_flip=False), smpl_model.as_dict())
        assert cfg.aug_flip is False
