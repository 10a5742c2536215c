"""Metric unit tests vs hand-computed / analytically-known cases.

SURVEY.md section 4 item 4: MPJPE/PA-MPJPE (incl. Procrustes) against
hand-computed small cases.
"""

import numpy as np
import jax.numpy as jnp

from human_3d_reconstruction_tpu.eval import (
    keypoint_2d_pck,
    mpjpe,
    pa_mpjpe,
    procrustes_align,
    root_align,
)
from human_3d_reconstruction_tpu.utils.geometry import rodrigues

import pytest

pytestmark = pytest.mark.fast  # pre-commit lane: `pytest -m fast` (<5 min warm)


class TestMPJPE:
    def test_zero_for_identical(self, rng):
        x = rng.normal(size=(4, 14, 3)).astype(np.float32)
        assert float(mpjpe(jnp.asarray(x), jnp.asarray(x))) < 1e-7

    def test_hand_computed(self):
        gt = jnp.zeros((1, 2, 3))
        pred = jnp.asarray([[[0.0, 0, 0], [3.0, 4.0, 0]]])  # dists 0 and 5 after root-align
        # root_index=0: both get root-subtracted, pred becomes [0, (3,4,0)]
        assert np.isclose(float(mpjpe(pred, gt)), 2.5)

    def test_translation_invariance_via_root_align(self, rng):
        x = rng.normal(size=(2, 14, 3)).astype(np.float32)
        shifted = x + rng.normal(size=(2, 1, 3)).astype(np.float32)
        assert float(mpjpe(jnp.asarray(shifted), jnp.asarray(x))) < 1e-5

    def test_mask(self):
        gt = jnp.zeros((1, 3, 3))
        pred = jnp.asarray([[[0, 0, 0], [1.0, 0, 0], [100.0, 0, 0]]])
        mask = jnp.asarray([[1.0, 1.0, 0.0]])
        assert np.isclose(float(mpjpe(pred, gt, mask=mask, root_index=None)), 0.5)

    def test_root_align(self):
        x = jnp.asarray([[[1.0, 2, 3], [4, 5, 6]]])
        out = np.asarray(root_align(x))
        np.testing.assert_allclose(out[0, 0], 0.0)
        np.testing.assert_allclose(out[0, 1], [3, 3, 3])


class TestProcrustes:
    def test_recovers_similarity_transform(self, rng):
        """pred = noisy similarity transform of gt -> PA-MPJPE ~ 0."""
        gt = rng.normal(size=(5, 14, 3)).astype(np.float32)
        R = np.asarray(rodrigues(jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))))
        scale = rng.uniform(0.5, 2.0, size=(5, 1, 1)).astype(np.float32)
        t = rng.normal(size=(5, 1, 3)).astype(np.float32)
        pred = scale * np.einsum("bij,bkj->bki", R, gt) + t
        err = float(pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
        assert err < 1e-5, err

    def test_reflection_not_allowed(self, rng):
        """Mirror-image pred must NOT align perfectly (det(R)=+1 enforced)."""
        gt = rng.normal(size=(1, 14, 3)).astype(np.float32)
        pred = gt * np.asarray([-1.0, 1.0, 1.0])  # reflection
        aligned = np.asarray(procrustes_align(jnp.asarray(pred), jnp.asarray(gt)))
        # Aligned result must still be a rotation of pred: check the implied
        # transform has positive determinant by verifying chirality preserved.
        err = float(pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
        assert err > 1e-3  # generic point clouds can't be mirror-aligned by rotation

    def test_pa_leq_mpjpe(self, rng):
        pred = rng.normal(size=(8, 14, 3)).astype(np.float32)
        gt = rng.normal(size=(8, 14, 3)).astype(np.float32)
        pa = float(pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
        raw = float(mpjpe(jnp.asarray(pred), jnp.asarray(gt), root_index=None))
        assert pa <= raw + 1e-6

    def test_batched_equals_loop(self, rng):
        pred = rng.normal(size=(4, 14, 3)).astype(np.float32)
        gt = rng.normal(size=(4, 14, 3)).astype(np.float32)
        batched = np.asarray(procrustes_align(jnp.asarray(pred), jnp.asarray(gt)))
        for i in range(4):
            single = np.asarray(
                procrustes_align(jnp.asarray(pred[i : i + 1]), jnp.asarray(gt[i : i + 1]))
            )[0]
            np.testing.assert_allclose(batched[i], single, atol=1e-5)


class TestPCK:
    def test_hand_computed(self):
        gt = jnp.zeros((1, 2, 2))
        pred = jnp.asarray([[[0.01, 0.0], [0.2, 0.0]]])
        assert np.isclose(float(keypoint_2d_pck(pred, gt, threshold=0.05)), 0.5)

    def test_visibility_mask(self):
        gt = jnp.zeros((1, 2, 2))
        pred = jnp.asarray([[[0.01, 0.0], [0.2, 0.0]]])
        vis = jnp.asarray([[1.0, 0.0]])
        assert np.isclose(float(keypoint_2d_pck(pred, gt, vis=vis, threshold=0.05)), 1.0)


class Test3DHPProtocolMetrics:
    def test_pck3d_hand_case(self):
        from human_3d_reconstruction_tpu.eval.metrics import joint_errors_mm, pck3d

        # 2 samples x 2 joints (+root): errors 0/100/200/300 mm after
        # root alignment.
        gt = jnp.zeros((2, 3, 3))
        pred = jnp.zeros((2, 3, 3))
        pred = pred.at[0, 1, 0].set(0.100).at[0, 2, 0].set(0.200)
        pred = pred.at[1, 1, 0].set(0.300)
        errs = joint_errors_mm(pred, gt)
        np.testing.assert_allclose(
            np.asarray(errs), [[0, 100, 200], [0, 300, 0]], atol=1e-3
        )
        # threshold 150: correct = {0, 100, 0, 0} -> 4/6
        np.testing.assert_allclose(float(pck3d(errs, 150.0)), 4 / 6, atol=1e-6)

    def test_auc3d_monotone_and_bounds(self, rng):
        from human_3d_reconstruction_tpu.eval.metrics import auc3d

        small = jnp.asarray(rng.uniform(0, 50, (8, 14)).astype(np.float32))
        large = small + 120.0
        a_small = float(auc3d(small))
        a_large = float(auc3d(large))
        assert 0.0 <= a_large < a_small <= 1.0
        # official grid includes t=0 (strict <, contributes 0): perfect
        # reconstruction scores 30/31, matching mpii_compute_3d_pck
        np.testing.assert_allclose(
            float(auc3d(jnp.zeros((4, 14)))), 30 / 31, atol=1e-6
        )
        # hand-computed: constant 7.5mm error clears thresholds 10..150
        # (29 of 31 grid points)
        np.testing.assert_allclose(
            float(auc3d(jnp.full((2, 14), 7.5))), 29 / 31, atol=1e-6
        )

    def test_run_protocol_reports_3dhp_metrics(self, smpl_model):
        from human_3d_reconstruction_tpu.eval.protocol import (
            run_protocol,
            synthetic_eval_batches,
        )

        def perfect(images, centers, scales, batch=None):
            return jnp.asarray(self._gt)

        batches = list(synthetic_eval_batches(smpl_model, num_batches=1, batch_size=4))
        self._gt = batches[0].gt_joints3d
        report = run_protocol(perfect, iter(batches))
        assert report.pck3d_150 == 1.0
        np.testing.assert_allclose(report.auc3d, 30 / 31, atol=1e-6)
        assert "PCK3D@150mm" in report.table()
        assert "pck3d_150" in report.to_json()

    def test_pelvis_align(self, rng):
        """Protocol rooting is at the LSP-14 hip midpoint (indices 2/3) —
        after alignment the hips straddle the origin and a global offset
        vanishes; ankle (index 0) errors stay on the ankle (ADVICE r3)."""
        from human_3d_reconstruction_tpu.eval.metrics import (
            joint_errors_mm,
            pelvis_align,
        )

        j = jnp.asarray(rng.normal(size=(3, 14, 3)).astype(np.float32))
        a = pelvis_align(j)
        mid = (a[:, 2] + a[:, 3]) / 2
        np.testing.assert_allclose(np.asarray(mid), 0.0, atol=1e-6)
        # translation invariance
        shifted = pelvis_align(j + jnp.asarray([0.5, -0.2, 1.0]))
        np.testing.assert_allclose(np.asarray(shifted), np.asarray(a), atol=1e-5)
        # a pure ankle offset survives alignment only on the ankle
        pred = j.at[:, 0, 0].add(0.010)
        errs = joint_errors_mm(pelvis_align(pred), pelvis_align(j), root_index=None)
        np.testing.assert_allclose(np.asarray(errs[:, 0]), 10.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(errs[:, 1:]), 0.0, atol=1e-3)


class TestAccelError:
    """accel_error_mm — the video-HMR smoothness metric."""

    def test_constant_velocity_has_zero_accel(self):
        from human_3d_reconstruction_tpu.eval.metrics import accel_error_mm

        F, J = 8, 14
        v = np.random.default_rng(0).normal(0, 0.01, (1, J, 3)).astype(np.float32)
        seq = np.cumsum(np.tile(v, (F, 1, 1)), axis=0)  # linear motion
        assert float(accel_error_mm(jnp.asarray(seq), align_pelvis=False)) < 1e-3

    def test_known_second_difference(self):
        from human_3d_reconstruction_tpu.eval.metrics import accel_error_mm

        # One joint accelerating along x by exactly a per frame^2:
        # x_t = 0.5 * a * t^2 -> second difference = a everywhere.
        a = 0.004  # meters/frame^2
        t = np.arange(6, dtype=np.float32)
        seq = np.zeros((6, 2, 3), np.float32)
        seq[:, 0, 0] = 0.5 * a * t**2
        got = float(accel_error_mm(jnp.asarray(seq), align_pelvis=False))
        # mean over joints: joint 0 has ||a||, joint 1 zero.
        np.testing.assert_allclose(got, a * 1000.0 / 2.0, rtol=1e-4)

    def test_gt_relative_and_pelvis_alignment(self):
        from human_3d_reconstruction_tpu.eval.metrics import accel_error_mm

        rng = np.random.default_rng(1)
        seq = rng.normal(0, 0.05, (10, 14, 3)).astype(np.float32)
        # Identical sequences -> zero error regardless of jitter.
        assert float(accel_error_mm(seq, seq)) < 1e-5
        # A global (whole-body) jitter disappears under pelvis alignment
        # but registers without it.
        jitter = rng.normal(0, 0.02, (10, 1, 3)).astype(np.float32)
        assert float(accel_error_mm(seq + jitter, seq, align_pelvis=True)) < 1e-3
        assert float(accel_error_mm(seq + jitter, seq, align_pelvis=False)) > 1.0
