"""Serving session tests: bucketing transparency, output contracts."""

import numpy as np
import pytest

import jax

from human_3d_reconstruction_tpu.models.hmr import HMRConfig, HMRModel
from human_3d_reconstruction_tpu.serving import MeshRecoverySession


@pytest.fixture(scope="module")
def session(smpl_model):
    import jax.numpy as jnp

    model = HMRModel(config=HMRConfig())
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    return MeshRecoverySession(
        variables, smpl_model, crop_size=64, smpl_path="xla"
    )


@pytest.fixture(scope="module")
def frame():
    # Local generator: module-scoped, so it can't consume the
    # function-scoped `rng` fixture (and shouldn't share stream state).
    return (
        np.random.default_rng(23).uniform(0, 255, (120, 160, 3)).astype(np.float32)
    )


class TestServing:
    def test_single_person(self, session, frame):
        results = session.recover(frame, [[80.0, 60.0, 90.0]])
        assert len(results) == 1
        r = results[0]
        assert r.theta.shape == (72,)
        assert r.verts.shape == (6890, 3)
        assert r.joints3d.shape == (24, 3)
        assert np.all(np.isfinite(r.verts))

    def test_multi_person_bucketed(self, session, frame):
        boxes = [[40.0, 30.0, 50.0], [80.0, 60.0, 70.0], [120.0, 90.0, 60.0]]
        results = session.recover(frame, boxes)  # N=3 -> bucket 4 internally
        assert len(results) == 3
        np.testing.assert_array_equal(results[2].box, boxes[2])

    def test_padding_does_not_change_results(self, session, frame):
        """Same person alone (bucket 1) vs in a padded bucket: same mesh."""
        box = [80.0, 60.0, 90.0]
        solo = session.recover(frame, [box])[0]
        trio = session.recover(frame, [box, [40.0, 30.0, 50.0], [100.0, 80.0, 60.0]])[0]
        np.testing.assert_allclose(solo.verts, trio.verts, atol=1e-5)

    def test_crowd_beyond_largest_bucket_chunks(self, smpl_model, frame, rng):
        """N past the largest bucket is served by chunked batches, not capped."""
        import jax.numpy as jnp

        model = HMRModel(config=HMRConfig())
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        small = MeshRecoverySession(
            variables, smpl_model, crop_size=64, smpl_path="xla", buckets=(1, 2)
        )
        boxes = rng.uniform(40, 80, (5, 3)).astype(np.float32)
        results = small.recover(frame, boxes)
        assert len(results) == 5
        solo = small.recover(frame, boxes[:1])[0]
        np.testing.assert_allclose(solo.verts, results[0].verts, atol=1e-5)

    def test_uint8_frames_match_f32(self, session, frame):
        """uint8 frames (4x less H2D) decode identically — the cast to the
        compute dtype happens on device with integer-exact values."""
        u8 = frame.astype(np.uint8)
        a = session.recover(u8, [[80.0, 60.0, 90.0]])[0]
        b = session.recover(u8.astype(np.float32), [[80.0, 60.0, 90.0]])[0]
        np.testing.assert_allclose(a.verts, b.verts, atol=1e-6)
        c = session.recover_clip([u8], [[[80.0, 60.0, 90.0]]])[0][0]
        np.testing.assert_allclose(c.verts, b.verts, atol=2e-5)

    def test_vit_encoder_session(self, smpl_model, frame):
        """A BN-free ViT config serves through the default optimize=True path
        (the resnet-only graph rewrite is skipped, not an error)."""
        import jax.numpy as jnp

        cfg = HMRConfig(encoder="vit_ti16", hidden_size=64)
        model = HMRModel(config=cfg)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        vit_session = MeshRecoverySession(
            variables, smpl_model, hmr_config=cfg, crop_size=32,
            smpl_path="xla", buckets=(1, 2)
        )
        results = vit_session.recover(frame, [[80.0, 60.0, 90.0]])
        assert len(results) == 1
        assert results[0].verts.shape == (6890, 3)
        assert np.all(np.isfinite(results[0].verts))

    def test_hybrid_refinement_fits_observations(self, session, frame):
        """recover(kp2d=, refine_steps=N): the SMPLify scan inside the
        serving program pulls the projected keypoints toward the observed
        ones (a detector stand-in: the session's own prediction shifted by
        a constant offset, which the free camera translation can absorb)."""
        from human_3d_reconstruction_tpu.data.skeleton import NUM_KP

        box = np.asarray([80.0, 60.0, 90.0], np.float32)
        base = session.recover(frame, [box])[0]
        target_crop = base.joints2d[:NUM_KP] + np.asarray([0.08, -0.05], np.float32)
        kp_frame = box[:2] + target_crop * (box[2] / 2.0)  # invert transform_keypoints

        refined = session.recover(
            frame, [box], kp2d=kp_frame[None], refine_steps=25
        )[0]
        err_base = np.abs(base.joints2d[:NUM_KP] - target_crop).mean()
        err_refined = np.abs(refined.joints2d[:NUM_KP] - target_crop).mean()
        assert np.isfinite(refined.verts).all()
        assert err_refined < 0.25 * err_base

    def test_refinement_requires_kp2d_and_validates_shape(self, session, frame):
        with pytest.raises(ValueError, match="needs kp2d"):
            session.recover(frame, [[80.0, 60.0, 90.0]], refine_steps=5)
        with pytest.raises(ValueError, match="matching boxes"):
            session.recover(
                frame, [[80.0, 60.0, 90.0]],
                kp2d=np.zeros((2, 14, 2), np.float32), refine_steps=5,
            )

    def test_refinement_bucketed_padding_harmless(self, session, frame):
        """One person alone vs padded into a 3-person bucket: same refined
        mesh (padding replicates person 0; programs are bucket-shaped)."""
        from human_3d_reconstruction_tpu.data.skeleton import NUM_KP

        boxes = np.asarray(
            [[80.0, 60.0, 90.0], [40.0, 30.0, 50.0], [120.0, 90.0, 60.0]],
            np.float32,
        )
        base = session.recover(frame, boxes)
        # A clear offset target: the L1 keypoint term's subgradient is a
        # sign — fitting a target at ~zero error would chase the sign of
        # float noise and diverge between bucket shapes by construction.
        kp_frame = np.stack(
            [
                b.box[:2]
                + (b.joints2d[:NUM_KP] + np.asarray([0.15, 0.1], np.float32))
                * (b.box[2] / 2.0)
                for b in base
            ]
        )
        solo = session.recover(
            frame, boxes[:1], kp2d=kp_frame[:1], refine_steps=8
        )[0]
        trio = session.recover(frame, boxes, kp2d=kp_frame, refine_steps=8)[0]
        np.testing.assert_allclose(solo.verts, trio.verts, atol=1e-4)

    def test_fields_selection_skips_transfer(self, session, frame):
        """fields=(...) fetches only those outputs (verts stays on device)."""
        slim = session.recover(frame, [[80.0, 60.0, 90.0]],
                               fields=("theta", "beta", "cam"))[0]
        assert slim.verts is None and slim.joints2d is None
        full = session.recover(frame, [[80.0, 60.0, 90.0]])[0]
        np.testing.assert_allclose(slim.theta, full.theta, atol=1e-6)
        clip = session.recover_clip([frame], [[[80.0, 60.0, 90.0]]],
                                    fields=("theta",))[0][0]
        assert clip.verts is None
        np.testing.assert_allclose(clip.theta, full.theta, atol=2e-5)

    def test_recover_clip_chunks_crowds(self, smpl_model, frame, rng):
        """Clip mode with a frame exceeding the largest person bucket chunks
        the person axis (stays clip-batched) instead of raising."""
        import jax.numpy as jnp

        model = HMRModel(config=HMRConfig())
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        small = MeshRecoverySession(
            variables, smpl_model, crop_size=64, smpl_path="xla", buckets=(1, 2)
        )
        boxes0 = rng.uniform(40, 80, (5, 3)).astype(np.float32)  # > bucket 2
        boxes1 = rng.uniform(40, 80, (1, 3)).astype(np.float32)
        clip = small.recover_clip([frame, frame], [boxes0, boxes1])
        assert [len(r) for r in clip] == [5, 1]
        ref = small.recover(frame, boxes0)
        for r, c in zip(ref, clip[0]):
            np.testing.assert_allclose(r.verts, c.verts, atol=2e-5)

    def test_batch_api(self, session, frame, rng):
        frame2 = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
        out = session.recover_batch(
            [frame, frame2], [[[80.0, 60.0, 90.0]], [[70.0, 50.0, 80.0]]]
        )
        assert len(out) == 2 and len(out[0]) == 1

    def test_recover_clip_matches_per_frame(self, session, frame, rng):
        """Clip-batched program == per-frame recovery, incl. ragged counts."""
        frame2 = rng.uniform(0, 255, frame.shape).astype(np.float32)
        frame3 = rng.uniform(0, 255, frame.shape).astype(np.float32)
        frames = [frame, frame2, frame3]
        boxes = [
            [[80.0, 60.0, 90.0]],
            [[40.0, 30.0, 50.0], [120.0, 90.0, 60.0]],
            [],  # empty frame: no detections
        ]
        per_frame = [
            session.recover(f, b) if len(b) else [] for f, b in zip(frames, boxes)
        ]
        clip = session.recover_clip(frames, boxes)
        assert [len(r) for r in clip] == [1, 2, 0]
        for ref_people, clip_people in zip(per_frame, clip):
            for r, c in zip(ref_people, clip_people):
                np.testing.assert_allclose(r.verts, c.verts, atol=2e-5)
                np.testing.assert_allclose(r.theta, c.theta, atol=2e-5)
                np.testing.assert_allclose(r.joints2d, c.joints2d, atol=2e-5)

    def test_recover_clip_chunks_long_clips(self, session, frame):
        """More frames than the largest clip bucket -> chunked, all served."""
        frames = [frame] * (session.clip_buckets[-1] + 3)
        boxes = [[[80.0, 60.0, 90.0]]] * len(frames)
        out = session.recover_clip(frames, boxes)
        assert len(out) == len(frames)
        np.testing.assert_allclose(out[0][0].verts, out[-1][0].verts, atol=1e-6)

    def test_overlay(self, session, frame):
        results = session.recover(frame, [[80.0, 60.0, 90.0]])
        img = session.overlay(frame, results)
        assert img.shape == frame.shape
        assert not np.allclose(img, frame)  # something was drawn


class TestShardedServing:
    def test_mesh_session_matches_single_device(self, smpl_model, frame):
        """DP serving over the 8-device mesh == unsharded results."""
        import jax.numpy as jnp

        from human_3d_reconstruction_tpu.parallel import make_mesh

        model = HMRModel(config=HMRConfig())
        variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
        plain = MeshRecoverySession(
            variables, smpl_model, crop_size=64, smpl_path="xla"
        )
        sharded = MeshRecoverySession(
            variables, smpl_model, crop_size=64, smpl_path="xla",
            mesh=make_mesh(),
        )
        # buckets snapped to multiples of the device count
        assert all(b % 8 == 0 for b in sharded.buckets)

        boxes = [[40.0, 30.0, 50.0], [80.0, 60.0, 70.0], [120.0, 90.0, 60.0]]
        ref = plain.recover(frame, boxes)
        out = sharded.recover(frame, boxes)
        assert len(out) == 3
        for r, o in zip(ref, out):
            np.testing.assert_allclose(r.verts, o.verts, atol=2e-4)
            np.testing.assert_allclose(r.theta, o.theta, atol=2e-4)


class TestExportedArtifact:
    def test_export_reload_matches_live_session(self, session, frame, tmp_path):
        """jax.export round trip: artifact outputs == live session outputs."""
        from human_3d_reconstruction_tpu.serving_export import (
            ExportedRecoverySession,
            export_recovery_artifact,
        )

        art = export_recovery_artifact(
            session, tmp_path / "art", frame_shape=frame.shape[:2], buckets=(4,)
        )
        srv = ExportedRecoverySession(art)
        assert srv.crop_size == session.crop_size
        assert srv.faces.shape == session.faces.shape

        boxes = [[40.0, 30.0, 50.0], [80.0, 60.0, 70.0], [120.0, 90.0, 60.0]]
        live = session.recover(frame, boxes)
        loaded = srv.recover(frame, boxes)
        assert len(loaded) == 3
        for r, o in zip(live, loaded):
            np.testing.assert_allclose(r.verts, o["verts"], atol=1e-5)
            np.testing.assert_allclose(r.theta, o["theta"], atol=1e-5)
            np.testing.assert_allclose(r.joints2d, o["joints2d"], atol=1e-5)

    def test_frame_shape_guard(self, session, frame, tmp_path):
        from human_3d_reconstruction_tpu.serving_export import (
            ExportedRecoverySession,
            export_recovery_artifact,
        )

        art = export_recovery_artifact(
            session, tmp_path / "art2", frame_shape=frame.shape[:2], buckets=(4,)
        )
        srv = ExportedRecoverySession(art)
        bad = np.zeros((64, 64, 3), np.float32)
        with pytest.raises(ValueError, match="frame shape"):
            srv.recover(bad, [[32.0, 32.0, 40.0]])


class TestInputValidation:
    def test_empty_boxes_returns_empty(self, session, frame):
        """Detector found nobody: no device program, no shape error."""
        assert session.recover(frame, np.zeros((0, 3), np.float32)) == []
        assert session.recover(frame, []) == []

    def test_malformed_boxes_raise(self, session, frame):
        with pytest.raises(ValueError, match=r"\(N, 3\)"):
            session.recover(frame, [[1.0, 2.0]])
        # one nesting level too deep: shape (1, 2, 3) has a valid last axis
        # but is not a box list — must raise, not mis-crop
        with pytest.raises(ValueError, match=r"\(N, 3\)"):
            session.recover(frame, [[[40.0, 30.0, 50.0], [80.0, 60.0, 70.0]]])

    def test_checkpoint_step_requires_checkpoint(self):
        from human_3d_reconstruction_tpu.cli.common import (
            restore_checkpoint_variables,
        )

        with pytest.raises(SystemExit, match="--checkpoint"):
            restore_checkpoint_variables({"checkpoint_step": "5"}, {"params": {}})
        # no checkpoint flags at all: passthrough
        v = {"params": {}}
        assert restore_checkpoint_variables({}, v) is v


class TestKeypointDetectionFields:
    """kp_head models surface their heatmap detections through `fields`."""

    @pytest.fixture(scope="class")
    def kp_session(self, smpl_model):
        import jax.numpy as jnp

        cfg = HMRConfig(encoder="resnet18", hidden_size=64, kp_head=True)
        model = HMRModel(config=cfg)
        variables = model.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
        return MeshRecoverySession(
            variables, smpl_model, hmr_config=cfg, crop_size=64, smpl_path="xla"
        )

    def test_detections_fetchable(self, kp_session, frame):
        res = kp_session.recover(
            frame, [[80.0, 60.0, 90.0], [40.0, 60.0, 70.0]],
            fields=("theta", "kp2d_det", "kp_conf"),
        )
        assert len(res) == 2
        for r in res:
            assert r.kp2d_det.shape == (14, 2)
            assert r.kp_conf.shape == (14,)
            assert np.isfinite(r.kp2d_det).all()
            assert (r.kp2d_det >= -1.0).all() and (r.kp2d_det <= 1.0).all()
            assert (r.kp_conf >= 0.0).all() and (r.kp_conf <= 1.0).all()
            # unrequested fields stay None (transfer-size contract)
            assert r.verts is None

    def test_headless_model_raises_clearly(self, session, frame):
        with pytest.raises(ValueError, match="kp_head"):
            session.recover(frame, [[80.0, 60.0, 90.0]], fields=("kp2d_det",))
