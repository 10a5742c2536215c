"""On-device person proposal (utils/person_proposal.py; VERDICT r3 #3).

Validated against frames the repo can render itself: shaded SMPL bodies
(viz/body_render.py) composited at known box positions — the proposer must
recover a box near each body — plus the fallback contract on frames with
nothing salient.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from human_3d_reconstruction_tpu.utils.person_proposal import (
    propose_person_boxes,
    propose_person_boxes_np,
)

pytestmark = pytest.mark.fast  # pre-commit lane: `pytest -m fast` (<5 min warm)


def _body_frame(centers_scales, frame_hw=(192, 256), seed=0):
    """Render one frame with bodies at the given [(cx, cy, scale)] boxes
    over a near-uniform background (composited from per-body renders)."""
    import jax

    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model
    from human_3d_reconstruction_tpu.smpl.forward import smpl_forward
    from human_3d_reconstruction_tpu.viz.body_render import (
        body_vertex_colors,
        local_surface_faces,
        make_frame_renderer,
    )

    model = synthetic_smpl_model(seed=0)
    v = np.asarray(model.as_dict()["v_template"])
    render = make_frame_renderer(
        local_surface_faces(v), body_vertex_colors(v), frame_hw, chunk_frames=2
    )
    params = {k: jnp.asarray(a) for k, a in model.as_dict().items()}
    rng = np.random.default_rng(seed)
    n = len(centers_scales)
    thetas = rng.normal(scale=0.3, size=(n, 72)).astype(np.float32)
    betas = rng.normal(scale=0.8, size=(n, 10)).astype(np.float32)
    out = jax.jit(lambda p, b: smpl_forward(params, p, b))(thetas, betas)
    mu = np.asarray(out.eval_joints[:, :14]).mean(axis=1, keepdims=True)
    verts_c = np.asarray(out.verts) - mu
    centers = np.asarray([[c[0], c[1]] for c in centers_scales], np.float32)
    scales = np.asarray([c[2] for c in centers_scales], np.float32)
    keys = np.full((n,), 7, np.uint32)  # same key -> same background
    frames = render(verts_c, centers, scales, keys)
    # Composite: body pixels differ from the shared background; overlay
    # each body's pixels onto frame 0.
    base = frames[0].copy()
    for i in range(1, n):
        solo_bg = render(
            verts_c[i : i + 1] + np.asarray([10.0, 0, 0], np.float32),
            centers[i : i + 1], scales[i : i + 1], keys[i : i + 1],
        )[0]
        mask = (frames[i] != solo_bg).any(axis=-1)
        base[mask] = frames[i][mask]
    return base


class TestProposal:
    def test_finds_two_bodies(self):
        truth = [(64.0, 96.0, 90.0), (192.0, 96.0, 90.0)]
        frame = _body_frame(truth)
        boxes = propose_person_boxes_np(frame, max_people=4)
        assert 1 <= len(boxes) <= 4
        # every true body has a proposal within half its scale
        for cx, cy, s in truth:
            d = np.linalg.norm(boxes[:, :2] - [cx, cy], axis=1)
            assert d.min() < 0.5 * s, (boxes, (cx, cy, s))
        # proposal scales are body-sized, not frame-sized
        assert (boxes[:, 2] > 25).all() and (boxes[:, 2] < 240).all(), boxes

    def test_uniform_frame_yields_fallback(self):
        frame = np.full((96, 128, 3), 127, np.uint8)
        boxes = propose_person_boxes_np(frame)
        # nothing salient -> exactly the one full-frame fallback box
        assert boxes.shape == (1, 3)
        np.testing.assert_allclose(boxes[0], [64.0, 48.0, 0.9 * 96], rtol=1e-5)

    def test_static_shapes_and_count(self):
        frame = _body_frame([(96.0, 96.0, 100.0)])
        boxes, n = propose_person_boxes(jnp.asarray(frame[:192, :256]), max_people=6)
        assert boxes.shape == (6, 3)
        assert 1 <= int(n) <= 6
        # slots beyond n hold the (finite) fallback box
        assert np.isfinite(np.asarray(boxes)).all()

    def test_noise_frame_does_not_crash(self):
        frame = np.random.default_rng(0).uniform(0, 255, (96, 128, 3)).astype(np.float32)
        boxes = propose_person_boxes_np(frame)
        assert len(boxes) >= 1 and np.isfinite(boxes).all()


def _two_blob_frame(gap_px=0, blob=48, H=160, W=256):
    """Two touching textured squares -> ONE connected component, twice as
    wide as tall: the deterministic stand-in for an adjacent-person merge."""
    rng = np.random.default_rng(3)
    frame = np.full((H, W, 3), 128, np.float32)
    y0 = H // 2 - blob // 2
    x0 = W // 2 - blob - gap_px // 2
    for x in (x0, x0 + blob + gap_px):
        frame[y0 : y0 + blob, x : x + blob] = rng.uniform(
            0, 255, (blob, blob, 3)
        )
    centers = np.asarray(
        [[x0 + blob / 2, H / 2], [x0 + blob + gap_px + blob / 2, H / 2]]
    )
    return frame.astype(np.uint8), centers


class TestMergeSplit:
    def test_merged_component_splits_into_two(self):
        frame, truth = _two_blob_frame()
        plain = propose_person_boxes_np(frame, max_people=4)
        split = propose_person_boxes_np(frame, max_people=4, split_merged=True)
        # Without splitting the touching blobs form one wide box.
        assert len(plain) == 1
        assert len(split) == 2
        # Each blob center gets a nearby split box (within half a blob).
        for c in truth:
            d = np.linalg.norm(split[:, :2] - c, axis=1)
            assert d.min() < 24.0, (split, c)
        # Split boxes are blob-sized, not double-wide.
        assert (split[:, 2] < plain[0, 2]).all()

    def test_tall_single_component_not_split(self):
        """A standing person is TALL (sd_y ~ 3x sd_x): the split rule is
        horizontal-only exactly so singles don't get shredded vertically."""
        rng = np.random.default_rng(5)
        frame = np.full((224, 256, 3), 128, np.float32)
        frame[40:184, 112:160] = rng.uniform(0, 255, (144, 48, 3))  # 3:1 tall
        frame = frame.astype(np.uint8)
        split = propose_person_boxes_np(frame, max_people=4, split_merged=True)
        assert len(split) == 1, split

    def test_single_compact_component_not_split(self):
        """An isotropic single blob must survive split_merged unsplit —
        the precision-1.0 property the characterization measured."""
        rng = np.random.default_rng(4)
        frame = np.full((160, 256, 3), 128, np.float32)
        frame[56:104, 104:152] = rng.uniform(0, 255, (48, 48, 3))
        frame = frame.astype(np.uint8)
        plain = propose_person_boxes_np(frame, max_people=4)
        split = propose_person_boxes_np(frame, max_people=4, split_merged=True)
        assert len(plain) == len(split) == 1
        np.testing.assert_allclose(split[0], plain[0], rtol=1e-5)
