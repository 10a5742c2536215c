"""utils/tracking.py: box propagation from projected keypoints."""

import numpy as np

from human_3d_reconstruction_tpu.utils.tracking import (
    box_from_keypoints,
    propagate_box,
)


class TestBoxFromKeypoints:
    def test_center_and_extent(self):
        kp = np.asarray([[10.0, 20.0], [30.0, 60.0]], np.float32)
        box = box_from_keypoints(kp, margin=2.0)
        assert np.allclose(box[:2], [20.0, 40.0])
        assert box[2] == 80.0  # max extent 40 * margin 2

    def test_min_scale_floor(self):
        kp = np.zeros((5, 2), np.float32)  # degenerate: all same point
        box = box_from_keypoints(kp, margin=2.0, min_scale=50.0)
        assert box[2] == 50.0


class TestPropagateBox:
    def test_follows_keypoints(self):
        prev = np.asarray([100.0, 100.0, 80.0], np.float32)
        kp = np.asarray([[150.0, 150.0], [170.0, 190.0]], np.float32)
        box = propagate_box(prev, kp, frame_hw=(480, 640), blend=1.0)
        assert np.allclose(box[:2], [160.0, 170.0])

    def test_scale_blending(self):
        prev = np.asarray([100.0, 100.0, 100.0], np.float32)
        kp = np.asarray([[80.0, 80.0], [120.0, 120.0]], np.float32)  # extent 40
        box = propagate_box(prev, kp, frame_hw=(480, 640), margin=2.0, blend=0.5)
        assert np.isclose(box[2], 0.5 * 100.0 + 0.5 * 80.0)

    def test_center_clamped_to_frame(self):
        prev = np.asarray([630.0, 100.0, 80.0], np.float32)
        kp = np.asarray([[700.0, -50.0], [720.0, -20.0]], np.float32)
        box = propagate_box(prev, kp, frame_hw=(480, 640))
        assert 0 <= box[0] <= 639 and 0 <= box[1] <= 479
