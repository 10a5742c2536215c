"""Box propagation for video streams: keep person crops locked on target.

The HMR family takes person boxes from ground truth or an external detector
(SURVEY.md section 2 "Multi-person demo"). For video, running a detector per
frame is unnecessary: the previous frame's recovered mesh already says where
the person is. `propagate_box` re-centers the crop box on the projected 2D
keypoints of the last recovery, which keeps each person's slot (track id =
box index) stable across frames with zero extra model cost.

Host-side numpy; the per-frame cost is a handful of scalar ops.
"""

from __future__ import annotations

import numpy as np


def box_from_keypoints(
    kp_px: np.ndarray,
    margin: float = 2.0,
    min_scale: float = 32.0,
) -> np.ndarray:
    """Tight person box [cx, cy, scale] around projected keypoints (K, 2).

    `margin` scales the keypoint extent up to a crop that contains the whole
    body (keypoints sit well inside the silhouette; HMR-family crops use
    ~1.5-2.2x the skeleton extent).
    """
    kp = np.asarray(kp_px, np.float32)
    lo = kp.min(axis=0)
    hi = kp.max(axis=0)
    center = (lo + hi) / 2.0
    scale = max(float((hi - lo).max()) * margin, min_scale)
    return np.asarray([center[0], center[1], scale], np.float32)


def propagate_box(
    prev_box: np.ndarray,
    kp_px: np.ndarray,
    frame_hw: tuple[int, int],
    margin: float = 2.0,
    blend: float = 0.5,
) -> np.ndarray:
    """Next-frame crop box from the previous recovery's 2D keypoints.

    The new center follows the keypoints; the scale is blended between the
    previous box and the keypoint-extent estimate (`blend` toward the new
    estimate) so crop size doesn't oscillate frame to frame. The center is
    clamped inside the frame so a person walking out of view degrades to an
    edge crop instead of an empty one.
    """
    prev = np.asarray(prev_box, np.float32)
    est = box_from_keypoints(kp_px, margin=margin, min_scale=prev[2] * 0.25)
    H, W = frame_hw
    cx = float(np.clip(est[0], 0.0, W - 1.0))
    cy = float(np.clip(est[1], 0.0, H - 1.0))
    scale = float((1.0 - blend) * prev[2] + blend * est[2])
    return np.asarray([cx, cy, scale], np.float32)
