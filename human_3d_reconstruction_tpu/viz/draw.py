"""2D keypoint / skeleton drawing for demo overlays (host-side, numpy).

Reference parity: HMR-family demos draw the projected 2D joints and the
skeleton over the frame alongside the mesh overlay.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

# LSP-14 skeleton edges (index pairs into data.skeleton.LSP_14).
LSP_SKELETON = (
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5),      # legs via hips
    (2, 8), (3, 9),                              # hips -> shoulders
    (6, 7), (7, 8), (9, 10), (10, 11),           # arms
    (8, 12), (9, 12), (12, 13),                  # shoulders -> neck -> head
)


def _disk(image: np.ndarray, cx: float, cy: float, radius: int, color) -> None:
    H, W = image.shape[:2]
    x0, x1 = max(0, int(cx - radius)), min(W - 1, int(cx + radius))
    y0, y1 = max(0, int(cy - radius)), min(H - 1, int(cy + radius))
    if x0 > x1 or y0 > y1:
        return
    ys, xs = np.mgrid[y0 : y1 + 1, x0 : x1 + 1]
    mask = (xs - cx) ** 2 + (ys - cy) ** 2 <= radius**2
    image[y0 : y1 + 1, x0 : x1 + 1][mask] = color


def _line(image: np.ndarray, p0, p1, thickness: int, color) -> None:
    length = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) * 2
    ts = np.linspace(0.0, 1.0, length)
    for t in ts:
        _disk(image, p0[0] + t * (p1[0] - p0[0]), p0[1] + t * (p1[1] - p0[1]),
              thickness, color)


def draw_keypoints(
    image: np.ndarray,
    kp_px: np.ndarray,
    vis: Optional[np.ndarray] = None,
    skeleton: Sequence[tuple] = LSP_SKELETON,
    color=(255.0, 80.0, 80.0),
    bone_color=(80.0, 220.0, 120.0),
    radius: int = 3,
) -> np.ndarray:
    """Draw keypoints (K, 2) in pixel coords (+skeleton) onto a copy."""
    out = np.asarray(image, np.float32).copy()
    kp_px = np.asarray(kp_px, np.float32)
    K = len(kp_px)
    v = np.ones(K) if vis is None else np.asarray(vis)
    for a, b in skeleton:
        if a < K and b < K and v[a] > 0 and v[b] > 0:
            _line(out, kp_px[a], kp_px[b], max(1, radius - 2), np.asarray(bone_color))
    for k in range(K):
        if v[k] > 0:
            _disk(out, kp_px[k, 0], kp_px[k, 1], radius, np.asarray(color))
    return out


def crop_coords_to_pixels(
    kp_crop: np.ndarray, center: np.ndarray, scale: float
) -> np.ndarray:
    """Normalized crop coords [-1, 1] -> full-frame pixels (inverse of
    data.preprocess.transform_keypoints for the unrotated case)."""
    return np.asarray(center, np.float32) + np.asarray(kp_crop, np.float32) * (
        float(scale) / 2.0
    )
