"""Canonical keypoint conventions and per-dataset joint remappings.

Reference parity: the reference remaps every dataset's native keypoint
order onto a shared LSP-14 convention (+ cocoplus-19 for eval regressors)
with visibility flags, and mirrors keypoints on horizontal flip
(SURVEY.md section 2 "Dataset loaders": "keypoint remap + visibility",
`flip_kp`). Tables here are data, not code — adapters just index with them.
"""

from __future__ import annotations

import numpy as np

# Canonical 2D supervision order (LSP-14):
LSP_14 = (
    "r_ankle", "r_knee", "r_hip", "l_hip", "l_knee", "l_ankle",
    "r_wrist", "r_elbow", "r_shoulder", "l_shoulder", "l_elbow", "l_wrist",
    "neck", "head_top",
)
NUM_KP = len(LSP_14)

# Left/right mirror permutation for LSP-14 under horizontal flip.
LSP_FLIP_MAP = np.array([5, 4, 3, 2, 1, 0, 11, 10, 9, 8, 7, 6, 12, 13], dtype=np.int32)

# cocoplus-19 = LSP-14 + [nose, l_eye, r_eye, l_ear, r_ear] — the eval
# regressor convention (SURVEY.md "Eval harness": cocoplus regressor).
COCOPLUS_19 = LSP_14 + ("nose", "l_eye", "r_eye", "l_ear", "r_ear")
COCOPLUS_FLIP_MAP = np.concatenate(
    [LSP_FLIP_MAP, np.array([14, 16, 15, 18, 17], dtype=np.int32)]
)

# --- Native dataset orders -> LSP-14 gather indices (-1 = missing) ---------

# MPII 16-joint order: 0 r_ankle 1 r_knee 2 r_hip 3 l_hip 4 l_knee 5 l_ankle
# 6 pelvis 7 thorax 8 upper_neck 9 head_top 10 r_wrist 11 r_elbow
# 12 r_shoulder 13 l_shoulder 14 l_elbow 15 l_wrist
MPII_TO_LSP14 = np.array(
    [0, 1, 2, 3, 4, 5, 10, 11, 12, 13, 14, 15, 8, 9], dtype=np.int32
)

# COCO 17-keypoint order: 0 nose 1 l_eye 2 r_eye 3 l_ear 4 r_ear
# 5 l_shoulder 6 r_shoulder 7 l_elbow 8 r_elbow 9 l_wrist 10 r_wrist
# 11 l_hip 12 r_hip 13 l_knee 14 r_knee 15 l_ankle 16 r_ankle
# (no neck/head_top -> -1, visibility forced 0)
COCO_TO_LSP14 = np.array(
    [16, 14, 12, 11, 13, 15, 10, 8, 6, 5, 7, 9, -1, -1], dtype=np.int32
)

# LSP native order IS LSP-14.
LSP_TO_LSP14 = np.arange(14, dtype=np.int32)

# Human3.6M 17-joint (protocol order): 0 pelvis 1 r_hip 2 r_knee 3 r_ankle
# 4 l_hip 5 l_knee 6 l_ankle 7 spine 8 neck 9 head 10 head_top
# 11 l_shoulder 12 l_elbow 13 l_wrist 14 r_shoulder 15 r_elbow 16 r_wrist
H36M_TO_LSP14 = np.array(
    [3, 2, 1, 4, 5, 6, 16, 15, 14, 11, 12, 13, 8, 10], dtype=np.int32
)

# MPI-INF-3DHP 17-joint order mirrors H36M's protocol subset in its
# annot-17 form: 0 head_top 1 neck 2 r_shoulder 3 r_elbow 4 r_wrist
# 5 l_shoulder 6 l_elbow 7 l_wrist 8 r_hip 9 r_knee 10 r_ankle
# 11 l_hip 12 l_knee 13 l_ankle 14 pelvis 15 spine 16 head
MPI3DHP_TO_LSP14 = np.array(
    [10, 9, 8, 11, 12, 13, 4, 3, 2, 5, 6, 7, 1, 0], dtype=np.int32
)


def remap_keypoints(
    kp_native: np.ndarray, table: np.ndarray
) -> np.ndarray:
    """Gather native (Kn, 3) [x, y, vis] rows into LSP-14 (14, 3).

    Entries mapped from -1 get vis=0 (the reference's missing-joint
    convention, so losses mask them out).
    """
    out = np.zeros((len(table), 3), dtype=np.float32)
    valid = table >= 0
    out[valid] = kp_native[table[valid]]
    out[~valid, 2] = 0.0
    return out
