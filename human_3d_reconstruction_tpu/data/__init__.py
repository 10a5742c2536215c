"""Data pipeline: host-side decode, on-device preprocessing, dataset adapters.

Reference parity (SURVEY.md section 2 "Dataset loaders", L3): per-source
dataset adapters (LSP / LSP-ext / MPII / COCO 2D-kp; MPI-INF-3DHP /
Human3.6M 3D + mosh params), person-box crop to 224x224, scale/rot/flip
augmentation, keypoint remap + visibility, normalize to [-1, 1].

TPU-native split: the reference does everything with cv2 on the host; here
only the image DECODE is host-side — crop/resize/rotate/flip/normalize run
on device as one jitted affine-sampling program (BASELINE north_star:
"on-device image preprocessing ... feeds a ResNet-style encoder").
"""

from human_3d_reconstruction_tpu.data.preprocess import (
    CROP_SIZE,
    affine_crop,
    normalize_image,
    preprocess_crops,
    transform_keypoints,
)

__all__ = [
    "CROP_SIZE",
    "affine_crop",
    "normalize_image",
    "preprocess_crops",
    "transform_keypoints",
]
