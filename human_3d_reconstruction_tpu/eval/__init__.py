"""Evaluation: MPJPE / PA-MPJPE metrics and the Human3.6M-style protocol."""

from human_3d_reconstruction_tpu.eval.metrics import (
    mpjpe,
    pa_mpjpe,
    procrustes_align,
    keypoint_2d_pck,
    pelvis_align,
    root_align,
)

__all__ = ["mpjpe", "pa_mpjpe", "procrustes_align", "keypoint_2d_pck", "root_align", "pelvis_align"]
