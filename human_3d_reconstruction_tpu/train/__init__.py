"""Training: losses, alternating adversarial trainer, checkpointing."""

from human_3d_reconstruction_tpu.train.losses import (
    LossWeights,
    keypoint_2d_loss,
    joints_3d_loss,
    smpl_param_loss,
    adversarial_g_loss,
    adversarial_d_loss,
)

__all__ = [
    "LossWeights",
    "keypoint_2d_loss",
    "joints_3d_loss",
    "smpl_param_loss",
    "adversarial_g_loss",
    "adversarial_d_loss",
]
