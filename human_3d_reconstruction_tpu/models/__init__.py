"""Network components: encoder, iterative regressor, adversarial prior.

Reference parity (SURVEY.md section 2): ResNet-50 encoder -> 2048-d feature
-> 3-iteration IEF regressor -> (theta 72, beta 10, cam 3); discriminator
over (theta, beta) for adversarial training.
"""

from human_3d_reconstruction_tpu.models.resnet import ResNet50, ResNetConfig
from human_3d_reconstruction_tpu.models.regressor import IEFRegressor, NUM_SMPL_PARAMS
from human_3d_reconstruction_tpu.models.hmr import (
    HMRModel,
    HMRConfig,
    HMROutput,
    optimize_for_serving,
)
from human_3d_reconstruction_tpu.models.discriminator import SMPLDiscriminator
from human_3d_reconstruction_tpu.models.keypoint_head import (
    KeypointHead,
    gaussian_heatmap_targets,
    heatmap_loss,
    soft_argmax,
    soft_argmax_windowed,
)
from human_3d_reconstruction_tpu.models.vit import ViTConfig, ViTEncoder, VIT_VARIANTS

__all__ = [
    "ResNet50",
    "ResNetConfig",
    "ViTConfig",
    "ViTEncoder",
    "VIT_VARIANTS",
    "IEFRegressor",
    "NUM_SMPL_PARAMS",
    "HMRModel",
    "HMRConfig",
    "HMROutput",
    "SMPLDiscriminator",
    "KeypointHead",
    "gaussian_heatmap_targets",
    "heatmap_loss",
    "soft_argmax",
    "soft_argmax_windowed",
    "optimize_for_serving",
]
