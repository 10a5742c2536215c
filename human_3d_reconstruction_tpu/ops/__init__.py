"""Pallas TPU kernels and their XLA twins.

Every kernel here has an equivalence test against the pure-XLA reference
implementation (SURVEY.md section 4 item 2) and runs in interpret mode on
CPU so the full suite works without a chip.
"""

from human_3d_reconstruction_tpu.ops.fused_resnet import (
    fused_bottleneck_stage,
    stage_blocks_from_params,
)
from human_3d_reconstruction_tpu.ops.fused_smpl import (
    prepare_fused_smpl,
    smpl_forward_fused,
)

__all__ = [
    "fused_bottleneck_stage",
    "prepare_fused_smpl",
    "smpl_forward_fused",
    "stage_blocks_from_params",
]
