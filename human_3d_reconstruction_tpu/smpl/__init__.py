"""Differentiable SMPL body model, TPU-native.

The SMPL forward map (theta[72], beta[10]) -> (verts[6890,3], joints[24,3])
is implemented as a pure function over a parameter pytree so it is freely
`jit`-, `vmap`- and `grad`-able, with two interchangeable compute paths:

- ``forward.smpl_forward``        : pure jax.numpy/lax (the reference twin)
- ``ops.fused_smpl.smpl_forward_fused``: Pallas-fused blendshapes + LBS kernels

Reference parity: the reference's SMPL layer is a torch port of SMPL
(Loper et al. 2015); see SURVEY.md section 2 "SMPL layer" for the required
sub-steps (a)-(g), all present here.
"""

from human_3d_reconstruction_tpu.smpl.model_file import (
    SMPLModel,
    load_smpl_model,
    synthetic_smpl_model,
    NUM_VERTS,
    NUM_JOINTS,
    NUM_BETAS,
    NUM_POSE_DIRS,
    NUM_FACES,
    SMPL_PARENTS,
)
from human_3d_reconstruction_tpu.smpl.forward import (
    smpl_forward,
    SMPLOutput,
)
from human_3d_reconstruction_tpu.smpl.pose_prior import (
    PosePrior,
    fit_pose_prior,
    load_pose_prior,
    pose_nll,
    save_pose_prior,
)

__all__ = [
    "SMPLModel",
    "load_smpl_model",
    "synthetic_smpl_model",
    "smpl_forward",
    "SMPLOutput",
    "PosePrior",
    "fit_pose_prior",
    "pose_nll",
    "save_pose_prior",
    "load_pose_prior",
    "NUM_VERTS",
    "NUM_JOINTS",
    "NUM_BETAS",
    "NUM_POSE_DIRS",
    "NUM_FACES",
    "SMPL_PARENTS",
]
