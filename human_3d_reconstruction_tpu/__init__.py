"""TPU-native single-image 3D human mesh recovery (HMR-family) framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
repo Aaron20127/human-3d-reconstruction (an HMR-style PyTorch codebase; see
SURVEY.md — the reference mount was empty, so parity targets come from
BASELINE.json's north-star description and the HMR/SMPL literature).

Public API (BASELINE north_star: "image in, SMPL theta/beta + mesh +
2D/3D joints out"):

    from human_3d_reconstruction_tpu import api
    out = api.recover_mesh(params, images)   # -> MeshRecoveryOutput

Subpackages
-----------
smpl      : differentiable SMPL body model (pure-JAX + Pallas-fused paths)
ops       : Pallas TPU kernels and their XLA twins
models    : Flax ResNet-50 encoder, IEF regressor, adversarial prior
data      : dataset adapters + on-device preprocessing
train     : alternating adversarial trainer, optax/orbax
eval      : MPJPE / PA-MPJPE, Human3.6M protocol
parallel  : jax.sharding mesh helpers, DP/batch sharding
viz       : mesh overlay rendering (C++ z-buffer rasterizer + numpy fallback)
utils     : geometry, image, logging helpers
cli       : demo / train / eval / bench entry points (the 5 BASELINE configs)
"""

__version__ = "0.1.0"
