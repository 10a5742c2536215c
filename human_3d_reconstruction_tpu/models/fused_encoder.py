"""Serving-path HMR forward with Pallas-fused ResNet stages 1-2.

The flax `HMRModel` stays the source of truth for parameters and the
training path. This module provides an alternative *execution schedule* for
the same weights at serving time: stages 1-2 (HBM-bandwidth-bound in XLA,
see ops/fused_resnet.py) run as whole-stage-per-image Pallas kernels; the
stem, maxpool, and the MXU-bound stages 3-4 stay in XLA; the IEF regressor
is applied through its own flax module (identical params subtree).

Requirements: resnet50/101 encoder, serving rewrite applied (s2d stem +
folded BN — models/hmr.py::optimize_for_serving). Equivalence vs the flax
forward is pinned in tests/test_fused_resnet.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.models.hmr import (
    _RESNET_VARIANTS,
    HMRConfig,
    HMROutput,
)
from human_3d_reconstruction_tpu.models.regressor import IEFRegressor, split_params
from human_3d_reconstruction_tpu.models.resnet import space_to_depth
from human_3d_reconstruction_tpu.ops.fused_resnet import (
    fused_bottleneck_stage,
    stage_blocks_from_params,
)


def _conv(x, p, strides=(1, 1), padding="VALID"):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _bottleneck_xla(x, p, strides=1):
    """Folded-BN bottleneck in plain lax (same math as models/resnet.py)."""
    y = nn.relu(_conv(x, p["conv1"]))
    y = nn.relu(_conv(y, p["conv2"], (strides, strides), [(1, 1), (1, 1)]))
    y = _conv(y, p["conv3"])
    if "conv_proj" in p:
        res = _conv(x, p["conv_proj"], (strides, strides))
    else:
        res = x
    return nn.relu(res + y)


def encoder_features_fused(config: HMRConfig, enc_params: dict, x: jax.Array):
    """images (B, S, S, 3) -> pooled features, Pallas stages 1-2.

    `enc_params` must be the folded-BN encoder params with the s2d stem
    (what optimize_for_serving produces).
    """
    stages, block = _RESNET_VARIANTS[config.encoder]
    if block != "bottleneck":
        raise ValueError("fused stages support bottleneck encoders (50/101)")
    dtype = config.encoder_dtype

    x = x.astype(dtype)
    x = space_to_depth(x, 2)
    x = nn.relu(_conv(x, enc_params["conv_init"], (1, 1), [(2, 1), (2, 1)]))
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    # Stages 1-2: Pallas (BW-bound in XLA); stages 3-4: XLA (MXU-bound).
    x = fused_bottleneck_stage(
        x, stage_blocks_from_params(enc_params, 1, stages[0]), stride2_first=False
    )
    x = fused_bottleneck_stage(
        x, stage_blocks_from_params(enc_params, 2, stages[1]), stride2_first=True
    )
    for i, n in ((3, stages[2]), (4, stages[3])):
        for j in range(1, n + 1):
            x = _bottleneck_xla(
                x, enc_params[f"stage{i}_block{j}"], strides=2 if j == 1 else 1
            )

    x = jnp.mean(x, axis=(1, 2))
    return x.astype(jnp.float32)


def hmr_forward_fused(model, variables, images: jax.Array) -> HMROutput:
    """Drop-in for HMRModel.apply(variables, images, train=False) at serving.

    Same parameter tree, same outputs; only the encoder's stage-1/2
    execution moves into the fused Pallas kernels. `model` is the HMRModel
    (provides config + the optional custom mean_params buffer).
    """
    config: HMRConfig = model.config
    features = encoder_features_fused(config, variables["params"]["encoder"], images)
    regressor = IEFRegressor(
        num_iterations=config.num_iterations,
        hidden_size=config.hidden_size,
        dropout_rate=config.dropout_rate,
        mean_params=model.mean_params,
    )
    all_params = regressor.apply(
        {"params": variables["params"]["regressor"]}, features, train=False
    )
    theta, beta, cam = split_params(all_params[-1])
    return HMROutput(
        theta=theta, beta=beta, cam=cam, all_params=all_params, features=features
    )
