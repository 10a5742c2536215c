"""Stacked-hourglass encoder variant.

Reference parity: SURVEY.md section 2 "Encoder" notes the HMR family
sometimes swaps ResNet-50 for an hourglass encoder. This is a compact
stacked-hourglass (Newell et al. 2016 topology, fresh Flax implementation)
that ends in the same 2048-d pooled feature contract as ResNet50, so it is
a drop-in for `HMRModel` via `HMRConfig(encoder="hourglass")`.

TPU shape notes: the U-shaped down/up path uses stride-2 convs down and
2x nearest-neighbor upsample + conv up (resize-as-broadcast, layout-friendly
on TPU; no transposed convs, which lower poorly).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HourglassConfig:
    num_stacks: int = 2
    depth: int = 3          # down/up levels per hourglass
    features: int = 256
    dtype: Any = jnp.float32
    remat: bool = False     # rematerialize each hourglass stack in the bwd


class ConvBlock(nn.Module):
    features: int
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x):
        y = self.norm(name="bn1")(x)
        y = nn.relu(y)
        y = self.conv(self.features // 2, (1, 1), name="conv1")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.features // 2, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(name="bn3")(y)
        y = nn.relu(y)
        y = self.conv(self.features, (1, 1), name="conv3")(y)
        if x.shape[-1] != self.features:
            x = self.conv(self.features, (1, 1), name="proj")(x)
        return x + y


class Hourglass(nn.Module):
    depth: int
    features: int
    conv: Any
    norm: Any

    @nn.compact
    def __call__(self, x):
        f = self.features
        up1 = ConvBlock(f, self.conv, self.norm, name="up1")(x)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = ConvBlock(f, self.conv, self.norm, name="low1")(low)
        if self.depth > 1:
            low = Hourglass(self.depth - 1, f, self.conv, self.norm, name="inner")(low)
        else:
            low = ConvBlock(f, self.conv, self.norm, name="low2")(low)
        low = ConvBlock(f, self.conv, self.norm, name="low3")(low)
        # nearest-neighbor 2x upsample via reshape-broadcast (TPU-friendly).
        B, H, W, C = low.shape
        up2 = jnp.broadcast_to(low[:, :, None, :, None, :], (B, H, 2, W, 2, C)).reshape(
            B, H * 2, W * 2, C
        )
        return up1 + up2


class HourglassEncoder(nn.Module):
    """Image -> 2048-d feature (same contract as ResNet50)."""

    config: HourglassConfig = HourglassConfig()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, return_spatial: bool = False
    ):
        """`return_spatial=True` additionally returns the pre-pool map
        (B, H/4, W/4, 2048) — already heatmap-resolution (the hourglass IS
        a heatmap topology), so the keypoint head needs zero deconvs."""
        cfg = self.config
        conv = partial(nn.Conv, use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
        )

        x = x.astype(cfg.dtype)
        x = conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu(x)
        x = ConvBlock(128, conv, norm, name="stem_block")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(cfg.features, conv, norm, name="pre_block")(x)

        hg_cls = nn.remat(Hourglass) if cfg.remat else Hourglass
        for s in range(cfg.num_stacks):
            y = hg_cls(cfg.depth, cfg.features, conv, norm, name=f"hg{s + 1}")(x)
            y = ConvBlock(cfg.features, conv, norm, name=f"post{s + 1}")(y)
            x = x + y  # intermediate supervision hook point

        x = conv(2048, (1, 1), name="head_conv")(x)
        x = nn.relu(norm(name="head_bn")(x))
        spatial = x
        x = jnp.mean(x, axis=(1, 2))
        pooled = x.astype(jnp.float32)
        if return_spatial:
            return pooled, spatial
        return pooled
