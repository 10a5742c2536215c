"""ResNet-50 encoder in Flax linen, NHWC, TPU-first.

Reference parity: the reference's encoder is torchvision-style ResNet-50
producing a 2048-d pooled feature from a 224x224 crop (SURVEY.md section 2
"Encoder"). This is a fresh Flax implementation, not a translation:

- NHWC layout throughout (XLA-TPU's native conv layout; torch is NCHW).
- Configurable compute dtype: params live in f32, activations/convs can run
  bf16 — the MXU's fast path — with f32 BatchNorm statistics.
- All control flow static; the whole encoder is one fused XLA program.

V2-style option (`stage_sizes`) also yields ResNet-18/34/101 for the
HMR-family's encoder variants (SURVEY.md: "sometimes also hourglass/densenet
variants" — resnet depths covered here; others out of scope for parity).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: tuple = (3, 4, 6, 3)  # ResNet-50
    num_filters: int = 64
    block: str = "bottleneck"  # "bottleneck" (50/101) | "basic" (18/34)
    dtype: Any = jnp.float32  # compute dtype (bf16 for max MXU throughput)

    @property
    def feature_dim(self) -> int:
        """Pooled output width: 2048 for bottleneck nets, 512 for basic."""
        expansion = 4 if self.block == "bottleneck" else 1
        return self.num_filters * 8 * expansion


class BasicBlock(nn.Module):
    """3x3 -> 3x3 residual block (ResNet-18/34), expansion 1.

    Matches the canonical (torchvision) BasicBlock so 18/34 checkpoints
    import bit-faithfully: conv1 carries the stride, the shortcut is a
    1x1/stride projection when shape changes.
    """

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(
            self.filters, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], name="conv1",
        )(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = self.norm(scale_init=nn.initializers.zeros, name="bn2")(y)

        if residual.shape != y.shape:
            residual = self.conv(
                self.filters, (1, 1), strides=(self.strides, self.strides), name="conv_proj"
            )(residual)
            residual = self.norm(name="bn_proj")(residual)

        return nn.relu(residual + y)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with projection shortcut on stride/width."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1), name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        # Explicit symmetric padding: SAME pads asymmetrically under stride 2,
        # which diverges from the canonical (and torch) ResNet definition.
        y = self.conv(
            self.filters, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], name="conv2",
        )(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1), name="conv3")(y)
        y = self.norm(scale_init=nn.initializers.zeros, name="bn3")(y)

        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * 4, (1, 1), strides=(self.strides, self.strides), name="conv_proj"
            )(residual)
            residual = self.norm(name="bn_proj")(residual)

        return nn.relu(residual + y)


class ResNet50(nn.Module):
    """NHWC ResNet; returns the 2048-d globally-pooled feature."""

    config: ResNetConfig = ResNetConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        conv = partial(nn.Conv, use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32)
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
        )

        x = x.astype(cfg.dtype)
        x = conv(cfg.num_filters, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], name="conv_init")(x)
        x = norm(name="bn_init")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = BasicBlock if cfg.block == "basic" else BottleneckBlock
        for i, block_count in enumerate(cfg.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = block_cls(
                    filters=cfg.num_filters * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    name=f"stage{i + 1}_block{j + 1}",
                )(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, feature_dim)
        return x.astype(jnp.float32)  # feature handoff to the head is f32
