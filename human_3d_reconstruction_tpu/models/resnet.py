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
    stem: str = "conv7"  # "conv7" (canonical) | "s2d" (space-to-depth, below)
    fold_bn: bool = False  # serving: BN folded into conv weights (see below)
    dtype: Any = jnp.float32  # compute dtype (bf16 for max MXU throughput)
    remat: bool = False  # rematerialize each residual block in the backward

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


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), channel order (i, j, c)."""
    B, H, W, C = x.shape
    assert H % block == 0 and W % block == 0, (H, W, block)
    x = x.reshape(B, H // block, block, W // block, block, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // block, W // block, block * block * C)


def stem_conv7_to_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact weight transform: 7x7/s2/pad3 stem kernel -> s2d 4x4/s1 kernel.

    A 7x7 stride-2 conv on 3-channel input runs the MXU at a fraction of
    peak (the contraction dim 7*7*3=147 is dominated by layout padding).
    Zero-padding the kernel to 8x8 (one row/col at the TOP-LEFT, matching
    the pad-3 -> pad-4 shift) and regrouping the 2x2 pixel phases into
    channels turns it into a 4x4 stride-1 conv over the space-to-depth
    input — identical outputs, MXU-friendly 192-wide contraction
    (MLPerf-ResNet's standard TPU stem transform).

    (7, 7, C, O) -> (4, 4, 4C, O); use with padding [(2, 1), (2, 1)].
    """
    k7 = jnp.asarray(kernel)
    C, O = k7.shape[2], k7.shape[3]
    k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))  # top-left zero row/col
    # (8, 8, C, O) -> (a, i, b, j, C, O) -> (a, b, i, j, C, O) -> (4, 4, 4C, O)
    k = k8.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    return k.reshape(4, 4, 4 * C, O)


class ResNet50(nn.Module):
    """NHWC ResNet; returns the 2048-d globally-pooled feature."""

    config: ResNetConfig = ResNetConfig()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, return_spatial: bool = False
    ):
        """`return_spatial=True` additionally returns the pre-pool feature
        map (B, h, w, C) in compute dtype — consumed by the keypoint
        heatmap head (models/keypoint_head.py). The pooled feature is
        bit-identical either way (same reduction, same dtype order)."""
        cfg = self.config
        use_bias = cfg.fold_bn  # folded-BN convs carry the bias
        conv = partial(nn.Conv, use_bias=use_bias, dtype=cfg.dtype, param_dtype=jnp.float32)
        if cfg.fold_bn:
            norm = lambda name=None, scale_init=None: (lambda y: y)  # identity
        else:
            norm = partial(
                nn.BatchNorm,
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
            )

        x = x.astype(cfg.dtype)
        if cfg.stem == "s2d":
            # Space-to-depth stem: same math as the 7x7/s2 conv after
            # `stem_conv7_to_s2d` (equivalence-tested), much better MXU
            # utilization on the 3-channel input.
            x = space_to_depth(x, 2)
            x = conv(
                cfg.num_filters, (4, 4), padding=[(2, 1), (2, 1)], name="conv_init"
            )(x)
        else:
            x = conv(
                cfg.num_filters, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                name="conv_init",
            )(x)
        x = norm(name="bn_init")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = BasicBlock if cfg.block == "basic" else BottleneckBlock
        if cfg.remat:
            # Gradient checkpointing: drop every block's internal activations
            # in the forward and recompute them in the backward — trades
            # ~1.3x encoder FLOPs for O(depth) activation memory, which is
            # what bounds the training batch size (jax.checkpoint via the
            # linen lifted transform; param tree unchanged).
            block_cls = nn.remat(block_cls)
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

        spatial = x
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, feature_dim)
        pooled = x.astype(jnp.float32)  # feature handoff to the head is f32
        if return_spatial:
            return pooled, spatial
        return pooled


# ---------------------------------------------------------------------------
# Serving-path weight transforms (host-side, applied once per checkpoint).
# Both are exact reparameterizations — equivalence-tested against the
# canonical net — so any trained/imported conv7+BN checkpoint serves through
# the faster graph.
# ---------------------------------------------------------------------------


def convert_stem_to_s2d(encoder_variables: dict) -> dict:
    """conv7 checkpoint -> variables for ResNetConfig(stem='s2d')."""
    import jax

    out = jax.tree.map(lambda x: x, encoder_variables)  # shallow-ish copy
    params = dict(out["params"])
    conv_init = dict(params["conv_init"])
    conv_init["kernel"] = stem_conv7_to_s2d(conv_init["kernel"])
    params["conv_init"] = conv_init
    out = dict(out)
    out["params"] = params
    return out


def fold_bn_variables(encoder_variables: dict, eps: float = 1e-5) -> dict:
    """conv+BN checkpoint -> params for ResNetConfig(fold_bn=True).

    Eval-mode BatchNorm is an affine map y = (x - mean) * scale/sqrt(var+eps)
    + bias; folding it into the preceding conv's kernel (+ a new bias) makes
    the serving program conv->relu chains with no normalization ops at all.
    Returns {"params": ...} only — the folded net has no batch_stats.
    """
    params = encoder_variables["params"]
    stats = encoder_variables["batch_stats"]

    def fold(conv_p: dict, bn_p: dict, bn_s: dict) -> dict:
        s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
        return {
            "kernel": jnp.asarray(conv_p["kernel"]) * s,  # broadcast over O
            "bias": bn_p["bias"] - bn_s["mean"] * s,
        }

    out: dict = {}
    for name, sub in params.items():
        if name.startswith("bn"):
            continue  # consumed by its conv
        if name == "conv_init":
            out[name] = fold(sub, params["bn_init"], stats["bn_init"])
        elif "block" in name:
            blk = {}
            for cname, csub in sub.items():
                if not cname.startswith("conv"):
                    continue
                bn_name = "bn" + cname[len("conv"):]
                blk[cname] = fold(csub, sub[bn_name], stats[name][bn_name])
            out[name] = blk
        else:
            out[name] = sub
    return {"params": out}
