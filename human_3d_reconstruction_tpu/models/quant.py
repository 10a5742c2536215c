"""Int8 serving path for the ResNet encoder (W8A8, dynamic activation quant).

The round-2 roofline (BASELINE.md) shows the bf16 encoder at ~86% of its
fusion-optimal bound: HBM-BW-bound early, MXU-bound late. Int8 halves the
activation/weight bytes AND doubles MXU throughput on TPU v5e (s8xs8->s32),
so it is the one remaining large serving lever.

Scheme (standard post-training quantization, serving-only):
- weights: per-output-channel symmetric int8 (`w_scale[o] = max|W[...,o]|/127`)
  folded from the BN-folded f32 checkpoint — use `quantize_resnet_params`
  on the output of `fold_bn_variables`;
- activations: per-tensor symmetric int8 with the scale computed IN-GRAPH
  (`max|x|/127`) — no calibration dataset needed; the max-reduce fuses with
  the producing epilogue;
- accumulation in int32, dequant+bias+relu in f32 (the conv epilogue).

Quality: measured on synthetic HMR inputs the full int8-encoder pipeline
shifts final SMPL params by well under bf16's own reduction-reorder noise
(pinned in tests/test_quant.py); a real-data MPJPE check belongs with real
weights when available.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.models.resnet import (
    BasicBlock,
    BottleneckBlock,
    ResNetConfig,
    space_to_depth,
)


class Int8Conv(nn.Module):
    """Drop-in conv running s8 x s8 -> s32 on the MXU.

    Signature-compatible with the `nn.Conv` partial used by the ResNet
    blocks (extra dtype kwargs accepted and ignored: quantized math fixes
    its own dtypes).
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True  # folded-BN convs carry bias
    dtype: Any = None      # ignored
    param_dtype: Any = jnp.float32
    static_scale: bool = False  # True: calibrated x_scale param (no in-graph
    # max pass — the int8 cast can fuse into the producer's epilogue)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            nn.initializers.zeros,  # real values come from quantize_resnet_params
            (kh, kw, cin, self.features),
            jnp.int8,
        )
        w_scale = self.param(
            "w_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

        x = x.astype(jnp.float32)
        if self.static_scale:
            # Calibrated per-tensor scale (see calibrate_activation_scales);
            # sow the observed amax so calibration can run on this module.
            s_x = self.param("x_scale", nn.initializers.ones, (), jnp.float32)
            self.sow("calib", "amax", jnp.max(jnp.abs(x)),
                     init_fn=lambda: jnp.zeros(()), reduce_fn=jnp.maximum)
        else:
            # Dynamic per-tensor activation scale, computed in-graph.
            s_x = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x / s_x), -127, 127).astype(jnp.int8)
        pad = self.padding
        if isinstance(pad, list):
            pad = [tuple(p) for p in pad]
        y = jax.lax.conv_general_dilated(
            xq,
            kernel_q,
            window_strides=self.strides,
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (s_x * w_scale) + bias
        return y


class ResNet50Int8(nn.Module):
    """Int8 twin of ResNet50: same structure as fold_bn=True, Int8Conv convs."""

    config: ResNetConfig = ResNetConfig(fold_bn=True)
    static_scale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        assert cfg.fold_bn, "int8 path requires the folded-BN graph"
        conv = partial(Int8Conv, static_scale=self.static_scale)
        identity = lambda name=None, scale_init=None: (lambda y: y)

        x = x.astype(jnp.float32)
        if cfg.stem == "s2d":
            x = space_to_depth(x, 2)
            x = conv(cfg.num_filters, (4, 4), padding=[(2, 1), (2, 1)], name="conv_init")(x)
        else:
            x = conv(
                cfg.num_filters, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                name="conv_init",
            )(x)
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
                    norm=identity,
                    name=f"stage{i + 1}_block{j + 1}",
                )(x)

        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


def quantize_conv(conv_params: dict, static_scale: bool = False) -> dict:
    """{kernel f32, bias} -> {kernel_q int8, w_scale, bias} (per-out-channel)."""
    w = jnp.asarray(conv_params["kernel"], jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
    kernel_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
    out = {
        "kernel_q": kernel_q,
        "w_scale": w_scale,
        "bias": jnp.asarray(conv_params["bias"], jnp.float32),
    }
    if static_scale:
        out["x_scale"] = jnp.ones((), jnp.float32)  # baked by calibration
    return out


def quantize_resnet_params(folded_params: dict, static_scale: bool = False) -> dict:
    """fold_bn_variables(...)['params'] -> params for ResNet50Int8."""
    out = {}
    for name, sub in folded_params.items():
        if name == "conv_init":
            out[name] = quantize_conv(sub, static_scale)
        elif "block" in name:
            out[name] = {c: quantize_conv(p, static_scale) for c, p in sub.items()}
        else:
            out[name] = sub
    return out


def quantize_hmr_for_serving(config, variables, static_scale: bool = False) -> tuple[Any, dict]:
    """(HMRConfig, trained conv7+BN variables) -> int8-encoder serving pair.

    Composes the exact serving rewrite (s2d stem + BN fold) with int8
    weight quantization. The regressor head stays f32 (it is a trivial
    fraction of the compute). Build the model with
    HMRModelInt8(config=new_config).
    """
    from human_3d_reconstruction_tpu.models.hmr import optimize_for_serving

    new_config, new_vars = optimize_for_serving(config, variables)
    enc_q = quantize_resnet_params(new_vars["params"]["encoder"], static_scale)
    return new_config, {
        "params": {**new_vars["params"], "encoder": enc_q}
    }


def calibrate_activation_scales(model, variables, calib_images) -> dict:
    """Bake per-conv activation scales from a calibration batch.

    Runs the static-scale int8 model once with the 'calib' collection
    mutable (each Int8Conv sows max|input|), then writes x_scale =
    amax/127 into the matching param leaves. Returns new variables.
    """
    import jax

    _, sown = model.apply(variables, calib_images, mutable=["calib"])

    params = jax.tree.map(lambda x: x, variables["params"])  # copy leaves

    def bake(p_node: dict, c_node: dict) -> dict:
        out = {}
        for k, v in p_node.items():
            c = c_node.get(k) if isinstance(c_node, dict) else None
            if isinstance(v, dict) and "x_scale" in v and c and "amax" in c:
                sown = c["amax"]  # reduce_fn=maximum -> a single 0-d array,
                # but default sow semantics would give a tuple; handle both.
                amax = (
                    jnp.max(jnp.stack([jnp.asarray(a) for a in sown]))
                    if isinstance(sown, (tuple, list))
                    else jnp.asarray(sown)
                )
                out[k] = {**v, "x_scale": jnp.maximum(amax, 1e-6) / 127.0}
            elif isinstance(v, dict):
                out[k] = bake(v, c or {})
            else:
                out[k] = v
        return out

    return {"params": bake(params, sown["calib"])}


class HMRModelInt8(nn.Module):
    """HMR with the int8 encoder; same outputs/structure as HMRModel."""

    config: Any
    static_scale: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        from human_3d_reconstruction_tpu.models.hmr import (
            HMROutput,
            _RESNET_VARIANTS,
        )
        from human_3d_reconstruction_tpu.models.regressor import (
            IEFRegressor,
            split_params,
        )

        cfg = self.config
        stages, block = _RESNET_VARIANTS[cfg.encoder]
        features = ResNet50Int8(
            config=ResNetConfig(
                stage_sizes=stages, block=block, stem=cfg.encoder_stem,
                fold_bn=True,
            ),
            static_scale=self.static_scale,
            name="encoder",
        )(images, train=train)
        all_params = IEFRegressor(
            num_iterations=cfg.num_iterations,
            hidden_size=cfg.hidden_size,
            dropout_rate=cfg.dropout_rate,
            name="regressor",
        )(features, train=train)
        theta, beta, cam = split_params(all_params[-1])
        return HMROutput(
            theta=theta, beta=beta, cam=cam, all_params=all_params, features=features
        )
