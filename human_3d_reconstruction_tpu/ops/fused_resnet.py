"""Pallas-fused ResNet bottleneck stages: whole stage per image in VMEM.

Why: at bf16 + batch 128 the serving encoder's stages 1-2 are
HBM-bandwidth-bound (BASELINE.md round-2 roofline: stage1 2.84 ms vs
3.76 ms per-layer-traffic bound, stage2 2.60 vs 2.51) because XLA
materializes every conv output in HBM — ~4 activation round-trips per
bottleneck block. A 56x56x256 stage-1 activation is only 1.6 MB in bf16:
the ENTIRE per-image stage fits in VMEM. This op runs a full stage (all
blocks) per grid step, reading the stage input once and writing the stage
output once — the only HBM traffic left is the mandatory in/out.

Formulation (all MXU work as (H*W, C) matmuls on lane-aligned channels):
  - 1x1 convs ARE matmuls: (H*W, Cin) @ (Cin, Cout), f32 accumulation.
  - the 3x3 conv runs as 9 shift-and-accumulate matmuls over a zero-padded
    VMEM copy — no im2col materialization, no halo exchange (the whole
    spatial extent is resident). Stride-2 taps use a reshape-slice
    (sublane-only data movement).
  - bias + ReLU + residual-add ride the VPU between matmuls.

Serving-path scope: folded-BN weights (conv bias carries the BN affine),
bottleneck blocks, forward only. The XLA twin (flax ResNet50 stage) remains
the training path; equivalence is pinned in tests/test_fused_resnet.py.

Reference parity: the reference's encoder is a stock torch ResNet-50
(SURVEY.md section 2 "Encoder"); this is a TPU-specific execution schedule
for the same math, not a new architecture.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-block weight keys, in ref order. "wp"/"bp" (projection shortcut) are
# present only on blocks whose input shape differs from their output shape.
_KEYS = ("w1", "b1", "w2", "b2", "w3", "b3", "wp", "bp")


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _flatten_blocks(blocks: Sequence[dict]) -> tuple[list, list]:
    """Flatten per-block weight dicts into (arrays, plan-of-keys)."""
    arrays, plan = [], []
    for blk in blocks:
        keys = [k for k in _KEYS if k in blk]
        plan.append(keys)
        arrays.extend(blk[k] for k in keys)
    return arrays, plan


def _stride2(v: jax.Array) -> jax.Array:
    """(2h, 2w, C) -> (h, w, C), even rows/cols (reshape-slice, no gather).

    Two 4-D steps (rows then cols) — kept low-rank for the Mosaic lowering.
    """
    h2, w2, C = v.shape
    v = v.reshape(h2 // 2, 2, w2, C)[:, 0]      # even rows -> (h, 2w, C)
    return v.reshape(h2 // 2, w2 // 2, 2, C)[:, :, 0]  # even cols


def _conv3x3(y: jax.Array, w2: jax.Array, stride: int, dot_kw: dict) -> jax.Array:
    """3x3/pad-1 conv as 9 shift-and-accumulate matmuls. y: (h, w, C)."""
    h, w, C = y.shape
    ho, wo = h // stride, w // stride
    ypad = jnp.pad(y, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((ho * wo, w2.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = ypad[dy : dy + stride * ho, dx : dx + stride * wo, :]
            if stride == 2:
                tap = _stride2(tap)
            acc = acc + jax.lax.dot(
                tap.reshape(ho * wo, C),
                w2[dy, dx],
                preferred_element_type=jnp.float32,
                **dot_kw,
            )
    return acc  # (ho*wo, Cout) f32


def _make_stage_kernel(plan, shapes, stride2_first: bool, dot_kw: dict):
    """Kernel closure: `plan` (per-block key lists) and static shapes."""
    H, W, _ = shapes

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        x = x_ref[0]  # (H, W, Cin)
        dtype = x.dtype
        ri = 0
        for bi, keys in enumerate(plan):
            w = {}
            for k in keys:
                w[k] = wrefs[ri][:]
                ri += 1
            stride = 2 if (bi == 0 and stride2_first) else 1
            h, wd, cin = x.shape
            ho, wo = h // stride, wd // stride

            y = jax.lax.dot(
                x.reshape(h * wd, cin), w["w1"].astype(dtype),
                preferred_element_type=jnp.float32, **dot_kw,
            )
            y = jnp.maximum(y + w["b1"], 0.0).astype(dtype)
            y2 = _conv3x3(
                y.reshape(h, wd, w["w1"].shape[-1]), w["w2"].astype(dtype),
                stride, dot_kw,
            )
            y2 = jnp.maximum(y2 + w["b2"], 0.0).astype(dtype)
            z = jax.lax.dot(
                y2, w["w3"].astype(dtype),
                preferred_element_type=jnp.float32, **dot_kw,
            ) + w["b3"]

            if "wp" in w:
                xin = _stride2(x) if stride == 2 else x
                res = jax.lax.dot(
                    xin.reshape(ho * wo, cin), w["wp"].astype(dtype),
                    preferred_element_type=jnp.float32, **dot_kw,
                ) + w["bp"]
            else:
                res = x.reshape(ho * wo, cin).astype(jnp.float32)
            cout = w["w3"].shape[-1]
            x = jnp.maximum(z + res, 0.0).astype(dtype).reshape(ho, wo, cout)
        out_ref[0] = x

    return kernel


def fused_bottleneck_stage(
    x: jax.Array,
    blocks: Sequence[dict],
    stride2_first: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Run a whole bottleneck stage (all blocks) VMEM-resident, per image.

    Args:
        x: (B, H, W, Cin) activations (bf16 on TPU; f32 for exact tests).
        blocks: per-block dicts with keys w1 (Cin, Cmid), b1 (Cmid,),
            w2 (3, 3, Cmid, Cmid), b2, w3 (Cmid, Cout), b3 (Cout,), and —
            on shape-changing blocks — wp (Cin, Cout), bp. Biases f32
            (folded BN lives there); weights any dtype (cast to x.dtype).
        stride2_first: first block downsamples 2x (stages 2-4).

    Returns:
        (B, H', W', Cout) activations, dtype of `x`.
    """
    if interpret is None:
        interpret = _is_cpu()
    B, H, W, Cin = x.shape
    stride = 2 if stride2_first else 1
    Ho, Wo = H // stride, W // stride
    Cout = blocks[-1]["w3"].shape[-1]

    arrays, plan = _flatten_blocks(blocks)
    kernel = _make_stage_kernel(plan, (H, W, Cin), stride2_first, {})

    flops = 0
    for bi, blk in enumerate(blocks):
        s = 2 if (bi == 0 and stride2_first) else 1
        hw_out = (H // s) * (W // s)
        cin = blk["w1"].shape[0]
        cmid = blk["w1"].shape[1]
        cout = blk["w3"].shape[-1]
        flops += 2 * H * W * cin * cmid          # 1x1 reduce (pre-stride)
        flops += 2 * hw_out * cmid * cmid * 9    # 3x3
        flops += 2 * hw_out * cmid * cout        # 1x1 expand
        if "wp" in blk:
            flops += 2 * hw_out * cin * cout
    weight_bytes = sum(int(a.size) * a.dtype.itemsize for a in arrays)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W, Cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [
            pl.BlockSpec(
                a.shape, (lambda i, n=a.ndim: (0,) * n), memory_space=pltpu.VMEM
            )
            for a in arrays
        ],
        out_specs=pl.BlockSpec(
            (1, Ho, Wo, Cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * flops,
            bytes_accessed=(
                x.dtype.itemsize * B * (H * W * Cin + Ho * Wo * Cout)
                + weight_bytes
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *arrays)


# ---------------------------------------------------------------------------
# Weight extraction from the flax ResNet's (folded-BN) param tree.
# ---------------------------------------------------------------------------


def stage_blocks_from_params(
    enc_params: dict, stage_index: int, num_blocks: int
) -> list[dict]:
    """Folded-BN flax params -> per-block weight dicts for the fused op.

    `enc_params` is the encoder's params tree with fold_bn applied (convs
    carry kernel+bias, no BN nodes) — models/resnet.py::fold_bn_variables.
    stage_index is 1-based (stage1 ... stage4).
    """
    def bias2d(b):
        return jnp.asarray(b, jnp.float32).reshape(1, -1)  # VMEM wants >=2D

    blocks = []
    for j in range(1, num_blocks + 1):
        p = enc_params[f"stage{stage_index}_block{j}"]
        blk = {
            "w1": p["conv1"]["kernel"][0, 0],        # (1,1,Cin,Cmid) -> 2D
            "b1": bias2d(p["conv1"]["bias"]),
            "w2": p["conv2"]["kernel"],              # (3,3,Cmid,Cmid)
            "b2": bias2d(p["conv2"]["bias"]),
            "w3": p["conv3"]["kernel"][0, 0],
            "b3": bias2d(p["conv3"]["bias"]),
        }
        if "conv_proj" in p:
            blk["wp"] = p["conv_proj"]["kernel"][0, 0]
            blk["bp"] = bias2d(p["conv_proj"]["bias"])
        blocks.append(blk)
    return blocks
