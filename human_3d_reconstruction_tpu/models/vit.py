"""ViT encoder family for HMR — an MXU-native backbone beyond the reference.

The reference's encoders are ResNet-50 and an hourglass (SURVEY.md section 2
"Encoder"); this module adds the transformer backbone the successor line of
work (HMR 2.0-style "transformerize the encoder") uses. It is the most
TPU-friendly encoder in the repo: every FLOP is a batched matmul, there are
no convolutions, no gathers, and the token count is static, so XLA maps the
whole network onto the MXU with trivial fusion.

TPU-first choices (not a torch port):

- **Patchify is a reshape, not a conv.** A stride-p pxp conv IS a reshape
  followed by a dense layer; doing it explicitly gives XLA one big
  (B*N, p*p*C) x (p*p*C, D) matmul instead of a conv it must pattern-match.
  Equivalence with the conv formulation is pinned in tests/test_vit.py.
- **Mean-pool by default, no class token.** The IEF regressor consumes one
  (B, D) feature; mean pooling keeps the token axis at exactly
  (H/p)*(W/p) = 196 for 224 crops, avoiding the 197-token concat that pads
  every attention matmul. `pool='cls'` is available for checkpoint parity
  with cls-token ViTs.
- **f32 islands in a bf16 sea.** LayerNorm statistics and the attention
  softmax run in f32 regardless of `dtype` (bf16 LN/softmax is where ViT
  accuracy dies); all matmuls take `dtype`, so bf16 serving keeps the MXU
  at full rate.
- **Static unroll + optional remat.** Depth is a Python loop (12 blocks is
  nothing to trace); `remat=True` wraps each block in jax.checkpoint for
  training memory, equality-tested against the non-remat path.

At 196 tokens, attention is ~3% of the network's FLOPs — a flash-attention
Pallas kernel has nothing to win here (the HBM-bound regime starts around
2k tokens), so per repo convention the XLA formulation IS the shipped path
and no kernel twin is written. Numerical truth is the torch
MultiheadAttention oracle in tests/test_vit.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    width: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    patch_size: int = 16
    pool: str = "mean"  # 'mean' | 'cls'
    dtype: Any = jnp.float32  # matmul dtype; LN/softmax stay f32
    remat: bool = False


# Standard ViT shape presets (Dosovitskiy et al. 2021 table 1; 'ti' from the
# DeiT follow-up). Keys double as HMRConfig.encoder names.
VIT_VARIANTS: dict[str, ViTConfig] = {
    "vit_ti16": ViTConfig(width=192, depth=12, num_heads=3),
    "vit_s16": ViTConfig(width=384, depth=12, num_heads=6),
    "vit_b16": ViTConfig(width=768, depth=12, num_heads=12),
}


class MultiHeadAttention(nn.Module):
    """QKV-fused attention; packing matches torch.nn.MultiheadAttention.

    The qkv kernel's output columns are ordered [q | k | v] (each `width`
    wide) so a torch `in_proj_weight` imports as `kernel = in_proj_weight.T`
    — pinned by the oracle test.
    """

    width: int
    num_heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, D = x.shape
        H = self.num_heads
        hd = D // H
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="qkv")(x)
        q, k, v = [
            a.reshape(B, N, H, hd)
            for a in jnp.split(qkv, 3, axis=-1)
        ]
        # f32 logits + softmax: bf16 softmax loses mm-scale fidelity and
        # the (B, H, N, N) tensor is tiny at N=196.
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q,
            k,
            preferred_element_type=jnp.float32,
        ) * (1.0 / jnp.sqrt(hd).astype(jnp.float32))
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, name="out")(out)


class TransformerBlock(nn.Module):
    """Pre-LN block: x + MHA(LN(x)); x + MLP(LN(x)). GELU is exact (erf) so
    the torch oracle matches without an approximation-gap tolerance."""

    width: int
    num_heads: int
    mlp_ratio: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x).astype(self.dtype)
        x = x + MultiHeadAttention(
            width=self.width, num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(y)
        y = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x).astype(self.dtype)
        y = nn.Dense(self.mlp_ratio * self.width, dtype=self.dtype, name="mlp_in")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.width, dtype=self.dtype, name="mlp_out")(y)
        return x + y


class ViTEncoder(nn.Module):
    """Image (B, H, W, 3) NHWC normalized -> pooled feature (B, width) f32."""

    config: ViTConfig = ViTConfig()

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        train: bool = False,
        return_spatial: bool = False,
    ):
        """`return_spatial=True` additionally returns the patch tokens as a
        (B, H/p, W/p, width) grid (cls token excluded, post-final-LN, in
        compute dtype) — the keypoint heatmap head's input. The pooled
        feature is identical either way."""
        cfg = self.config
        B, H, W, C = images.shape
        p = cfg.patch_size
        if H % p or W % p:
            raise ValueError(
                f"crop {H}x{W} not divisible by patch_size={p}"
            )
        n_tokens = (H // p) * (W // p)

        x = images.astype(cfg.dtype)
        # Space-to-depth patchify: one reshape/transpose, then a single
        # dense — the stride-p conv expressed as the matmul it is.
        x = x.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, n_tokens, p * p * C)
        x = nn.Dense(cfg.width, dtype=cfg.dtype, name="patch_embed")(x)

        if cfg.pool == "cls":
            cls = self.param(
                "cls_token",
                nn.initializers.truncated_normal(stddev=0.02),
                (1, 1, cfg.width),
                jnp.float32,
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (B, 1, cfg.width)).astype(cfg.dtype), x],
                axis=1,
            )
            n_tokens += 1
        elif cfg.pool != "mean":
            raise ValueError(f"unknown pool {cfg.pool!r}; use 'mean' or 'cls'")

        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, n_tokens, cfg.width),
            jnp.float32,
        )
        x = x + pos.astype(cfg.dtype)

        block_cls = TransformerBlock
        if cfg.remat:
            block_cls = nn.remat(TransformerBlock)
        for i in range(cfg.depth):  # static unroll; 12 blocks trace instantly
            x = block_cls(
                width=cfg.width,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                dtype=cfg.dtype,
                name=f"block{i}",
            )(x)

        x = nn.LayerNorm(dtype=jnp.float32, name="ln_final")(x)
        pooled = x[:, 0] if cfg.pool == "cls" else jnp.mean(x, axis=1)
        # The IEF regressor runs f32 (parameter space feeds mm-scale joints).
        pooled = pooled.astype(jnp.float32)
        if return_spatial:
            patches = x[:, 1:] if cfg.pool == "cls" else x
            grid = patches.reshape(B, H // p, W // p, cfg.width)
            return pooled, grid.astype(cfg.dtype)
        return pooled
