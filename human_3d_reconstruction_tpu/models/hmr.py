"""HMR model: encoder + IEF regressor -> SMPL params (+ mesh via smpl/).

Reference parity: `HMRNetBase.forward(img) -> per-iteration (theta, beta,
cam)` (SURVEY.md section 2 "Encoder"/"IEF regressor", call stack 3.2). The
mesh/joint decode is kept OUT of the nn.Module — it is a pure function of
(theta, beta) — so the same network serves training (needs per-iteration
params) and inference (needs only the last), and the SMPL decode can swap
between the XLA and Pallas paths without touching network code.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.models.regressor import (
    IEFRegressor,
    split_params,
)
from human_3d_reconstruction_tpu.models.resnet import ResNet50, ResNetConfig


@dataclasses.dataclass(frozen=True)
class HMRConfig:
    num_iterations: int = 3
    hidden_size: int = 1024
    # Pose parameterization of the IEF residual stream: 'aa' (85-d
    # axis-angle, reference parity) or 'rot6d' (157-d continuous 6D pose,
    # Zhou et al. 2019 — the successor HMR line's head). Output contract is
    # identical either way: (T, B, 85) axis-angle (models/regressor.py).
    rot_rep: str = "aa"
    encoder: str = "resnet50"  # resnet18/34/50/101 | hourglass | vit_{ti,s,b}16
    encoder_dtype: Any = jnp.float32  # bf16 for max throughput
    encoder_stem: str = "conv7"  # 's2d': MXU-friendly space-to-depth stem
    encoder_fold_bn: bool = False  # serving: BN folded into conv weights
    fused_stages: bool = False  # serving: Pallas-fused ResNet stages 1-2
    encoder_remat: bool = False  # training: rematerialize residual blocks
    dropout_rate: float = 0.0
    # Optional 2D keypoint heatmap head on the encoder's spatial map
    # (models/keypoint_head.py) — an independent keypoint source for the
    # hybrid regression+fitting path (no external detector needed). Works
    # with every encoder family; train with loss_weights.kp_heatmap > 0.
    kp_head: bool = False
    kp_head_filters: int = 256
    # Deconv count for the head. None = auto: pick so heatmaps land at
    # stride 4 of the crop for every encoder — resnet spatial is stride 32
    # (3 deconvs), ViT/16 stride 16 (2), hourglass already stride 4 (0).
    kp_head_deconvs: Optional[int] = None
    # Heatmap decode: 'global' (relu-normalized expectation over the whole
    # map — unbiased for a clean single Gaussian) or 'windowed' (expectation
    # restricted to a box around the dominant peak — robust to the secondary
    # modes of symmetric-limb ambiguity; see keypoint_head.py). Both are
    # gather-free. Default flipped to 'windowed' after the round-5 on-chip
    # A/B on a trained head: detection error 2.61 px mean / 6.63 p95 vs
    # global's 12.66 / 22.13 (better on 96.9% of joints), and self-refined
    # eval 80.7 mm vs 86.6 (BASELINE.md r5).
    kp_decode: str = "windowed"


# (stage sizes, block type): 18/34 are true basic-block nets (512-d pooled
# feature), 50/101 bottleneck (2048-d) — torchvision-faithful, so checkpoints
# of every depth import.
_RESNET_VARIANTS = {
    "resnet18": ((2, 2, 2, 2), "basic"),
    "resnet34": ((3, 4, 6, 3), "basic"),
    "resnet50": ((3, 4, 6, 3), "bottleneck"),
    "resnet101": ((3, 4, 23, 3), "bottleneck"),
}


class HMROutput(NamedTuple):
    theta: jax.Array        # (B, 72) final pose
    beta: jax.Array         # (B, 10) final shape
    cam: jax.Array          # (B, 3) final weak-perspective camera
    all_params: jax.Array   # (T, B, 85) every IEF iteration (training loss)
    features: jax.Array     # (B, D) encoder feature (D=2048 / 512 by depth)
    # Present only with config.kp_head (None otherwise):
    heatmaps: Optional[jax.Array] = None   # (B, Hm, Wm, K) raw maps
    kp2d_det: Optional[jax.Array] = None   # (B, K, 2) decoded, crop [-1, 1]
    kp_conf: Optional[jax.Array] = None    # (B, K) peak confidence [0, 1]


class HMRModel(nn.Module):
    """Image crop (B, 224, 224, 3, NHWC, normalized) -> SMPL params."""

    config: HMRConfig = HMRConfig()
    mean_params: Optional[jnp.ndarray] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> HMROutput:
        cfg = self.config
        spatial = None
        # Auto deconv depth: encoder spatial stride / 4 (heatmaps at
        # stride 4 for every family — see HMRConfig.kp_head_deconvs).
        kp_deconvs = cfg.kp_head_deconvs
        if cfg.encoder == "hourglass":
            from human_3d_reconstruction_tpu.models.hourglass import (
                HourglassConfig,
                HourglassEncoder,
            )

            encoder = HourglassEncoder(
                config=HourglassConfig(
                    dtype=cfg.encoder_dtype, remat=cfg.encoder_remat
                ),
                name="encoder",
            )
            if cfg.kp_head:
                features, spatial = encoder(
                    images, train=train, return_spatial=True
                )
                kp_deconvs = 0 if kp_deconvs is None else kp_deconvs
            else:
                features = encoder(images, train=train)
        elif cfg.encoder.startswith("vit"):
            from human_3d_reconstruction_tpu.models.vit import (
                VIT_VARIANTS,
                ViTEncoder,
            )

            encoder = ViTEncoder(
                config=dataclasses.replace(
                    VIT_VARIANTS[cfg.encoder],
                    dtype=cfg.encoder_dtype,
                    remat=cfg.encoder_remat,
                ),
                name="encoder",
            )
            if cfg.kp_head:
                features, spatial = encoder(
                    images, train=train, return_spatial=True
                )
                kp_deconvs = 2 if kp_deconvs is None else kp_deconvs
            else:
                features = encoder(images, train=train)
        else:
            stages, block = _RESNET_VARIANTS[cfg.encoder]
            encoder = ResNet50(
                config=ResNetConfig(
                    stage_sizes=stages,
                    block=block,
                    stem=cfg.encoder_stem,
                    fold_bn=cfg.encoder_fold_bn,
                    dtype=cfg.encoder_dtype,
                    remat=cfg.encoder_remat,
                ),
                name="encoder",
            )
            if cfg.kp_head:
                features, spatial = encoder(
                    images, train=train, return_spatial=True
                )
                kp_deconvs = 3 if kp_deconvs is None else kp_deconvs
            else:
                features = encoder(images, train=train)

        heatmaps = kp2d_det = kp_conf = None
        if cfg.kp_head:
            from human_3d_reconstruction_tpu.models.keypoint_head import (
                KeypointHead,
                soft_argmax,
                soft_argmax_windowed,
            )

            heatmaps = KeypointHead(
                filters=cfg.kp_head_filters,
                num_deconv=kp_deconvs,
                dtype=cfg.encoder_dtype,
                name="kp_head",
            )(spatial)
            if cfg.kp_decode == "windowed":
                kp2d_det, kp_conf = soft_argmax_windowed(heatmaps)
            elif cfg.kp_decode == "global":
                kp2d_det, kp_conf = soft_argmax(heatmaps)
            else:
                raise ValueError(
                    f"unknown kp_decode {cfg.kp_decode!r} "
                    "(expected 'global' or 'windowed')"
                )

        all_params = IEFRegressor(
            num_iterations=cfg.num_iterations,
            hidden_size=cfg.hidden_size,
            dropout_rate=cfg.dropout_rate,
            mean_params=self.mean_params,
            rot_rep=cfg.rot_rep,
            name="regressor",
        )(features, train=train)

        theta, beta, cam = split_params(all_params[-1])
        return HMROutput(
            theta=theta, beta=beta, cam=cam, all_params=all_params,
            features=features, heatmaps=heatmaps, kp2d_det=kp2d_det,
            kp_conf=kp_conf,
        )


def optimize_for_serving(
    config: HMRConfig, variables, fused_stages: Optional[bool] = None
) -> tuple[HMRConfig, dict]:
    """One-call serving rewrite: s2d stem + folded BN, exact same outputs.

    Takes a trained/imported conv7+BN checkpoint and returns (new config,
    new variables) for the faster serving graph — the MXU-friendly
    space-to-depth stem and normalization-free conv->relu chains. Only the
    weights change (exact reparameterizations, equivalence-tested); use the
    returned config to build the model.

    `fused_stages` additionally routes ResNet stages 1-2 through the
    Pallas whole-stage kernels at inference (ops/fused_resnet.py — same
    math, bf16-reduction-order-level differences only). Default OFF:
    measured round 2, XLA's own conv fusion wins this trade on v5e
    (BASELINE.md "fused-stage kernel" entry); the kernel ships for
    bottleneck encoders as an opt-in and for future hardware where the
    HBM:MXU ratio shifts.
    """
    if not config.encoder.startswith("resnet"):
        raise ValueError(f"serving rewrite supports resnet encoders, got {config.encoder}")
    if fused_stages is None:
        # Preserve an explicit opt-in on the incoming config; the measured
        # default (ships as HMRConfig.fused_stages=False) stays off.
        fused_stages = config.fused_stages
    if fused_stages and _RESNET_VARIANTS.get(config.encoder, (None, None))[1] != "bottleneck":
        raise ValueError("fused_stages requires a bottleneck encoder (resnet50/101)")
    if config.encoder_fold_bn:
        return dataclasses.replace(config, fused_stages=fused_stages), variables

    from human_3d_reconstruction_tpu.models.resnet import (
        convert_stem_to_s2d,
        fold_bn_variables,
    )

    enc = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }
    if config.encoder_stem == "conv7":
        enc = convert_stem_to_s2d(enc)
    enc = fold_bn_variables(enc)
    new_variables = {
        "params": {**variables["params"], "encoder": enc["params"]}
    }
    new_config = dataclasses.replace(
        config, encoder_stem="s2d", encoder_fold_bn=True, fused_stages=fused_stages
    )
    return new_config, new_variables
