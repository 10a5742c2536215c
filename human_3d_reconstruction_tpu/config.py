"""Dataclass config with CLI overrides and the five BASELINE presets.

Reference parity: replaces the reference's flat config.py constants +
argparse merge (SURVEY.md sections 1 L6 and 5 "Config / flag system") with
one typed tree; each BASELINE.json eval config is a named preset:

    1 smpl_only      — SMPL forward only (theta/beta -> mesh + joints)
    2 single_image   — 224x224 crop -> HMR -> params/mesh
    3 batched_crops  — LSP/MPII-style batch + 2D reprojection eval
    4 h36m_eval      — sequence eval, MPJPE/PA-MPJPE report
    5 multi_person   — N boxes -> batched recovery + overlay render

Overrides: ``--section.field=value`` strings (``parse_overrides``), e.g.
``--train.g_lr=3e-5 --data.batch_size=32``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

from human_3d_reconstruction_tpu.models.hmr import HMRConfig
from human_3d_reconstruction_tpu.train.losses import LossWeights
from human_3d_reconstruction_tpu.train.trainer import TrainConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    batch_size: int = 64
    crop_size: int = 224
    # name -> (index_npz_path, weight); empty = synthetic data
    sources: tuple = ()
    synthetic_size: int = 256
    mosh_path: Optional[str] = None
    num_workers: int = 0  # host decode threads (0 = inline)
    # Data echoing (Choi et al. 2020): train echo_factor steps per host
    # batch — each echo gets a DIFFERENT on-device augmentation (the aug
    # RNG folds in the step counter), so a slow 1-core host can still feed
    # the chip. 1 = off.
    echo_factor: int = 1


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    batch_size: int = 64
    index_path: Optional[str] = None  # h36m-style npz; None = synthetic
    report_path: str = "eval_report.json"


@dataclasses.dataclass(frozen=True)
class RunConfig:
    preset: str = "single_image"
    smpl_model_path: Optional[str] = None  # None = synthetic model
    checkpoint_dir: str = "checkpoints"
    smpl_path: str = "pallas"  # 'xla' | 'pallas' decode path
    # IEF seed: '' = neutral mean; 'mosh' = derive from the mosh pose pool
    # and persist to <checkpoint_dir>/mean_params.npz; else a path to a
    # previously saved npz. Inference CLIs auto-restore the persisted file.
    mean_params: str = ""
    # Training-time GMM pose prior on predicted theta ('' = off; 'mosh' =
    # fit from the mosh pool and persist to <checkpoint_dir>/pose_prior.npz;
    # else a saved npz). Weight lives in --train.loss_weights.pose_prior.
    # With use_adversarial=False this is the discriminator-free mode.
    pose_prior: str = ""
    debug_nans: bool = False   # dev mode: fail fast on NaNs (SURVEY sec. 5)
    fit_steps: int = 0         # >0: SMPLify-style test-time refinement steps
    # GMM pose prior for the refinement objective (smpl/pose_prior.py):
    # '' = off; 'mosh' = fit K=8 from the mosh pool (--data.mosh_path, or
    # the synthetic pool) at startup; else a path to a saved prior npz.
    fit_pose_prior: str = ""
    fit_prior_weight: float = 1e-3
    # Keypoint source for --fit_steps: 'gt' fits the dataset's 2D keypoints
    # (external-detector stand-in); 'self' fits the model's OWN heatmap-head
    # detections (needs train.hmr.kp_head=true) — the self-contained mode,
    # and the honest one for datasets whose GT kp2d the model never sees.
    fit_source: str = "gt"
    # Flip-averaged test-time evaluation (the HMR/SPIN-family eval trick):
    # predict on the crop AND its horizontal mirror, un-mirror the second
    # prediction (negate x + L/R joint permutation), average the 3D joints.
    # One jitted program, 2x predictor FLOPs. Plain-regression eval only
    # (composing with --fit_steps would need mirrored observations too).
    flip_eval: bool = False
    seed: int = 0
    total_steps: int = 10000
    # Also the async-dispatch sync cadence: each logged step reads metrics
    # back, bounding the queued steps (every queued step pins its host
    # batch ~12 MB; thousands of unsynced steps = tens of GB RSS).
    log_every: int = 50
    save_every: int = 1000
    # >0: run the eval protocol on --eval.index_path (or a held-out
    # synthetic stream) every N steps and log val_mpjpe_mm — the in-loop
    # validation the r3 generalization runs were driven by, available to
    # every training run.
    eval_every: int = 0
    data: DataConfig = DataConfig()
    eval: EvalConfig = EvalConfig()
    train: TrainConfig = TrainConfig()


PRESETS: dict[str, RunConfig] = {
    "smpl_only": RunConfig(preset="smpl_only"),
    "single_image": RunConfig(preset="single_image"),
    "batched_crops": RunConfig(
        preset="batched_crops", data=DataConfig(batch_size=64)
    ),
    "h36m_eval": RunConfig(preset="h36m_eval", eval=EvalConfig(batch_size=64)),
    "multi_person": RunConfig(preset="multi_person"),
}


def _coerce(value: str, current: Any) -> Any:
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, tuple):
        return tuple(json.loads(value))
    if current is None:
        # best-effort: try json, fall back to string
        try:
            return json.loads(value)
        except (json.JSONDecodeError, ValueError):
            return value
    return value


def _replace_path(cfg: Any, dotted: str, value: str) -> Any:
    head, _, rest = dotted.partition(".")
    if not hasattr(cfg, head):
        raise KeyError(f"unknown config field: {head!r} on {type(cfg).__name__}")
    current = getattr(cfg, head)
    new = _replace_path(current, rest, value) if rest else _coerce(value, current)
    return dataclasses.replace(cfg, **{head: new})


def parse_overrides(config: RunConfig, argv: list[str]) -> RunConfig:
    """Apply '--a.b.c=value' overrides; unknown keys raise."""
    for arg in argv:
        if not arg.startswith("--"):
            raise ValueError(f"expected --key=value, got {arg!r}")
        key, _, value = arg[2:].partition("=")
        if not value:
            raise ValueError(f"missing value in {arg!r}")
        config = _replace_path(config, key, value)
    return config


def load_config(argv: list[str]) -> RunConfig:
    """argv = ['preset_name', '--overrides'...] or just overrides."""
    preset = "single_image"
    rest = list(argv)
    if rest and not rest[0].startswith("--"):
        preset = rest.pop(0)
    if preset not in PRESETS:
        raise KeyError(f"unknown preset {preset!r}; choose from {sorted(PRESETS)}")
    return parse_overrides(PRESETS[preset], rest)
