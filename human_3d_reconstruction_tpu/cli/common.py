"""Shared CLI plumbing: model/params construction from a RunConfig."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from human_3d_reconstruction_tpu.config import RunConfig
from human_3d_reconstruction_tpu.models import HMRModel
from human_3d_reconstruction_tpu.smpl import load_smpl_model, synthetic_smpl_model

# Persistent compile cache for every CLI entry point (same dir bench.py and
# tpu_checks.py use). On the remote-compile tunnel a cold flagship program
# costs minutes; with the cache a rerun of the same CLI config starts hot.
from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

configure_compile_cache(0.1)


def build_smpl(config: RunConfig):
    """SMPLModel from config path, or the deterministic synthetic model."""
    if config.smpl_model_path:
        return load_smpl_model(config.smpl_model_path)
    return synthetic_smpl_model(seed=0)


def build_model(config: RunConfig, own: dict | None = None) -> HMRModel:
    """Model for inference CLIs; restores the persisted dataset-derived IEF
    seed (mean_params.npz, written by training with --mean_params=mosh) so
    train and serve decode from the same mean.

    The seed is a module constant, NOT part of the Orbax checkpoint, so it
    must be resolved from the SAME directory the weights come from: when the
    CLI got `--checkpoint=<dir>`, look in <dir> and its parent (covers
    `--checkpoint=<run>/best`, whose seed lives in <run>); a run directory
    with no seed file was trained with the neutral seed, so NO fallback to
    config.checkpoint_dir happens then — that could silently pick up another
    run's seed, exactly the train/serve mismatch persistence exists to
    prevent. config.checkpoint_dir is only consulted when no --checkpoint
    was passed (fresh weights)."""
    from human_3d_reconstruction_tpu.smpl.mean_params import (
        load_mean_params,
        maybe_load_mean_params,
        mean_params_file,
    )

    if own and "checkpoint" in own:
        ckpt = Path(own["checkpoint"])
        mean = None
        for d in (ckpt, ckpt.parent):
            p = mean_params_file(d)
            if p.exists():
                mean = load_mean_params(p)
                break
    else:
        mean = maybe_load_mean_params(config.checkpoint_dir)
    return HMRModel(
        config=config.train.hmr,
        mean_params=None if mean is None else jnp.asarray(mean),
    )


def init_variables(config: RunConfig, model: HMRModel) -> Any:
    dummy = jnp.zeros((1, config.data.crop_size, config.data.crop_size, 3))
    return model.init(jax.random.key(config.seed), dummy)


def restore_checkpoint_variables(own: dict, variables: Any) -> Any:
    """Shared inference-CLI restore: --checkpoint[=dir] + --checkpoint_step.

    Returns the (possibly restored) variables; echoes what happened. One
    definition for demo/video/eval/export so the restore semantics (latest
    vs explicit step, missing-checkpoint message) can't drift between them.
    """
    if "checkpoint" not in own:
        if "checkpoint_step" in own:
            # Silently evaluating fresh random weights while the user asked
            # for a specific saved step would report garbage as that step.
            raise SystemExit(
                "error: --checkpoint_step needs --checkpoint=<dir> to select from"
            )
        return variables
    from human_3d_reconstruction_tpu.train.trainer import (
        make_checkpoint_manager,
        restore_inference_variables,
    )

    mgr = make_checkpoint_manager(own["checkpoint"])
    variables, step = restore_inference_variables(
        mgr, variables,
        step=int(own["checkpoint_step"]) if "checkpoint_step" in own else None,
    )
    echo(f"restored checkpoint step {step}" if step else "no checkpoint found")
    return variables


def apply_serving_rewrite(model: HMRModel, variables: Any) -> tuple[HMRModel, Any]:
    """Exact serving rewrite (s2d stem + folded BN) for inference CLIs.

    No-op for non-resnet encoders or variables without batch_stats (e.g.
    an already-folded tree). Outputs are bit-equal up to bf16 reduction
    order (pinned in tests/test_models.py::TestServingTransforms).
    """
    cfg = model.config
    if not cfg.encoder.startswith("resnet") or "batch_stats" not in variables:
        return model, variables
    from human_3d_reconstruction_tpu.models.hmr import optimize_for_serving

    new_cfg, new_vars = optimize_for_serving(cfg, variables)
    return HMRModel(config=new_cfg, mean_params=model.mean_params), new_vars


def smpl_device_params(config: RunConfig, smpl_model) -> dict:
    if config.smpl_path == "pallas":
        from human_3d_reconstruction_tpu.ops import prepare_fused_smpl

        return prepare_fused_smpl(smpl_model.as_dict())
    return jax.tree.map(jnp.asarray, smpl_model.as_dict())


class JSONLLogger:
    """Structured metric log (SURVEY.md section 5 'Metrics / logging').

    JSONL is the source of truth; pass `tensorboard=True` to mirror scalars
    to a TensorBoard event file next to it (reference parity: the reference
    trainer optionally logs SummaryWriter scalars).
    """

    def __init__(self, path: str | Path, tensorboard: bool = False):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    str(self.path.parent / "tb")
                )
            except Exception:
                self._tb = None  # tensorboard optional; JSONL always works

    def log(self, step: int, **metrics) -> None:
        row = {"step": step, "time": time.time()}
        row.update(
            {k: (float(v) if not isinstance(v, str) else v) for k, v in metrics.items()}
        )
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in row.items():
                    if isinstance(v, float) and k not in ("time",):
                        tf.summary.scalar(k, v, step=step)

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def echo(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def split_own_args(
    argv: list[str], keys: tuple[str, ...], flags: tuple[str, ...] = ()
) -> tuple[dict[str, str], list[str]]:
    """Split a CLI's own --key=value args from config overrides.

    `keys` take a value (`--key=value`; a bare `--key` yields "1" instead
    of crashing); `flags` are boolean (`--flag` -> "1"). Everything else
    passes through to `config.load_config`. One definition for every CLI
    so edge-case behavior can't drift between them.
    """
    own: dict[str, str] = {}
    overrides: list[str] = []
    for a in argv:
        key = a[2:].split("=", 1)[0] if a.startswith("--") else ""
        if key in keys:
            own[key] = a.split("=", 1)[1] if "=" in a else "1"
        elif key in flags:
            own[key] = "1"
        else:
            overrides.append(a)
    return own, overrides
