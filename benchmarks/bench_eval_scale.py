"""Eval-at-scale wall-time check (VERDICT r1 item 8 'Done' criterion):
a ~10k-frame synthetic eval stream must compile at most TWO programs
(predict + score) and report measured wall time.

The stream recycles a 64-image synthetic pool (content doesn't change the
compute; RAM stays bounded) and pads the ragged tail like load_eval_batches
does. Emits one JSON line.

Usage: python benchmarks/bench_eval_scale.py [--frames 10048] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

    configure_compile_cache(5.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10048)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--crop", type=int, default=224)
    args = ap.parse_args()

    from human_3d_reconstruction_tpu.api import make_recover_from_frames
    from human_3d_reconstruction_tpu.data.datasets import SyntheticImageDataset
    from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
    from human_3d_reconstruction_tpu.eval.protocol import (
        EvalBatch,
        H36M_EVAL_ACTIONS,
        run_protocol,
    )
    from human_3d_reconstruction_tpu.models import HMRConfig, HMRModel
    from human_3d_reconstruction_tpu.models.hmr import optimize_for_serving
    from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    smpl_model = synthetic_smpl_model(seed=0)
    config = HMRConfig(encoder_dtype=jnp.bfloat16)
    model0 = HMRModel(config=config)
    variables = model0.init(jax.random.key(0), jnp.zeros((1, args.crop, args.crop, 3)))
    s_cfg, s_vars = optimize_for_serving(config, variables)
    model = HMRModel(config=s_cfg)
    smpl_params = prepare_fused_smpl(smpl_model.as_dict())
    recover = make_recover_from_frames(model, smpl_path="pallas", crop_size=args.crop)

    shapes_seen = set()

    def predict(images, centers, scales):
        shapes_seen.add(np.asarray(images).shape)
        out = recover(
            s_vars, smpl_params,
            jnp.asarray(images), jnp.asarray(centers), jnp.asarray(scales),
        )
        return out.eval_joints3d[:, :NUM_KP]

    # Bounded-RAM 10k-frame stream: a 64-image pool recycled across batches,
    # with a genuinely ragged final batch padded like load_eval_batches does.
    pool = SyntheticImageDataset(smpl_model, n=args.batch, frame_hw=(256, 256), seed=0)
    recs = [pool[i] for i in range(args.batch)]
    images = np.stack([r.image for r in recs])
    centers = np.stack([r.center for r in recs])
    scales = np.stack([r.scale for r in recs])
    gt = np.stack([r.joints3d for r in recs])
    rng = np.random.default_rng(0)
    acts = rng.integers(0, len(H36M_EVAL_ACTIONS), size=args.batch)

    def batches(total):
        remaining = total
        while remaining > 0:
            n_valid = min(args.batch, remaining)
            yield EvalBatch(
                images=images, centers=centers, scales=scales,
                gt_joints3d=gt, actions=acts, n_valid=n_valid,
            )
            remaining -= n_valid

    # include the tail: make the last batch ragged
    total = args.frames - (args.batch // 2)

    t0 = time.perf_counter()
    report = run_protocol(predict, batches(total))
    wall = time.perf_counter() - t0
    result = {
        "metric": "eval_scale",
        "frames": report.num_frames,
        "wall_s": round(wall, 2),
        "frames_per_s": round(report.num_frames / wall, 1),
        "predict_program_shapes": len(shapes_seen),
        "mpjpe_mm": round(report.mpjpe_mm, 2),
    }
    assert len(shapes_seen) == 1, shapes_seen  # ONE predict program
    print(json.dumps(result))


if __name__ == "__main__":
    main()
