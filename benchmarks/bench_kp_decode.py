"""A/B the keypoint-head decodes on a trained checkpoint (VERDICT r4 weak #4).

Measures, for `soft_argmax` (global expectation) vs `soft_argmax_windowed`
(peak-localized expectation) on the SAME trained kp-head checkpoint:

  - mean / p95 detection error in crop px vs the dataset's GT keypoints
    (visible joints only),
  - the fraction of joints whose error improves / worsens by > 1 px
    (the windowed decode should win exactly where secondary heatmap modes
    exist, and tie elsewhere).

The decode is parameter-free post-processing, so one restore serves both
arms; each arm is one jitted program over the padded eval batches.

Run (after the queue's gen_kp_8k item produced a checkpoint):
    timeout 900 python benchmarks/bench_kp_decode.py \
        --checkpoint benchmarks/results/gen_r4_kp/ckpt \
        --index benchmarks/results/gen_r4_kp/val/index.npz

One JSON line on stdout; detail on stderr. `--force_cpu` smokes the logic
on a randomly-initialized model + synthetic stream.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--index", default="")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args()

    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from human_3d_reconstruction_tpu.utils.compile_cache import (
        configure_compile_cache,
    )

    configure_compile_cache()

    import jax
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.cli.common import (
        restore_checkpoint_variables,
    )
    from human_3d_reconstruction_tpu.data.preprocess import (
        preprocess_crops,
        transform_keypoints,
    )
    from human_3d_reconstruction_tpu.eval.protocol import (
        load_eval_batches,
        synthetic_eval_batches,
    )
    from human_3d_reconstruction_tpu.models import HMRConfig, HMRModel
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

    if not args.force_cpu:
        from human_3d_reconstruction_tpu.utils.tunnel import check_tpu_tunnel

        check_tpu_tunnel()
    log(f"device: {jax.devices()[0]}")

    if args.force_cpu:
        args.crop = 64
        args.batch = 8

    base = dict(encoder="resnet50", kp_head=True)
    if args.force_cpu:
        base = dict(encoder="resnet18", hidden_size=64, kp_head=True,
                    kp_head_filters=32)
    cfgs = {
        "global": HMRConfig(**base, kp_decode="global"),
        "windowed": HMRConfig(**base, kp_decode="windowed"),
    }
    models = {k: HMRModel(config=c) for k, c in cfgs.items()}
    variables = models["global"].init(
        jax.random.key(0), jnp.zeros((1, args.crop, args.crop, 3))
    )
    if args.checkpoint:
        variables = restore_checkpoint_variables(
            {"checkpoint": args.checkpoint}, variables
        )
        log(f"restored {args.checkpoint}")

    smpl_model = synthetic_smpl_model(seed=0)
    if args.index:
        batches = list(load_eval_batches(args.index, batch_size=args.batch))
    else:
        batches = list(
            synthetic_eval_batches(smpl_model, num_batches=2,
                                   batch_size=args.batch)
        )
        log("no --index: synthetic eval stream")

    fns = {}
    for name, model in models.items():
        def predict(v, images, centers, scales, *, _m=model):
            crops = preprocess_crops(
                images, centers, scales, out_size=args.crop
            )
            out = _m.apply(v, crops, train=False)
            return out.kp2d_det, out.kp_conf

        fns[name] = jax.jit(predict)

    # Per-joint errors in crop px for each arm, aligned across arms.
    errs = {k: [] for k in fns}
    for b in batches:
        if b.kp2d is None:
            raise SystemExit("index has no kp2d — cannot score detections")
        n = b.n_valid if b.n_valid is not None else len(b.images)
        gt = jax.vmap(
            lambda k, c, s: transform_keypoints(k, c, s, out_size=args.crop)
        )(
            jnp.asarray(b.kp2d[..., :2]),
            jnp.asarray(b.centers),
            jnp.asarray(b.scales),
        )
        vis = np.asarray(b.kp2d[..., 2]) > 0.5
        for name, fn in fns.items():
            det, _conf = fn(
                variables, jnp.asarray(b.images), jnp.asarray(b.centers),
                jnp.asarray(b.scales),
            )
            e = np.linalg.norm(
                (np.asarray(det) - np.asarray(gt)) * (args.crop / 2.0),
                axis=-1,
            )  # (B, K) px
            errs[name].append(e[:n][vis[:n]])

    flat = {k: np.concatenate(v) for k, v in errs.items()}
    d = flat["windowed"] - flat["global"]  # negative = windowed better
    out = {
        "n_joints": int(flat["global"].size),
        "global_mean_px": round(float(flat["global"].mean()), 3),
        "global_p95_px": round(float(np.percentile(flat["global"], 95)), 3),
        "windowed_mean_px": round(float(flat["windowed"].mean()), 3),
        "windowed_p95_px": round(float(np.percentile(flat["windowed"], 95)), 3),
        "windowed_better_frac": round(float((d < -1.0).mean()), 3),
        "windowed_worse_frac": round(float((d > 1.0).mean()), 3),
    }
    print(json.dumps(out), flush=True)
    log(str(out))


if __name__ == "__main__":
    main()
