"""Export an AOT serving artifact: checkpoint -> self-contained program dir.

Usage:
    python -m human_3d_reconstruction_tpu.cli.export single_image \
        --out=artifact/ [--frame=720x1280] [--buckets=1,4,16] \
        [--checkpoint=ckpt_dir] [overrides]

The artifact directory holds one `jax.export`-serialized fused recovery
program per person-count bucket (weights + SMPL constants baked in), plus
mesh topology and metadata; `serving_export.ExportedRecoverySession` serves
it with no flax model code or checkpoint restore. The reference deploys by
shipping Python model code + a torch checkpoint (SURVEY.md section 3.2);
this is the TPU-native packaging of the same step.
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> None:
    from human_3d_reconstruction_tpu.cli.common import (
        build_model,
        build_smpl,
        echo,
        init_variables,
        restore_checkpoint_variables,
    )
    from human_3d_reconstruction_tpu.config import load_config
    from human_3d_reconstruction_tpu.serving import MeshRecoverySession
    from human_3d_reconstruction_tpu.serving_export import export_recovery_artifact

    from human_3d_reconstruction_tpu.cli.common import split_own_args

    own, overrides = split_own_args(argv, ("out", "frame", "buckets", "checkpoint", "checkpoint_step"))
    config = load_config(overrides)
    if "out" not in own:
        raise SystemExit("error: --out=<artifact_dir> is required")
    h, w = (int(v) for v in own.get("frame", "480x640").split("x"))
    buckets = (
        tuple(int(b) for b in own["buckets"].split(",")) if "buckets" in own else None
    )

    smpl_model = build_smpl(config)
    model = build_model(config, own)
    variables = init_variables(config, model)
    variables = restore_checkpoint_variables(own, variables)

    session = MeshRecoverySession(
        variables,
        smpl_model,
        hmr_config=config.train.hmr,
        crop_size=config.data.crop_size,
        smpl_path=config.smpl_path,
        buckets=buckets if buckets is not None else (1, 4, 16, 64),
    )
    art = export_recovery_artifact(
        session, own["out"], frame_shape=(h, w), buckets=session.buckets
    )
    echo(f"exported {len(session.buckets)} bucket program(s) to {art}")


if __name__ == "__main__":
    main(sys.argv[1:])
