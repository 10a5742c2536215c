"""SMPL-forward CLI (BASELINE config 1): theta/beta -> mesh + joints.

Usage:
    python -m human_3d_reconstruction_tpu.cli.smpl_forward smpl_only \
        [--pose=pose.npy --betas=betas.npy --obj=mesh.obj] [overrides]

Inputs are .npy arrays ((B,72) pose, (B,10) betas); without them a neutral
body is evaluated. Prints joint stats as JSON on stdout; --obj saves the
first mesh. --smpl_path=xla|pallas selects the decode kernel.
"""

from __future__ import annotations

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


def main(argv: list[str]) -> None:
    from human_3d_reconstruction_tpu.cli.common import build_smpl, echo, smpl_device_params
    from human_3d_reconstruction_tpu.config import load_config
    from human_3d_reconstruction_tpu.ops import smpl_forward_fused
    from human_3d_reconstruction_tpu.smpl import smpl_forward

    from human_3d_reconstruction_tpu.cli.common import split_own_args

    own, overrides = split_own_args(argv, ("pose", "betas", "obj"))
    config = load_config(overrides or ["smpl_only"])

    pose = (
        np.load(own["pose"]) if "pose" in own else np.zeros((1, 72), np.float32)
    )
    betas = (
        np.load(own["betas"]) if "betas" in own else np.zeros((1, 10), np.float32)
    )
    echo(f"pose {pose.shape}, betas {betas.shape}, smpl_path={config.smpl_path}")

    smpl_model = build_smpl(config)
    params = smpl_device_params(config, smpl_model)
    fwd = smpl_forward_fused if config.smpl_path == "pallas" else smpl_forward
    out = jax.jit(lambda p, b: fwd(params, p, b))(
        jnp.asarray(pose, jnp.float32), jnp.asarray(betas, jnp.float32)
    )

    if "obj" in own:
        from human_3d_reconstruction_tpu.viz.mesh_io import save_obj

        save_obj(own["obj"], np.asarray(out.verts[0]), np.asarray(smpl_model.faces))
        echo(f"wrote {own['obj']}")

    print(
        json.dumps(
            {
                "verts_shape": list(out.verts.shape),
                "joints": np.asarray(out.joints).tolist(),
                "eval_joints_shape": list(out.eval_joints.shape),
                "vert_mean": float(jnp.mean(out.verts)),
                "vert_extent": [
                    float(out.verts.min()),
                    float(out.verts.max()),
                ],
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
