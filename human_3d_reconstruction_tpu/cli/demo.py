"""Demo: image(s) -> mesh recovery -> overlay render (BASELINE configs 2/5).

Usage:
    python -m human_3d_reconstruction_tpu.cli.demo single_image \
        --image=path.jpg [--boxes=boxes.json] [--out=overlay.png] [overrides]

Without --image a synthetic frame is generated (no sample data ships in
this environment). --boxes is 'auto' (default: on-device saliency person
proposal, utils/person_proposal.py — falls back to one full-frame box when
nothing is salient, so a raw frame needs NO side inputs), 'full' (force the
single full-frame box), or a JSON list of [cx, cy, scale] person boxes
(GT or an external detector). Multi-person (config 5) = multiple boxes:
N crops are batched through ONE device program and each mesh is rendered
back into the frame.

Reference call-stack twin: demo.py main (SURVEY.md section 3.2).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def main(argv: list[str]) -> None:
    from human_3d_reconstruction_tpu.api import make_recover_from_single_frame
    from human_3d_reconstruction_tpu.cli.common import (
        build_model,
        build_smpl,
        echo,
        init_variables,
        restore_checkpoint_variables,
        smpl_device_params,
    )
    from human_3d_reconstruction_tpu.config import load_config
    from human_3d_reconstruction_tpu.viz import overlay_meshes

    # split our own flags from config overrides
    from human_3d_reconstruction_tpu.cli.common import split_own_args

    own, overrides = split_own_args(
        argv,
        ("image", "boxes", "out", "checkpoint", "checkpoint_step",
         "save_meshes", "refine_steps"),
    )
    config = load_config(overrides)

    # --- input frame + boxes -------------------------------------------------
    if "image" in own:
        import cv2

        raw = cv2.imread(own["image"])
        if raw is None:
            raise SystemExit(f"error: cannot read image {own['image']!r}")
        frame = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)  # uint8: 4x less H2D
    else:
        echo("no --image given; using a synthetic frame")
        frame = np.random.default_rng(0).uniform(0, 255, (480, 640, 3)).astype(np.float32)

    H, W = frame.shape[:2]
    boxes_spec = own.get("boxes", "auto")
    if boxes_spec == "auto":
        # Self-contained multi-person path (BASELINE config 5 with zero
        # side inputs): on-device saliency proposal; falls back to ONE
        # full-frame box when nothing salient stands out (noise frames,
        # uniform scenes) — so a raw frame ALWAYS works.
        from human_3d_reconstruction_tpu.utils.person_proposal import (
            propose_person_boxes_np,
        )

        boxes = propose_person_boxes_np(frame)
        echo(f"auto person proposal: {len(boxes)} box(es)")
    elif boxes_spec == "full":
        boxes = np.asarray([[W / 2, H / 2, min(H, W) * 0.9]], np.float32)
    else:
        try:
            boxes = np.asarray(json.loads(Path(boxes_spec).read_text()), np.float32)
        except (OSError, json.JSONDecodeError, ValueError) as e:
            raise SystemExit(
                f"error: --boxes must be 'auto', 'full', or a JSON list of "
                f"[cx, cy, scale] rows ({boxes_spec!r}: {e})"
            )
        if boxes.ndim != 2 or boxes.shape[1] != 3 or len(boxes) == 0:
            raise SystemExit(
                f"error: --boxes shape {boxes.shape} != (N, 3) [cx, cy, scale]"
            )
    N = len(boxes)
    echo(f"frame {W}x{H}, {N} person box(es)")

    # --- model ---------------------------------------------------------------
    smpl_model = build_smpl(config)
    model = build_model(config, own)
    variables = init_variables(config, model)
    variables = restore_checkpoint_variables(own, variables)
    from human_3d_reconstruction_tpu.cli.common import apply_serving_rewrite

    model, variables = apply_serving_rewrite(model, variables)
    smpl_params = smpl_device_params(config, smpl_model)
    # --refine_steps=N: self-contained hybrid regression+fitting — the
    # model's own heatmap head (train with --train.hmr.kp_head=true +
    # loss_weights.kp_heatmap) supplies the 2D observations; no external
    # detector keypoints needed. One device program either way.
    refine_steps = int(own.get("refine_steps", "0"))
    raw_smpl = None
    if refine_steps > 0:
        if not getattr(model.config, "kp_head", False):
            raise SystemExit(
                "error: --refine_steps needs a keypoint-head model "
                "(--train.hmr.kp_head=true, matching the checkpoint)"
            )
        from human_3d_reconstruction_tpu.api import (
            make_self_refined_recover_from_single_frame,
        )

        recover_fit = make_self_refined_recover_from_single_frame(
            model, smpl_path=config.smpl_path,
            crop_size=config.data.crop_size, refine_steps=refine_steps,
        )
        raw_smpl = jax.tree.map(jnp.asarray, smpl_model.as_dict())
    recover = make_recover_from_single_frame(
        model, smpl_path=config.smpl_path, crop_size=config.data.crop_size
    )

    # --- batched recovery (one device program for all N persons) -------------
    # Bucketed padding: any crowd size reuses one of ~8 compiled programs
    # instead of retracing per N (SURVEY.md section 7 "Hard parts"). The
    # frame crosses the jit boundary ONCE; the per-person broadcast happens
    # inside the trace (one HBM copy, preprocess fused with the network).
    from human_3d_reconstruction_tpu.utils.bucketing import pad_people

    padded, mask = pad_people(
        {"centers": boxes[:, :2], "scales": boxes[:, 2]}, n_valid=N
    )
    if refine_steps > 0:
        out = recover_fit(
            variables, smpl_params, raw_smpl, jnp.asarray(frame),
            jnp.asarray(padded["centers"]), jnp.asarray(padded["scales"]),
        )
        echo(f"hybrid refinement: {refine_steps} SMPLify steps against the "
             f"model's own heatmap keypoints")
    else:
        out = recover(
            # uint8 frames ship as uint8 (cast happens on device in preprocess)
            variables, smpl_params, jnp.asarray(frame),
            jnp.asarray(padded["centers"]), jnp.asarray(padded["scales"]),
        )
    out = jax.tree.map(lambda x: x[:N], out)  # drop padded persons
    verts = np.asarray(out.verts)
    echo(
        f"recovered {N} meshes: theta {out.theta.shape}, verts {verts.shape}, "
        f"joints2d {out.joints2d.shape}"
    )

    # --- overlay render -------------------------------------------------------
    overlay = overlay_meshes(
        frame,
        [verts[i] for i in range(N)],
        np.asarray(smpl_model.faces),
        cams=[np.asarray(out.cam[i]) for i in range(N)],
        centers=[boxes[i, :2] for i in range(N)],
        scales=[float(boxes[i, 2]) for i in range(N)],
    )
    # Projected 2D keypoints + skeleton on top of the meshes.
    from human_3d_reconstruction_tpu.viz.draw import crop_coords_to_pixels, draw_keypoints

    for i in range(N):
        kp_px = crop_coords_to_pixels(
            np.asarray(out.joints2d[i][:14]), boxes[i, :2], float(boxes[i, 2])
        )
        overlay = draw_keypoints(overlay, kp_px)
    if "save_meshes" in own:
        from human_3d_reconstruction_tpu.viz.mesh_io import save_obj

        mesh_dir = Path(own["save_meshes"])
        mesh_dir.mkdir(parents=True, exist_ok=True)
        for i in range(N):
            save_obj(mesh_dir / f"person{i}.obj", verts[i], np.asarray(smpl_model.faces))
        echo(f"wrote {N} meshes to {mesh_dir}/")

    out_path = own.get("out", "demo_overlay.png")
    # An extension-less --out (or an existing directory) would make
    # cv2.imwrite fail AFTER the whole recovery ran — resolve it to a png.
    # Anything WITH an extension is passed through to cv2.imwrite as-is
    # (it supports more formats than we could whitelist: tiff, webp, ...).
    p = Path(out_path)
    if p.is_dir() or not p.suffix:
        p = (p / "demo_overlay.png") if p.is_dir() else p.with_suffix(".png")
        echo(f"--out has no image extension; writing {p}")
    out_path = str(p)
    p.parent.mkdir(parents=True, exist_ok=True)
    import cv2

    cv2.imwrite(out_path, cv2.cvtColor(overlay.clip(0, 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
    echo(f"wrote {out_path}")

    # machine-readable outputs on stdout (theta/beta/joints for piping)
    print(
        json.dumps(
            {
                "num_persons": N,
                "theta": np.asarray(out.theta).tolist(),
                "beta": np.asarray(out.beta).tolist(),
                "cam": np.asarray(out.cam).tolist(),
                "overlay": out_path,
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
