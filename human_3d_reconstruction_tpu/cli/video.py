"""Video mesh recovery: frames in -> tracked, smoothed meshes + overlays out.

Extends the single-image demo (BASELINE config 5) to streams:

    python -m human_3d_reconstruction_tpu.cli.video \
        --frames=dir/ [--boxes=boxes.json] [--out=outdir] [--fps=30] [overrides]
    python -m human_3d_reconstruction_tpu.cli.video --video=clip.mp4 ...

Pipeline per frame (all device work in bucketed jitted programs that compile
once for the whole clip):
  1. recover meshes for the current person boxes (MeshRecoverySession — one
     fused preprocess+network+SMPL program);
  2. One-Euro-smooth each person's (theta, beta, cam) stream
     (utils/smoothing.py) and re-decode the smoothed params on device;
  3. render the smoothed meshes + skeletons into the frame;
  4. propagate each box from the recovered 2D keypoints (utils/tracking.py)
     so crops stay locked on target without a per-frame detector.

--boxes gives frame-0 boxes (JSON (N, 3) [cx, cy, scale]); afterwards boxes
track automatically (disable with --no_track). Without --boxes the frame-0
boxes come from the on-device person proposal (utils/person_proposal.py),
falling back to a full-frame
box when nothing is salient. Without --frames/--video a synthetic
moving-noise clip is generated (no sample data ships in this environment).

--clip_refine_steps=N adds an offline temporal-bundle pass after the
streaming loop (fitting.refine_clip_params): each tracked person's whole
(theta, beta, cam) stream is re-optimized in ONE jitted scan with shared
shape + velocity/acceleration priors, overlays re-rendered from the
refined params, and the accel-error delta reported. This is the
optimization-based smoother (VIBE/SmoothNet-style) next to the causal
One-Euro filter the loop streams through. With a kp_head model,
--clip_refine_kp additionally anchors the bundle to the heatmap head's
per-frame detections (confidence-weighted) — the temporal hybrid: fit
toward independent image evidence, not just smoothness.
"""

from __future__ import annotations

import json
import sys
from functools import partial
from pathlib import Path

import numpy as np

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def _iter_frames(own: dict):
    """Yield (index, RGB frame). Decoded sources stay uint8 (4x less
    host->device traffic in the serving session); synthetic is float32."""
    if "frames" in own:
        import cv2

        paths = sorted(
            p for p in Path(own["frames"]).iterdir() if p.suffix.lower() in IMAGE_EXTS
        )
        if not paths:
            raise SystemExit(f"error: no image files in {own['frames']!r}")
        for i, p in enumerate(paths):
            raw = cv2.imread(str(p))
            if raw is None:
                raise SystemExit(f"error: cannot read frame {p}")
            yield i, cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
    elif "video" in own:
        import cv2

        cap = cv2.VideoCapture(own["video"])
        if not cap.isOpened():
            raise SystemExit(f"error: cannot open video {own['video']!r}")
        i = 0
        while True:
            ok, raw = cap.read()
            if not ok:
                break
            yield i, cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
            i += 1
        cap.release()
    else:
        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (320, 320, 3)).astype(np.float32)
        for i in range(int(own.get("synthetic_frames", 6))):
            yield i, np.roll(base, shift=8 * i, axis=1)


def main(argv: list[str]) -> None:
    import jax

    from human_3d_reconstruction_tpu.cli.common import (
        build_model,
        build_smpl,
        echo,
        init_variables,
        restore_checkpoint_variables,
    )
    from human_3d_reconstruction_tpu.config import load_config
    from human_3d_reconstruction_tpu.serving import MeshRecoverySession
    from human_3d_reconstruction_tpu.utils.smoothing import ParamSmoother
    from human_3d_reconstruction_tpu.utils.tracking import propagate_box
    from human_3d_reconstruction_tpu.viz import overlay_meshes
    from human_3d_reconstruction_tpu.viz.draw import (
        crop_coords_to_pixels,
        draw_keypoints,
    )

    from human_3d_reconstruction_tpu.cli.common import split_own_args

    own, overrides = split_own_args(
        argv,
        ("frames", "video", "boxes", "out", "checkpoint", "checkpoint_step",
         "fps", "synthetic_frames", "max_frames", "clip_refine_steps"),
        flags=("no_track", "no_smooth", "clip_refine_kp"),
    )
    config = load_config(overrides)
    fps = float(own.get("fps", 30.0))
    out_dir = Path(own.get("out", "video_out"))
    out_dir.mkdir(parents=True, exist_ok=True)

    # --- model + session ------------------------------------------------------
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
    )

    # Smoothed params re-decode: ONE jitted program reused every frame
    # (bucketed person count, same buckets as the session).
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.api import decode_params
    from human_3d_reconstruction_tpu.utils.bucketing import pad_people

    decode = jax.jit(partial(decode_params, smpl_path=config.smpl_path))

    def decode_smoothed(thetas, betas, cams):
        n = len(thetas)
        padded, _ = pad_people(
            {
                "theta": np.asarray(thetas, np.float32),
                "beta": np.asarray(betas, np.float32),
                "cam": np.asarray(cams, np.float32),
            },
            n_valid=n,
            buckets=session.buckets,
        )
        out = decode(
            session.smpl_params,
            jnp.asarray(padded["theta"]),
            jnp.asarray(padded["beta"]),
            jnp.asarray(padded["cam"]),
        )
        return jax.tree.map(lambda x: np.asarray(x[:n]), out)

    smoother = ParamSmoother()
    track = "no_track" not in own
    smooth = "no_smooth" not in own
    boxes: np.ndarray | None = None
    if "boxes" in own:
        try:
            boxes = np.atleast_2d(
                np.asarray(json.loads(Path(own["boxes"]).read_text()), np.float32)
            )
        except (OSError, json.JSONDecodeError, ValueError) as e:
            raise SystemExit(f"error: --boxes unreadable ({own['boxes']!r}: {e})")
        if boxes.ndim != 2 or boxes.shape[1] != 3:
            raise SystemExit(f"error: --boxes shape {boxes.shape} != (N, 3)")

    # Append-per-frame (truncate once up front): every completed frame's row
    # hits disk even if a later frame raises (unreadable frame, device
    # error) — no handle left open across the loop, no buffered rows lost.
    log_path = out_dir / "params.jsonl"
    log_path.write_text("")
    max_frames = int(own.get("max_frames", 10**9))
    n_frames = 0
    faces = np.asarray(smpl_model.faces)
    clip_refine_steps = int(own.get("clip_refine_steps", 0))
    # --clip_refine_kp: anchor the bundle fit to the heatmap head's
    # per-frame detections (the temporal hybrid — fit toward independent
    # image evidence, not just smoothness). Needs a kp_head model.
    clip_refine_kp = "clip_refine_kp" in own
    if clip_refine_kp and not getattr(config.train.hmr, "kp_head", False):
        raise SystemExit(
            "error: --clip_refine_kp needs a kp_head model "
            "(--train.hmr.kp_head=true + a checkpoint trained with it)"
        )
    # Per-frame raw streams for the optional temporal-bundle pass (person
    # identity = tracked slot index, stable because slots follow their own
    # propagated boxes).
    stream: list[dict] = []

    for idx, frame in _iter_frames(own):
        if idx >= max_frames:
            break
        H, W = frame.shape[:2]
        if boxes is None:
            # Frame-0 boxes from the on-device saliency proposal (same
            # cascade as cli.demo); boxes then track frame-to-frame. A
            # frame with nothing salient falls back to one full-frame box.
            from human_3d_reconstruction_tpu.utils.person_proposal import (
                propose_person_boxes_np,
            )

            boxes = propose_person_boxes_np(frame)
            echo(f"auto person proposal (frame 0): {len(boxes)} box(es)")
        # Smoothing re-decodes verts from the smoothed params, so the raw
        # vertex buffers never leave the device in that mode (the D2H copy
        # of (N, 6890, 3) is the dominant per-frame cost on remote hosts).
        fetch = (
            ("theta", "beta", "cam", "joints2d")
            if smooth
            else MeshRecoverySession._ALL_FIELDS
        )
        if clip_refine_kp:
            fetch = (*fetch, "kp2d_det", "kp_conf")
        results = session.recover(frame, boxes, fields=fetch)
        N = len(results)

        # Temporal smoothing of the parameter stream (per person slot).
        if smooth:
            sm = [
                smoother.smooth(i, r.theta, r.beta, r.cam, dt=1.0 / fps)
                for i, r in enumerate(results)
            ]
            dec = decode_smoothed(
                [s[0] for s in sm], [s[1] for s in sm], [s[2] for s in sm]
            )
            verts = [dec.verts[i] for i in range(N)]
            cams = [dec.cam[i] for i in range(N)]
            joints2d = [dec.joints2d[i] for i in range(N)]
        else:
            verts = [r.verts for r in results]
            cams = [r.cam for r in results]
            joints2d = [r.joints2d for r in results]

        overlay = overlay_meshes(
            frame,
            verts,
            faces,
            cams=cams,
            centers=[boxes[i, :2] for i in range(N)],
            scales=[float(boxes[i, 2]) for i in range(N)],
        )
        kp_px_all = []
        for i in range(N):
            kp_px = crop_coords_to_pixels(
                joints2d[i][:14], boxes[i, :2], float(boxes[i, 2])
            )
            kp_px_all.append(kp_px)
            overlay = draw_keypoints(overlay, kp_px)

        frame_path = out_dir / f"frame_{idx:05d}.png"
        import cv2

        cv2.imwrite(
            str(frame_path),
            cv2.cvtColor(overlay.clip(0, 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )
        with open(log_path, "a") as log:
            log.write(
                json.dumps(
                    {
                        "frame": idx,
                        "boxes": boxes.tolist(),
                        "theta": [np.asarray(r.theta).tolist() for r in results],
                        "beta": [np.asarray(r.beta).tolist() for r in results],
                        "cam": [np.asarray(r.cam).tolist() for r in results],
                    }
                )
                + "\n"
            )
        if clip_refine_steps > 0:
            row = {
                "boxes": boxes.copy(),
                "theta": np.stack([np.asarray(r.theta) for r in results]),
                "beta": np.stack([np.asarray(r.beta) for r in results]),
                "cam": np.stack([np.asarray(r.cam) for r in results]),
            }
            if clip_refine_kp:
                row["kp2d"] = np.stack([np.asarray(r.kp2d_det) for r in results])
                row["conf"] = np.stack([np.asarray(r.kp_conf) for r in results])
            stream.append(row)
        n_frames += 1

        # Track: next frame's crops follow this frame's recovered keypoints
        # (raw, not smoothed — tracking should react faster than the filter).
        if track:
            raw_kp = [
                crop_coords_to_pixels(
                    results[i].joints2d[:14], boxes[i, :2], float(boxes[i, 2])
                )
                for i in range(N)
            ]
            boxes = np.stack(
                [propagate_box(boxes[i], raw_kp[i], (H, W)) for i in range(N)]
            )
        if idx % 10 == 0:
            echo(f"frame {idx}: {N} person(s), box0 scale {boxes[0, 2]:.0f}")

    echo(f"wrote {n_frames} overlay frames + {log_path}")

    accel_delta = None
    if clip_refine_steps > 0 and n_frames >= 3:
        from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
        from human_3d_reconstruction_tpu.eval.metrics import accel_error_mm
        from human_3d_reconstruction_tpu.fitting import refine_clip_params
        from human_3d_reconstruction_tpu.smpl.forward import smpl_forward

        raw_smpl = {k: jnp.asarray(v) for k, v in smpl_model.as_dict().items()}
        n_slots = min(len(s["theta"]) for s in stream)
        refined: list[dict] = []  # per slot: theta/beta/cam (F, ...)
        fit_jit = jax.jit(
            partial(refine_clip_params, num_steps=clip_refine_steps)
        )
        joints_jit = jax.jit(
            lambda t, b: smpl_forward(raw_smpl, t, b).eval_joints[:, :NUM_KP]
        )
        for slot in range(n_slots):
            th = jnp.asarray(np.stack([s["theta"][slot] for s in stream]))
            be = jnp.asarray(np.stack([s["beta"][slot] for s in stream]))
            cm = jnp.asarray(np.stack([s["cam"][slot] for s in stream]))
            if clip_refine_kp:
                fit = fit_jit(
                    raw_smpl, th, be, cm,
                    kp2d=jnp.asarray(np.stack([s["kp2d"][slot] for s in stream])),
                    vis=jnp.asarray(np.stack([s["conf"][slot] for s in stream])),
                )
            else:
                fit = fit_jit(raw_smpl, th, be, cm)
            a0 = float(accel_error_mm(joints_jit(th, be)))
            a1 = float(accel_error_mm(joints_jit(fit.theta, fit.beta)))
            refined.append(
                {"theta": np.asarray(fit.theta), "beta": np.asarray(fit.beta),
                 "cam": np.asarray(fit.cam), "accel_before": a0, "accel_after": a1}
            )
            echo(
                f"clip refine slot {slot}: accel {a0:.2f} -> {a1:.2f} mm/frame^2 "
                f"({clip_refine_steps} steps)"
            )
        accel_delta = [
            {"slot": i, "accel_before_mm": r["accel_before"],
             "accel_after_mm": r["accel_after"]}
            for i, r in enumerate(refined)
        ]

        # Re-render overlays + re-log params from the refined streams.
        refined_log = out_dir / "params_refined.jsonl"
        refined_log.write_text("")
        for idx, frame in _iter_frames(own):
            if idx >= n_frames:
                break
            fb = stream[idx]["boxes"]
            dec = decode_smoothed(
                [refined[s]["theta"][idx] for s in range(n_slots)],
                [refined[s]["beta"][idx] for s in range(n_slots)],
                [refined[s]["cam"][idx] for s in range(n_slots)],
            )
            overlay = overlay_meshes(
                frame,
                [dec.verts[s] for s in range(n_slots)],
                faces,
                cams=[dec.cam[s] for s in range(n_slots)],
                centers=[fb[s, :2] for s in range(n_slots)],
                scales=[float(fb[s, 2]) for s in range(n_slots)],
            )
            for s in range(n_slots):
                overlay = draw_keypoints(
                    overlay,
                    crop_coords_to_pixels(
                        dec.joints2d[s][:14], fb[s, :2], float(fb[s, 2])
                    ),
                )
            import cv2

            cv2.imwrite(
                str(out_dir / f"frame_{idx:05d}.png"),
                cv2.cvtColor(
                    overlay.clip(0, 255).astype(np.uint8), cv2.COLOR_RGB2BGR
                ),
            )
            with open(refined_log, "a") as log:
                log.write(
                    json.dumps(
                        {
                            "frame": idx,
                            "theta": [refined[s]["theta"][idx].tolist() for s in range(n_slots)],
                            "beta": [refined[s]["beta"][idx].tolist() for s in range(n_slots)],
                            "cam": [refined[s]["cam"][idx].tolist() for s in range(n_slots)],
                        }
                    )
                    + "\n"
                )
        echo(f"re-rendered {n_frames} overlays from the refined streams")

    print(
        json.dumps(
            {
                "num_frames": n_frames,
                "num_persons": int(len(boxes)) if boxes is not None else 0,
                "out_dir": str(out_dir),
                "params": str(log_path),
                "smoothed": smooth,
                "tracked": track,
                "clip_refined": accel_delta,
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
