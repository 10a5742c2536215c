"""Temporal-smoothing accuracy payoff on a rendered motion clip.

Round-4 shipped two video-line smoothers (VERDICT r4 Missing #3 wants the
measured payoff):

- utils/smoothing.py ParamSmoother — causal One-Euro filtering of the
  (theta, beta, cam) stream (what `cli.video` streams through), and
- fitting.refine_clip_params — offline temporal-bundle SMPLify over the
  whole window (shared beta, velocity + model-space acceleration coupling;
  what `cli.video --clip_refine_steps=N` runs).

This bench renders ONE temporally-coherent ground-truth motion clip with
the synthetic protocol (smooth sinusoidal pose trajectory through the same
pose distribution the generalization runs train on; per-frame index-keyed
background noise is the jitter source the smoothers must remove), regresses
every frame with a trained checkpoint via `recover_clip` (one device
program), and scores all three decodings against the GT joint sequence:

  raw        per-frame regression as-is
  one_euro   ParamSmoother over the param stream (causal, streaming)
  bundle     refine_clip_params (offline, whole-window)

Metrics per arm: pelvis-rooted MPJPE (mm, eval/metrics convention),
accel error vs GT (mm/frame^2, eval/metrics.accel_error_mm — the video-HMR
smoothness metric), and absolute jitter ||a_pred|| for context next to the
GT trajectory's own ||a_gt||.

Usage:
    python benchmarks/bench_smoothing.py --checkpoint benchmarks/results/gen_r4_ckpt/ckpt
    python benchmarks/bench_smoothing.py --force_cpu --frames 8 --steps 4   # smoke

Output: one JSON line per arm on stdout; markdown table on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def smooth_trajectory(
    rng: np.random.Generator, frames: int
) -> tuple[np.ndarray, np.ndarray]:
    """Smooth pose path matching the synthetic protocol's marginals.

    theta_t = 0.25 (z1c cos wt + z1s sin wt) + 0.15 (z2c cos 2wt + z2s sin 2wt)
    with z ~ N(0,1) per dim gives per-dim std sqrt(0.25^2 + 0.15^2) ~= 0.29
    (the dataset samples N(0, 0.3)) and a C-infinity trajectory whose second
    difference is small but nonzero — GT accel is the reference floor the
    smoothers must not undercut (oversmoothing shows up as MPJPE loss, not
    as a free accel win).
    """
    t = 2.0 * np.pi * np.arange(frames, dtype=np.float64) / frames
    theta = np.zeros((frames, 72), np.float64)
    for amp, freq in ((0.25, 1.0), (0.15, 2.0)):
        zc, zs = rng.normal(size=(2, 72))
        theta += amp * (
            np.cos(freq * t)[:, None] * zc + np.sin(freq * t)[:, None] * zs
        )
    beta = np.tile(rng.normal(scale=0.8, size=(1, 10)), (frames, 1))
    return theta.astype(np.float32), beta.astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="",
                    help="trained run dir (e.g. .../gen_r4_ckpt/ckpt); "
                    "empty = random weights (plumbing smoke only)")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--protocol", choices=["skeleton", "mesh"],
                    default="skeleton",
                    help="must match the checkpoint's training protocol")
    ap.add_argument("--steps", type=int, default=30,
                    help="bundle-refinement optimizer steps")
    ap.add_argument("--seed", type=int, default=11,
                    help="trajectory seed (disjoint from the train pools)")
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

    from human_3d_reconstruction_tpu.api import decode_params
    from human_3d_reconstruction_tpu.cli.common import (
        build_model,
        build_smpl,
        init_variables,
        restore_checkpoint_variables,
    )
    from human_3d_reconstruction_tpu.config import load_config
    from human_3d_reconstruction_tpu.data.datasets import SyntheticImageDataset
    from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
    from human_3d_reconstruction_tpu.eval.metrics import (
        accel_error_mm,
        mpjpe,
        pelvis_align,
    )
    from human_3d_reconstruction_tpu.fitting import refine_clip_params
    from human_3d_reconstruction_tpu.serving import MeshRecoverySession
    from human_3d_reconstruction_tpu.utils.smoothing import ParamSmoother

    if not args.force_cpu:
        from human_3d_reconstruction_tpu.utils.tunnel import check_tpu_tunnel

        check_tpu_tunnel()
    log(f"device: {jax.devices()[0]}")

    # --- GT clip ---------------------------------------------------------
    rng = np.random.default_rng(args.seed)
    thetas, betas = smooth_trajectory(rng, args.frames)
    config = load_config([])
    smpl_model = build_smpl(config)
    ds = SyntheticImageDataset(
        smpl_model, frame_hw=(256, 256), seed=args.seed,
        render_mode=args.protocol, thetas=thetas, betas=betas,
    )
    frames = [ds[i].image for i in range(len(ds))]
    gt_joints = jnp.asarray(ds.joints3d)  # (F, 14, 3) meters
    boxes = [np.array([[ds.centers[i, 0], ds.centers[i, 1], ds.scales[i]]],
                      np.float32) for i in range(len(ds))]

    # --- per-frame regression (one clip-batched device program) ----------
    own = {"checkpoint": args.checkpoint} if args.checkpoint else {}
    model = build_model(config, own)
    variables = init_variables(config, model)
    variables = restore_checkpoint_variables(own, variables)
    session = MeshRecoverySession(
        variables, smpl_model, hmr_config=config.train.hmr,
        crop_size=config.data.crop_size, smpl_path=config.smpl_path,
    )
    t0 = time.perf_counter()
    results = session.recover_clip(frames, boxes, fields=("theta", "beta", "cam"))
    t_reg = time.perf_counter() - t0
    theta = np.stack([r[0].theta for r in results])  # (F, 72)
    beta = np.stack([r[0].beta for r in results])
    cam = np.stack([r[0].cam for r in results])
    log(f"regressed {len(frames)} frames in {t_reg:.1f}s (incl. compile)")

    # --- scoring ----------------------------------------------------------
    decode = jax.jit(partial(decode_params, smpl_path=config.smpl_path))

    def score(th, be, ca) -> dict:
        out = decode(session.smpl_params, jnp.asarray(th), jnp.asarray(be),
                     jnp.asarray(ca))
        pred = out.eval_joints3d[:, :NUM_KP]
        p, g = pelvis_align(pred), pelvis_align(gt_joints)
        return {
            "mpjpe_mm": float(mpjpe(p[None], g[None], root_index=None) * 1e3),
            "accel_err_mm": float(accel_error_mm(pred, gt_joints)),
            "jitter_mm": float(accel_error_mm(pred, None)),
        }

    gt_jitter = float(accel_error_mm(gt_joints, None))
    arms: dict[str, dict] = {"raw": score(theta, beta, cam)}

    smoother = ParamSmoother()
    sm = [smoother.smooth(0, theta[i], beta[i], cam[i]) for i in range(len(theta))]
    arms["one_euro"] = score(
        np.stack([s[0] for s in sm]), np.stack([s[1] for s in sm]),
        np.stack([s[2] for s in sm]),
    )

    t0 = time.perf_counter()
    # refine_clip_params drives the raw (unfused) smpl_forward — same dict
    # cli.video's --clip_refine_steps path builds.
    raw_smpl = {k: jnp.asarray(v) for k, v in smpl_model.as_dict().items()}
    fit = jax.jit(
        lambda sp, th, be, ca: refine_clip_params(
            sp, th, be, ca, num_steps=args.steps
        )
    )
    res = fit(raw_smpl, theta, beta, cam)
    arms["bundle"] = score(res.theta, res.beta, res.cam)
    t_fit = time.perf_counter() - t0
    log(f"bundle refinement ({args.steps} steps): {t_fit:.1f}s (incl. compile)")

    log(f"\nGT trajectory accel ||a_gt|| = {gt_jitter:.2f} mm/frame^2\n")
    log("| arm | MPJPE mm | accel err mm/f^2 | jitter mm/f^2 |")
    log("|---|---|---|---|")
    for name, m in arms.items():
        log(f"| {name} | {m['mpjpe_mm']:.1f} | {m['accel_err_mm']:.2f} "
            f"| {m['jitter_mm']:.2f} |")
        print(json.dumps({
            "metric": "clip_smoothing", "arm": name,
            "frames": args.frames, "protocol": args.protocol,
            "checkpoint": bool(args.checkpoint), "gt_jitter_mm": gt_jitter,
            **m,
        }), flush=True)


if __name__ == "__main__":
    main()
