"""Mask-supervised fitting bench: dense vs tiled soft rasterizer
(VERDICT r2 item 3's "fitting <= 1 s/body" criterion).

Workload: `refine_params` with the soft-IoU mask term ON — per step it
renders B soft silhouettes AND backprops them into (theta, beta, cam)
through the SMPL forward. The synthetic SMPL model's faces are replaced by
a spatially-LOCAL topology (each vertex + two nearest template neighbors,
twice -> 13780 small faces) so the tiled rasterizer measures the real-SMPL
workload shape instead of instantly overflowing on random triples.

Usage (real TPU):
    python benchmarks/bench_fitting.py [--steps 50] [--bodies 2] [--mask 224]
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

import jax
import jax.numpy as jnp


def local_faces(v_template: np.ndarray, n_faces: int = 13780) -> np.ndarray:
    """Local topology over an existing vertex cloud: vertex + 2 near
    neighbors per face (two faces per vertex from neighbor pairs)."""
    V = len(v_template)
    d = np.linalg.norm(v_template[:, None] - v_template[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, :3]
    f1 = np.stack([np.arange(V), nn[:, 0], nn[:, 1]], axis=1)
    f2 = np.stack([np.arange(V), nn[:, 1], nn[:, 2]], axis=1)
    return np.concatenate([f1, f2])[:n_faces].astype(np.int32)


def main() -> None:
    from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

    configure_compile_cache(5.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--bodies", type=int, default=2)
    ap.add_argument("--mask", type=int, default=224)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--span", type=int, default=0,
                    help="tiled binning span (0 = full grid, the safe "
                         "default; 3 = fast path for small faces)")
    ap.add_argument("--modes", type=str, default="tiled,dense")
    args = ap.parse_args()

    from human_3d_reconstruction_tpu.fitting import refine_params
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

    def echo(msg):
        print(msg, file=sys.stderr, flush=True)

    echo(f"devices: {jax.devices()}")
    smpl_model = synthetic_smpl_model(seed=0)
    params = {k: np.asarray(v) for k, v in smpl_model.as_dict().items()}
    t0 = time.perf_counter()
    params["faces"] = local_faces(params["v_template"])
    echo(f"local topology: {params['faces'].shape[0]} faces "
         f"({time.perf_counter() - t0:.1f}s host build)")
    jparams = {k: jnp.asarray(v) for k, v in params.items()}

    B = args.bodies
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(scale=0.2, size=(B, 72)).astype(np.float32))
    beta = jnp.zeros((B, 10))
    cam = jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]), (B, 1))
    kp2d = jnp.asarray(rng.uniform(-0.6, 0.6, (B, 14, 2)).astype(np.float32))
    vis = jnp.ones((B, 14))
    masks = jnp.asarray(
        (rng.uniform(size=(B, args.mask, args.mask)) > 0.5).astype(np.float32)
    )

    rows = []
    for mode in args.modes.split(","):
        def run(theta=theta, mode=mode):
            out = refine_params(
                jparams, theta, beta, cam, kp2d, vis,
                num_steps=args.steps, masks=masks, lambda_mask=1.0,
                mask_raster=mode, mask_tile_cap=args.cap,
                mask_tile_span=args.span,
            )
            return float(out.loss_history[-1])  # scalar readback sync

        try:
            run()  # compile
            t0 = time.perf_counter()
            for _ in range(args.reps):
                run()
            dt = (time.perf_counter() - t0) / args.reps
            per_body = dt / B
            rows.append({
                "mode": mode, "steps": args.steps, "bodies": B,
                "mask": args.mask, "s_total": round(dt, 3),
                "s_per_body": round(per_body, 3),
            })
            echo(f"{mode}: {dt:.2f} s for {B} bodies x {args.steps} steps "
                 f"-> {per_body:.2f} s/body")
        except Exception as e:
            rows.append({"mode": mode, "error": type(e).__name__})
            echo(f"{mode}: FAILED {type(e).__name__}")

    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
