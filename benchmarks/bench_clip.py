"""Clip-batched vs per-frame serving on the real chip.

The per-frame serving path pays one host->device dispatch per frame; on
this tunneled platform that is ~27 ms — the dominant cost for small person
counts. `recover_clip` batches F frames' crops into ONE program. This
measures both at a detector-fed video shape and emits JSON lines:

  {"metric": "serving_fps", "mode": "per_frame|clip", "F": ..., "N": ...,
   "value": frames_per_s, "persons_per_s": ...}

Usage: python benchmarks/bench_clip.py [--F 16] [--N 4] [--hw 480x640]
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
    ap.add_argument("--F", type=int, default=16)
    ap.add_argument("--N", type=int, default=4)
    ap.add_argument("--hw", type=str, default="480x640")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    H, W = (int(v) for v in args.hw.split("x"))

    from human_3d_reconstruction_tpu.models.hmr import HMRConfig, HMRModel
    from human_3d_reconstruction_tpu.serving import MeshRecoverySession
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    config = HMRConfig(encoder_dtype=jnp.bfloat16)
    model = HMRModel(config=config)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    smpl_model = synthetic_smpl_model(seed=0)
    session = MeshRecoverySession(variables, smpl_model, hmr_config=config)

    rng = np.random.default_rng(0)
    # uint8 frames: what a decoder hands you, and 4x less H2D than f32
    frames = [
        rng.integers(0, 255, (H, W, 3), dtype=np.uint8) for _ in range(args.F)
    ]
    boxes = [
        rng.uniform(100, 300, (args.N, 3)).astype(np.float32) for _ in range(args.F)
    ]

    def run(fn) -> float:
        fn()  # compile + warm
        fn()
        t0 = time.perf_counter()
        for _ in range(args.reps):
            fn()
        return (time.perf_counter() - t0) / args.reps

    for mode, fn in (
        ("per_frame", lambda: session.recover_batch(frames, boxes)),
        ("clip", lambda: session.recover_clip(frames, boxes)),
        # params-only: skip the (N, 6890, 3) vertex D2H — isolates how much
        # of serving latency is readback transfer on this host
        ("clip_params_only", lambda: session.recover_clip(
            frames, boxes, fields=("theta", "beta", "cam", "joints3d"))),
    ):
        dt = run(fn)
        print(
            json.dumps(
                {
                    "metric": "serving_fps",
                    "mode": mode,
                    "F": args.F,
                    "N": args.N,
                    "hw": f"{H}x{W}",
                    "value": round(args.F / dt, 1),
                    "persons_per_s": round(args.F * args.N / dt, 1),
                    "ms_per_clip": round(dt * 1e3, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
