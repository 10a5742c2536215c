"""Root-cause the B>128 pipelined-serving cliff (VERDICT r3 weak #3).

r3 measured pipelined chained-step throughput 11.0k img/s at B=128 but
4.2k at B=192 and 4.0k at B=256 — attributed (circumstantially) to the
tunnel relay's async queuing stopping to overlap beyond ~100 MB of
in-flight buffers. This script turns the suspicion into an experiment:

  A. baseline: bench.py's exact chained loop at each batch size,
     with per-step timestamps (queue saturation shows up as early steps
     fast / late steps slow) and a live-bytes estimate for the output
     pytree that each un-synced step keeps alive;
  B. bounded in-flight: same chain but a scalar readback every k steps
     (k in --sync_every) — if the cliff is queued-work pileup, small k
     restores monotone batch scaling at a modest sync cost;
  C. H2D double-buffering: per-step FRESH uint8 frames shipped with
     jax.device_put rotating over two host buffers (the explicit
     double-buffered chain the r3 note called for), vs. the device-
     resident baseline — isolates transfer-side queuing from compute-side.

Run (real TPU, ~10 min):
    timeout 1200 python benchmarks/bench_serving_cliff.py \
        > /tmp/cliff.json 2> /tmp/cliff.err

One JSON line per (variant, batch) on stdout; human detail on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,192,256")
    ap.add_argument("--sync_every", default="1,2,4,0",
                    help="k values for variant B; 0 = never (baseline chain)")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--force_cpu", action="store_true",
                    help="logic smoke on CPU with tiny shapes (no tunnel)")
    args = ap.parse_args()

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from human_3d_reconstruction_tpu.utils.tunnel import check_tpu_tunnel

        check_tpu_tunnel()
    from human_3d_reconstruction_tpu.utils.compile_cache import (
        configure_compile_cache,
    )

    configure_compile_cache(5.0)

    from human_3d_reconstruction_tpu.api import make_recover_from_frames
    from human_3d_reconstruction_tpu.config import PRESETS
    from human_3d_reconstruction_tpu.models.hmr import (
        HMRModel,
        optimize_for_serving,
    )
    from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

    config = PRESETS["single_image"].train.hmr
    smpl_model = synthetic_smpl_model(seed=0)
    model0 = HMRModel(config=config)
    rng_init = jax.random.key(0)
    variables = model0.init(rng_init, jnp.zeros((1, 224, 224, 3)))
    serve_config, variables = optimize_for_serving(config, variables)
    model = HMRModel(config=serve_config)
    smpl_params = prepare_fused_smpl(smpl_model.as_dict())
    recover_frames = make_recover_from_frames(model, smpl_path="pallas")

    rng = np.random.default_rng(0)

    def sync_scalar(out) -> float:
        # block_until_ready can return early on this tunnel; a scalar
        # device->host readback cannot lie (utils/profiling.py).
        return float(out.verts.sum())

    results = []
    for B in (int(b) for b in args.batches.split(",")):
        frames_host = rng.uniform(0, 255, (B, 256, 256, 3)).astype(np.float32)
        frames = jnp.asarray(frames_host)
        centers = jnp.tile(jnp.asarray([[128.0, 128.0]]), (B, 1))
        scales = jnp.full((B,), 200.0)

        def pipeline(x):
            return recover_frames(variables, smpl_params, x, centers, scales)

        def chained_step(x):
            out = pipeline(x)
            return x + out.theta.sum() * 0.0, out

        # compile + settle
        t0 = time.perf_counter()
        sync_scalar(pipeline(frames))
        log(f"B={B}: compile+first {time.perf_counter() - t0:.1f}s")
        for _ in range(3):
            sync_scalar(pipeline(frames))
        out_bytes = tree_bytes(pipeline(frames))
        log(f"B={B}: output pytree {out_bytes/1e6:.1f} MB; "
            f"max un-synced in-flight at reps={args.reps}: "
            f"{args.reps*out_bytes/1e6:.0f} MB")

        # --- variant B (k=0 reproduces the r3 baseline chain) -------------
        for k in (int(s) for s in args.sync_every.split(",")):
            x = frames
            step_ts = []
            t0 = time.perf_counter()
            for i in range(args.reps):
                x, out = chained_step(x)
                if k and (i + 1) % k == 0:
                    sync_scalar(out)
                step_ts.append(time.perf_counter() - t0)
            sync_scalar(out)
            dt = (time.perf_counter() - t0) / args.reps
            # queue-saturation signature: enqueue times flat early, then
            # jumping once the relay stops absorbing work
            deltas = np.diff([0.0] + step_ts) * 1e3
            row = {
                "variant": f"sync_every_{k or 'never'}",
                "batch": B,
                "images_per_sec": round(B / dt, 1),
                "ms_per_step": round(dt * 1e3, 2),
                "enqueue_ms_first5": [round(d, 1) for d in deltas[:5]],
                "enqueue_ms_last5": [round(d, 1) for d in deltas[-5:]],
                "out_mb": round(out_bytes / 1e6, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
            log(f"B={B} k={k or 'never'}: {row['images_per_sec']} img/s "
                f"({row['ms_per_step']} ms/step)")

        # --- variant C: fresh uint8 frames each step, double-buffered -----
        hostbufs = [
            np.clip(frames_host + i, 0, 255).astype(np.uint8) for i in range(2)
        ]
        # prime both device slots
        slots = [jax.device_put(hb) for hb in hostbufs]
        sync_scalar(pipeline(slots[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        prev_out = None
        for i in range(args.reps):
            nxt = jax.device_put(hostbufs[(i + 1) % 2])  # overlap H2D w/ compute
            out = pipeline(slots[i % 2].astype(jnp.float32))
            slots[(i + 1) % 2] = nxt
            prev_out = out
        sync_scalar(prev_out)
        dt = (time.perf_counter() - t0) / args.reps
        row = {
            "variant": "h2d_double_buffered_uint8",
            "batch": B,
            "images_per_sec": round(B / dt, 1),
            "ms_per_step": round(dt * 1e3, 2),
            "h2d_mb_per_step": round(hostbufs[0].nbytes / 1e6, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        log(f"B={B} h2d-double-buffered: {row['images_per_sec']} img/s")

    # Verdict helper: does ANY bounded-inflight variant restore monotone
    # scaling B=128 -> 256?
    best = {}
    for r in results:
        if r["variant"].startswith("sync_every") and r["variant"] != "sync_every_never":
            best[r["batch"]] = max(best.get(r["batch"], 0), r["images_per_sec"])
    log(f"best bounded-inflight per batch: {best}")


if __name__ == "__main__":
    main()
