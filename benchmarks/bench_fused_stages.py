"""TPU race: XLA vs Pallas-fused ResNet stages 1-2, and the full pipeline.

Usage: python benchmarks/bench_fused_stages.py [--batch 128] [--full]
Run ALONE on the host (CPU contention skews the dispatch loop).
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--full", action="store_true", help="also race the full pipeline")
    args = ap.parse_args()
    B = args.batch
    INNER = 10

    from human_3d_reconstruction_tpu.models.fused_encoder import _bottleneck_xla
    from human_3d_reconstruction_tpu.models.resnet import ResNet50, ResNetConfig
    from human_3d_reconstruction_tpu.ops.fused_resnet import (
        fused_bottleneck_stage,
        stage_blocks_from_params,
    )

    print(f"devices: {jax.devices()}  batch={B}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)

    def time_chained(fn, x0, reps=args.reps):
        @jax.jit
        def run(x):
            def body(x, _):
                x2, s = fn(x)
                return x2, s

            xf, ss = jax.lax.scan(body, x, None, length=INNER)
            return xf, ss[-1]

        x, s = run(x0)
        float(s)
        x, s = run(x)
        float(s)
        t0 = time.perf_counter()
        for _ in range(reps):
            x, s = run(x)
        float(s)
        return (time.perf_counter() - t0) / (reps * INNER)

    # Folded-BN resnet50 encoder weights (random; timing only).
    cfg = ResNetConfig(
        stage_sizes=(3, 4, 6, 3), stem="s2d", fold_bn=True, dtype=jnp.bfloat16
    )
    enc = ResNet50(config=cfg)
    dummy = jnp.zeros((1, 224, 224, 3))
    variables = enc.init(jax.random.key(0), dummy)
    p = variables["params"]
    s1_blocks = stage_blocks_from_params(p, 1, 3)
    s2_blocks = stage_blocks_from_params(p, 2, 4)

    h0 = jnp.asarray(
        rng.normal(size=(B, 56, 56, 64)).astype(np.float32), jnp.bfloat16
    )

    def xla_stages(x):
        y = x
        for j in (1, 2, 3):
            y = _bottleneck_xla(y, p[f"stage1_block{j}"], strides=1)
        for j in (1, 2, 3, 4):
            y = _bottleneck_xla(y, p[f"stage2_block{j}"], strides=2 if j == 1 else 1)
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    def pallas_stages(x):
        y = fused_bottleneck_stage(x, s1_blocks, stride2_first=False)
        y = fused_bottleneck_stage(y, s2_blocks, stride2_first=True)
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    h1 = jnp.asarray(
        rng.normal(size=(B, 56, 56, 256)).astype(np.float32), jnp.bfloat16
    )

    def xla_s1(x):
        y = x
        for j in (1, 2, 3):
            y = _bottleneck_xla(y, p[f"stage1_block{j}"], strides=1)
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    def pallas_s1(x):
        y = fused_bottleneck_stage(x, s1_blocks, stride2_first=False)
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    def xla_s2(x):
        y = x
        for j in (1, 2, 3, 4):
            y = _bottleneck_xla(y, p[f"stage2_block{j}"], strides=2 if j == 1 else 1)
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    def pallas_s2(x):
        y = fused_bottleneck_stage(x, s2_blocks, stride2_first=True)
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    results = {}
    for name, fn, x0 in (
        ("xla_s1", xla_s1, h0),
        ("pallas_s1", pallas_s1, h0),
        ("xla_s2", xla_s2, h1),
        ("pallas_s2", pallas_s2, h1),
        ("xla_s12", xla_stages, h0),
        ("pallas_s12", pallas_stages, h0),
    ):
        dt = time_chained(fn, x0)
        results[name + "_ms"] = round(dt * 1e3, 3)
        print(f"{name:>12}: {dt*1e3:.3f} ms", file=sys.stderr, flush=True)

    # Numerical cross-check on device.
    a = xla_stages(h0[:8])[1]
    b = pallas_stages(h0[:8])[1]
    rel = abs(float(a) - float(b)) / (abs(float(a)) + 1e-6)
    results["sum_rel_gap"] = rel
    print(f"checksum rel gap: {rel:.2e}", file=sys.stderr, flush=True)

    if args.full:
        from human_3d_reconstruction_tpu.api import make_recover_from_frames
        from human_3d_reconstruction_tpu.models import HMRConfig, HMRModel
        from human_3d_reconstruction_tpu.models.hmr import optimize_for_serving
        from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
        from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

        smpl_model = synthetic_smpl_model(seed=0)
        smpl_params = prepare_fused_smpl(smpl_model.as_dict())
        train_config = HMRConfig(encoder_dtype=jnp.bfloat16)
        train_model = HMRModel(config=train_config)
        tv = train_model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
        frames = jnp.asarray(rng.uniform(0, 255, (B, 256, 256, 3)).astype(np.float32))
        centers = jnp.tile(jnp.asarray([[128.0, 128.0]]), (B, 1))
        scales = jnp.full((B,), 200.0)

        for fused in (False, True):
            scfg, svars = optimize_for_serving(train_config, tv, fused_stages=fused)
            model = HMRModel(config=scfg)
            recover = make_recover_from_frames(model, smpl_path="pallas")

            def step(x, recover=recover, svars=svars):
                out = recover(svars, smpl_params, x, centers, scales)
                return x + out.theta.sum() * 0.0, out.verts.sum()

            dt = time_chained(step, frames)
            key = "pipeline_fused_ms" if fused else "pipeline_xla_ms"
            results[key] = round(dt * 1e3, 3)
            print(f"{key}: {dt*1e3:.3f} ms ({B/dt:.0f} img/s)", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "fused_stages_ms", "batch": B, **results}))


if __name__ == "__main__":
    main()
