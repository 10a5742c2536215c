"""Focused TPU experiments on the two remaining hot spots (round-2 roofline):

- preprocess (separable crop): measured 1.06 ms @B=128 vs ~0.3 ms bound.
  Variants: f32+HIGH (current exact path), bf16+DEFAULT (serving fast path).
- stem+pool: measured 1.41 ms vs ~0.5 ms bound. Splits conv-only vs
  conv+pool so the pool's extra HBM round-trip is visible, and compares a
  Pallas fused conv+pool candidate when present.

Usage: python benchmarks/bench_pre_stem.py [--batch 128]
One JSON line on stdout; detail on stderr.
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
    import flax.linen as nn

    from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

    configure_compile_cache(5.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=15)
    args = ap.parse_args()
    B = args.batch

    from human_3d_reconstruction_tpu.data.preprocess import preprocess_crops
    from human_3d_reconstruction_tpu.models.resnet import ResNet50, ResNetConfig

    print(f"devices: {jax.devices()}  batch={B}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    INNER = 10

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

    results = {}
    frames = jnp.asarray(rng.uniform(0, 255, (B, 256, 256, 3)).astype(np.float32))
    centers = jnp.tile(jnp.asarray([[128.0, 128.0]]), (B, 1))
    scales = jnp.full((B,), 200.0)

    # --- preprocess variants -------------------------------------------------
    def prep_f32(x):
        crops = preprocess_crops(x, centers, scales, out_size=224)
        return x + (crops.sum() * 1e-12).astype(x.dtype), crops.sum()

    results["prep_f32_high_ms"] = round(time_chained(prep_f32, frames) * 1e3, 3)
    print(f"preprocess f32+HIGH  : {results['prep_f32_high_ms']:.3f} ms", file=sys.stderr, flush=True)

    try:
        def prep_bf16(x):
            crops = preprocess_crops(
                x, centers, scales, out_size=224, dtype=jnp.bfloat16
            )
            return x + (crops.sum() * 1e-12).astype(x.dtype), crops.sum().astype(jnp.float32)

        results["prep_bf16_ms"] = round(time_chained(prep_bf16, frames) * 1e3, 3)
        print(f"preprocess bf16+DEF  : {results['prep_bf16_ms']:.3f} ms", file=sys.stderr, flush=True)
    except TypeError:
        print("preprocess dtype param not implemented yet", file=sys.stderr, flush=True)

    # --- stem variants -------------------------------------------------------
    imgs = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    cfg = ResNetConfig(stage_sizes=(), stem="s2d", fold_bn=True, dtype=jnp.bfloat16)
    enc = ResNet50(config=cfg)
    variables = enc.init(jax.random.key(0), imgs[:1])
    kernel = variables["params"]["conv_init"]["kernel"]
    bias = variables["params"]["conv_init"]["bias"]

    from human_3d_reconstruction_tpu.models.resnet import space_to_depth

    def conv_only(x):
        y = space_to_depth(x.astype(jnp.bfloat16), 2)
        y = jax.lax.conv_general_dilated(
            y, kernel.astype(jnp.bfloat16), (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = nn.relu(y + bias.astype(jnp.bfloat16))
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    results["stem_conv_only_ms"] = round(time_chained(conv_only, imgs) * 1e3, 3)
    print(f"stem conv+bias+relu  : {results['stem_conv_only_ms']:.3f} ms", file=sys.stderr, flush=True)

    def conv_pool(x):
        y = enc.apply(variables, x)  # full stem incl. maxpool + global mean
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    results["stem_conv_pool_ms"] = round(time_chained(conv_pool, imgs) * 1e3, 3)
    print(f"stem conv+pool (XLA) : {results['stem_conv_pool_ms']:.3f} ms", file=sys.stderr, flush=True)

    # Pallas fused stem, when implemented.
    try:
        from human_3d_reconstruction_tpu.ops.fused_stem import stem_conv_pool_fused

        def pallas_stem(x):
            y = stem_conv_pool_fused(
                x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16), bias
            )
            return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

        results["stem_pallas_ms"] = round(time_chained(pallas_stem, imgs) * 1e3, 3)
        print(f"stem conv+pool (Pallas): {results['stem_pallas_ms']:.3f} ms", file=sys.stderr, flush=True)
    except ImportError:
        print("pallas fused stem not implemented yet", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "pre_stem_ms", "batch": B, **results}))


if __name__ == "__main__":
    main()
