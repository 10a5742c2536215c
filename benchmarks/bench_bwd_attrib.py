"""Per-stage encoder BACKWARD attribution (r3 follow-up).

After the MXU rotation-aug fix the full generator backward is the largest
train-step slice (33.4 of 55.6 ms @B=128). This bench times grad-of-prefix
programs over cumulative encoder prefixes (stem, +stage1, ..) with the
scan-chain method, so consecutive deltas attribute each stage's
forward+backward cost; subtracting the fwd-only attribution table
(bench_attrib.py) isolates the backward. Roofline: a stage's backward is
~2x its forward conv FLOPs (input-grad + weight-grad matmuls).

Usage: python benchmarks/bench_bwd_attrib.py [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PEAK_TFLOPS = 197.0


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

    configure_compile_cache(5.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--inner", type=int, default=5)
    args = ap.parse_args()
    B = args.batch

    from human_3d_reconstruction_tpu.models.resnet import ResNet50, ResNetConfig

    print(f"devices: {jax.devices()}  batch={B}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))

    INNER = args.inner

    def time_chained(fn, x0):
        @jax.jit
        def run(x):
            def body(x, _):
                s = fn(x)
                return x + (s * 1e-12).astype(x.dtype), s

            xf, ss = jax.lax.scan(body, x, None, length=INNER)
            return xf, ss[-1]

        x, s = run(x0)
        float(s)
        x, s = run(x)
        float(s)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            x, s = run(x)
        float(s)
        return (time.perf_counter() - t0) / (args.reps * INNER)

    results = {}
    prev = 0.0
    for stages in ((), (3,), (3, 4), (3, 4, 6), (3, 4, 6, 3)):
        cfg = ResNetConfig(
            stage_sizes=stages, stem="s2d", fold_bn=True, dtype=jnp.bfloat16
        )
        enc = ResNet50(config=cfg)
        variables = enc.init(jax.random.key(0), imgs[:1])

        def fwd_bwd(x, enc=enc, variables=variables):
            # grad wrt params: runs the full stage backward (dgrad + wgrad).
            def loss(params):
                return enc.apply({"params": params}, x).sum().astype(jnp.float32)

            val, grads = jax.value_and_grad(loss)(variables["params"])
            acc = jax.tree.reduce(
                lambda a, b: a + b, jax.tree.map(lambda g: g.sum() * 1e-12, grads)
            )
            return val + acc

        dt = time_chained(fwd_bwd, imgs) * 1e3
        name = "stem" if not stages else f"+stage{len(stages)}"
        print(
            f"{name:>8}: fwd+bwd cumulative {dt:7.2f} ms  (+{dt - prev:6.2f} ms)",
            file=sys.stderr, flush=True,
        )
        results[name] = round(dt - prev, 2)
        prev = dt
    results["encoder_fwd_bwd_total_ms"] = round(prev, 2)

    # fwd-only FLOPs per stage (bench_attrib's table): bwd ~ +2x.
    print(
        "roofline: 3x-fwd-FLOPs lightspeed per stage (B scaled) — compare "
        "deltas above against 3x the bench_attrib fwd roofline",
        file=sys.stderr, flush=True,
    )
    print(json.dumps({"metric": "encoder_bwd_attribution_ms", "batch": B, **results}))


if __name__ == "__main__":
    main()
