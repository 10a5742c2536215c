"""Decompose the stem's maxpool cost and race pool formulations on TPU.

round-2 finding: stem conv+bias+relu alone runs ~0.6 ms @B=128 (light
speed), but conv+maxpool(3x3/s2)+global-mean measured 2.7 ms — the
reduce_window lowering is the bottleneck. Candidates:

  A. nn.max_pool (reduce_window)               — current
  B. separable even/odd max (pure elementwise) — max is associative, so a
     3x3/s2 pool = (3x1/s2 over H) o (1x3/s2 over W), and each axis pool
     with k=3 s=2 pad1 is out[i] = max(x[2i-1], x[2i], x[2i+1]) — a
     reshape-to-(out, 2) + one shifted max, no reduce_window.

Usage: python benchmarks/bench_pool.py [--batch 128]
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
    INNER = 10

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

    from human_3d_reconstruction_tpu.models.resnet import space_to_depth

    kernel = jnp.asarray(
        rng.normal(0, 0.05, (4, 4, 12, 64)).astype(np.float32), jnp.bfloat16
    )
    bias = jnp.asarray(rng.normal(0, 0.05, (64,)).astype(np.float32))
    imgs = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))

    def conv_part(x):
        y = space_to_depth(x.astype(jnp.bfloat16), 2)
        y = jax.lax.conv_general_dilated(
            y, kernel, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return nn.relu(y + bias.astype(jnp.bfloat16))

    def axis_pool_3s2(x, axis):
        """k=3 s=2 pad1 max along `axis` (length 2n -> n), even/odd trick."""
        n = x.shape[axis] // 2
        shape = list(x.shape)
        shape[axis : axis + 1] = [n, 2]
        r = x.reshape(shape)
        even = jax.lax.index_in_dim(r, 0, axis + 1, keepdims=False)
        odd = jax.lax.index_in_dim(r, 1, axis + 1, keepdims=False)
        # out[i] = max(x[2i-1], x[2i], x[2i+1]) = max(odd[i-1], even[i], odd[i])
        pad_cfg = [(0, 0)] * even.ndim
        pad_cfg[axis] = (1, 0)
        prev_odd = jax.lax.pad(
            odd, jnp.asarray(-jnp.inf, odd.dtype),
            [(lo, 0, 0) for lo, _ in pad_cfg],
        )
        prev_odd = jax.lax.slice_in_dim(prev_odd, 0, n, axis=axis)
        return jnp.maximum(jnp.maximum(prev_odd, even), odd)

    variants = {}

    def stem_a(x):
        y = conv_part(x)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    variants["A_reduce_window"] = stem_a

    def stem_b(x):
        y = conv_part(x)
        y = axis_pool_3s2(y, 1)
        y = axis_pool_3s2(y, 2)
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    variants["B_evenodd"] = stem_b

    def stem_a_mean(x):
        y = conv_part(x)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        y = jnp.mean(y, axis=(1, 2))
        return x + (y.sum() * 1e-12).astype(x.dtype), y.sum().astype(jnp.float32)

    variants["A_plus_globalmean"] = stem_a_mean

    results = {}
    for name, fn in variants.items():
        dt = time_chained(fn, imgs)
        results[name + "_ms"] = round(dt * 1e3, 3)
        print(f"{name:>20}: {dt*1e3:.3f} ms", file=sys.stderr, flush=True)

    # correctness cross-check on small input
    small = jnp.asarray(rng.normal(size=(2, 16, 16, 5)).astype(np.float32))
    a = nn.max_pool(small, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    b = axis_pool_3s2(axis_pool_3s2(small, 1), 2)
    gap = float(jnp.abs(a - b).max())
    results["evenodd_vs_reduce_window_gap"] = gap
    print(f"even/odd == reduce_window: gap {gap}", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "pool_ms", "batch": B, **results}))


if __name__ == "__main__":
    main()
