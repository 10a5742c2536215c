"""Microprobe: where do the fused-stage kernel's cycles go?

Times stripped-down Pallas kernels on the stage-2 shape (B=128, 56x56x256
-> 28x28x512 is the real one; here we probe the dominant block-2..4 shape
28x28, C=128/512) and the stage-1 shape. Variants:

  mm_only    — just the three 1x1-conv matmuls per block (no 3x3): MXU+VPU
               floor for the pointwise work.
  conv3d     — v1 formulation: 3x3 via 9 tap slices on a 3-D (H, W, C)
               value (pad + sublane/lane slicing + reshape per tap).
  convflat   — flat-grid formulation: activations as (Np, C) with a pad
               ring; taps are contiguous sublane-offset slices.

Usage: python benchmarks/probe_stage_kernel.py [--batch 128]
"""

from __future__ import annotations

import argparse
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

    configure_compile_cache(5.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--h", type=int, default=28)
    ap.add_argument("--cmid", type=int, default=128)
    ap.add_argument("--cout", type=int, default=512)
    ap.add_argument("--blocks", type=int, default=3)
    args = ap.parse_args()
    B, H, CM, CO, NB = args.batch, args.h, args.cmid, args.cout, args.blocks
    W = H
    INNER = 10

    print(
        f"devices: {jax.devices()} batch={B} shape {H}x{W} mid={CM} out={CO} x{NB}",
        file=sys.stderr, flush=True,
    )
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

    dt = jnp.bfloat16
    w1 = jnp.asarray(rng.normal(0, 0.05, (NB, CO, CM)).astype(np.float32), dt)
    w2 = jnp.asarray(rng.normal(0, 0.05, (NB, 3, 3, CM, CM)).astype(np.float32), dt)
    w3 = jnp.asarray(rng.normal(0, 0.05, (NB, CM, CO)).astype(np.float32), dt)
    x0 = jnp.asarray(rng.normal(size=(B, H, W, CO)).astype(np.float32), dt)

    def call(kernel, extra=()):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, H, W, CO), dt),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, W, CO), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(w1.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(w2.shape, lambda i: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(w3.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W, CO), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        )

    M = H * W

    def mm_only_kernel(x_ref, w1_ref, w2_ref, w3_ref, out_ref):
        x = x_ref[0].reshape(M, CO)
        for b in range(NB):
            y = jax.lax.dot(x, w1_ref[b], preferred_element_type=jnp.float32)
            y = jnp.maximum(y, 0).astype(dt)
            # stand-in for the 3x3: one extra CMxCM matmul
            y = jax.lax.dot(y, w2_ref[b, 1, 1], preferred_element_type=jnp.float32)
            y = jnp.maximum(y, 0).astype(dt)
            z = jax.lax.dot(y, w3_ref[b], preferred_element_type=jnp.float32)
            x = jnp.maximum(z + x.astype(jnp.float32), 0).astype(dt)
        out_ref[0] = x.reshape(H, W, CO)

    def conv3d_kernel(x_ref, w1_ref, w2_ref, w3_ref, out_ref):
        x = x_ref[0].reshape(M, CO)
        for b in range(NB):
            y = jax.lax.dot(x, w1_ref[b], preferred_element_type=jnp.float32)
            y = jnp.maximum(y, 0).astype(dt).reshape(H, W, CM)
            ypad = jnp.pad(y, ((1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((M, CM), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    tap = ypad[dy : dy + H, dx : dx + W, :].reshape(M, CM)
                    acc = acc + jax.lax.dot(
                        tap, w2_ref[b, dy, dx], preferred_element_type=jnp.float32
                    )
            y = jnp.maximum(acc, 0).astype(dt)
            z = jax.lax.dot(y, w3_ref[b], preferred_element_type=jnp.float32)
            x = jnp.maximum(z + x.astype(jnp.float32), 0).astype(dt)
        out_ref[0] = x.reshape(H, W, CO)

    P = W + 2
    NP = (H + 2) * P
    MW = (H - 1) * P + W  # contiguous output window length

    def convflat_kernel(x_ref, w1_ref, w2_ref, w3_ref, out_ref):
        # mask for garbage columns of the output window (x in {0, W+1} of
        # rows 1..H; window starts at flat P+1)
        i = jax.lax.broadcasted_iota(jnp.int32, (MW, 1), 0) + (P + 1)
        col = jax.lax.rem(i, P)
        mask = ((col >= 1) & (col <= W)).astype(jnp.float32)

        x3 = x_ref[0]
        xp = jnp.pad(x3, ((1, 1), (1, 1), (0, 0))).reshape(NP, CO)
        for b in range(NB):
            y = jax.lax.dot(xp, w1_ref[b], preferred_element_type=jnp.float32)
            y = jnp.maximum(y, 0).astype(dt)  # pad ring is relu(0)=0
            acc = jnp.zeros((MW, CM), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    off = dy * P + dx
                    acc = acc + jax.lax.dot(
                        y[off : off + MW],
                        w2_ref[b, dy, dx],
                        preferred_element_type=jnp.float32,
                    )
            y2 = (jnp.maximum(acc, 0) * mask).astype(dt)
            z = jax.lax.dot(y2, w3_ref[b], preferred_element_type=jnp.float32)
            res = xp[P + 1 : P + 1 + MW].astype(jnp.float32)
            znew = jnp.maximum(z + res, 0).astype(dt)
            xp = jnp.pad(znew, ((P + 1, P + 1), (0, 0)))
        out_ref[0] = xp[P : P + H * P].reshape(H, P, CO)[:, 1 : 1 + W, :]

    results = {}
    for name, kern in (
        ("mm_only", mm_only_kernel),
        ("conv3d", conv3d_kernel),
        ("convflat", convflat_kernel),
    ):
        fn_call = call(kern)

        def step(x, fn_call=fn_call):
            y = fn_call(x, w1, w2, w3)
            return y, y.sum().astype(jnp.float32)

        try:
            t = time_chained(step, x0)
            results[name + "_ms"] = round(t * 1e3, 3)
            print(f"{name:>9}: {t*1e3:.3f} ms", file=sys.stderr, flush=True)
        except Exception as e:  # compile failures are data too
            results[name + "_error"] = str(e)[:200]
            print(f"{name:>9}: FAILED {str(e)[:200]}", file=sys.stderr, flush=True)

    # XLA reference for the same 3-block chain.
    import flax.linen as nn

    def xla_chain(x):
        y = x
        for b in range(NB):
            h = nn.relu(
                jax.lax.conv_general_dilated(
                    y, w1[b][None, None], (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).astype(dt)
            )
            h = nn.relu(
                jax.lax.conv_general_dilated(
                    h, w2[b].reshape(3, 3, CM, CM), (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).astype(dt)
            )
            z = jax.lax.conv_general_dilated(
                h, w3[b][None, None], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = nn.relu(z + y.astype(jnp.float32)).astype(dt)
        return y

    def xla_step(x):
        y = xla_chain(x)
        return y, y.sum().astype(jnp.float32)

    t = time_chained(xla_step, x0)
    results["xla_ms"] = round(t * 1e3, 3)
    print(f"{'xla':>9}: {t*1e3:.3f} ms", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "stage_probe_ms", "batch": B, **results}))


if __name__ == "__main__":
    main()
