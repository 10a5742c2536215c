"""Per-stage attribution + roofline for the serving pipeline on the chip.

Times cumulative encoder prefixes (stem, +stage1, ..., +stage4), the
preprocess, the SMPL decode, and the full pipeline — each as its own jitted
program with EVOLVING input buffers chained on the previous output (the
tunnel relay memoizes repeated identical dispatches; see BASELINE.md note).

Also prints an analytic roofline per stage: conv FLOPs vs activation bytes,
so "X% of peak MXU" can be separated into compute-bound vs bandwidth-bound
(TPU v5e: ~197 bf16 TFLOP/s, ~819 GB/s HBM).

Usage: python benchmarks/bench_attrib.py [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_GBS = 819.0     # v5e HBM


def stage_roofline(batch: int):
    """(name, GFLOP, GB activation traffic) per ResNet-50 section @224."""
    # Per-image conv FLOPs (multiply-accumulate*2) and activation bytes
    # (bf16, write+read of each layer output once — the fusion-optimal bound).
    def conv(h, cin, cout, k):
        return 2 * h * h * cin * cout * k * k

    rows = []
    # stem (s2d form: 112^2 x 192 x 64 x 4x4 == conv7 FLOPs)
    f = conv(112, 12, 64, 4)
    a = (112 * 112 * 64) * 2 * 2  # out write+read
    rows.append(("stem+pool", f, a))
    specs = [  # (spatial, cin_block, mid, cout, n_blocks)
        (56, 64, 64, 256, 3),
        (28, 256, 128, 512, 4),
        (14, 512, 256, 1024, 6),
        (7, 1024, 512, 2048, 3),
    ]
    for h, cin, mid, cout, n in specs:
        f = 0
        a = 0
        for b in range(n):
            c_in = cin if b == 0 else cout
            s = 2 if (b == 0 and h != 56) else 1
            f += conv(h, c_in, mid, 1) * (s * s)  # 1x1 at input spatial
            f += conv(h, mid, mid, 3)
            f += conv(h, mid, cout, 1)
            if b == 0:
                f += conv(h, c_in, cout, 1) * (s * s)
            # activations: three intermediate outputs + block output
            a += (h * h * (mid + mid + cout + cout)) * 2 * 2
        rows.append((f"stage{specs.index((h, cin, mid, cout, n)) + 1}", f, a))
    return [
        (name, f * batch / 1e9, a * batch / 1e9) for name, f, a in rows
    ]


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

    configure_compile_cache(5.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=15)
    args = ap.parse_args()
    B = args.batch

    from human_3d_reconstruction_tpu.models.resnet import ResNet50, ResNetConfig
    from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
    from human_3d_reconstruction_tpu.ops.fused_smpl import smpl_forward_fused
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model
    from human_3d_reconstruction_tpu.data.preprocess import preprocess_crops

    print(f"devices: {jax.devices()}  batch={B}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)

    INNER = 10  # lax.scan steps per dispatch: amortizes the ~ms tunnel
    # dispatch overhead that would otherwise dominate sub-ms programs. The
    # carry feeds each output back into the next input, so neither XLA nor
    # the relay can fold the chain (BASELINE.md measurement-trap note).

    def time_chained(fn, x0, reps):
        """fn: x -> (next_x, scalar); per-step time of an in-jit scan chain."""

        @jax.jit
        def run(x):
            def body(x, _):
                x2, s = fn(x)
                return x2, s

            xf, ss = jax.lax.scan(body, x, None, length=INNER)
            return xf, ss[-1]

        x, s = run(x0)
        float(s)  # sync via readback
        x, s = run(x)
        float(s)
        t0 = time.perf_counter()
        for _ in range(reps):
            x, s = run(x)
        float(s)
        return (time.perf_counter() - t0) / (reps * INNER)

    results = {}

    # Encoder prefixes (fresh params; timing only). bf16 + s2d serving graph.
    stage_prefixes = [(), (3,), (3, 4), (3, 4, 6), (3, 4, 6, 3)]
    imgs = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    prev = 0.0
    cum = []
    for stages in stage_prefixes:
        cfg = ResNetConfig(stage_sizes=stages, stem="s2d", fold_bn=True, dtype=jnp.bfloat16)
        enc = ResNet50(config=cfg)
        variables = enc.init(jax.random.key(0), imgs[:1])

        def step(x, enc=enc, variables=variables):
            out = enc.apply(variables, x)
            # evolve the input so the tunnel can't memoize; scalar for sync
            return x + (out.sum() * 1e-12).astype(x.dtype), out.sum()

        dt = time_chained(step, imgs, args.reps)
        name = "stem+pool" if not stages else f"+stage{len(stages)}"
        cum.append((name, dt))
        print(f"{name:>10}: cumulative {dt*1e3:7.2f} ms  (+{(dt-prev)*1e3:6.2f} ms)",
              file=sys.stderr, flush=True)
        results[f"enc_{name}"] = round((dt - prev) * 1e3, 2)
        prev = dt
    results["encoder_total_ms"] = round(prev * 1e3, 2)

    # Roofline table.
    print("\nroofline (per stage, this batch):", file=sys.stderr)
    for name, gflop, gb in stage_roofline(B):
        t_flop = gflop / PEAK_TFLOPS  # ms (GFLOP / TFLOPs = ms)
        t_bw = gb / PEAK_GBS * 1e3
        print(
            f"{name:>8}: {gflop:7.1f} GFLOP -> {t_flop:5.2f} ms MXU-bound | "
            f"{gb:6.2f} GB -> {t_bw:5.2f} ms BW-bound | light={max(t_flop, t_bw):5.2f} ms",
            file=sys.stderr, flush=True,
        )

    # Preprocess alone.
    frames = jnp.asarray(rng.uniform(0, 255, (B, 256, 256, 3)).astype(np.float32))
    centers = jnp.tile(jnp.asarray([[128.0, 128.0]]), (B, 1))
    scales = jnp.full((B,), 200.0)

    def prep_step(x):
        crops = preprocess_crops(x, centers, scales, out_size=224)
        return x + (crops.sum() * 1e-12).astype(x.dtype), crops.sum()

    results["preprocess_ms"] = round(time_chained(prep_step, frames, args.reps) * 1e3, 2)

    # SMPL decode alone (fused Pallas).
    smpl_model = synthetic_smpl_model(seed=0)
    prepared = prepare_fused_smpl(smpl_model.as_dict())
    pose = jnp.asarray(rng.normal(0, 0.3, (B, 72)).astype(np.float32))
    betas = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))

    def smpl_step(p):
        out = smpl_forward_fused(prepared, p, betas)
        return p + (out.verts.sum() * 1e-12).astype(p.dtype), out.verts.sum()

    results["smpl_decode_ms"] = round(time_chained(smpl_step, pose, args.reps) * 1e3, 2)

    print(json.dumps({"metric": "attribution_ms", "batch": B, **results}))


if __name__ == "__main__":
    main()
