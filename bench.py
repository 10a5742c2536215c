"""Driver benchmark: mesh-recovery throughput on one TPU chip vs torch-CPU.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

- value: frames/sec of the flagship jitted image->mesh program (preprocess
  + ResNet-50 + IEF x3 + SMPL decode + projection) on the real chip.
- vs_baseline: ratio over the torch-CPU reference pipeline on this host
  (the BASELINE.json denominator; its measurement is cached in
  benchmarks/cpu_baseline.json because it is slow and host-stable).

Extra context (p50 latency, batch sweep) goes to stderr so the stdout
contract stays a single JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BATCH = 128  # measured sweet spot: 64 -> 7.2k img/s, 128 -> 10.2k img/s
CPU_BASELINE_CACHE = REPO / "benchmarks" / "cpu_baseline.json"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def get_cpu_baseline(smpl_model) -> float:
    if CPU_BASELINE_CACHE.exists():
        cached = json.loads(CPU_BASELINE_CACHE.read_text())
        log(f"cpu baseline (cached): {cached['images_per_sec']:.2f} img/s")
        return float(cached["images_per_sec"])
    from benchmarks.torch_reference import measure_cpu_baseline

    log("measuring torch-CPU reference baseline (one-time)...")
    ips = measure_cpu_baseline(smpl_model, batch_size=8, repeats=5)
    CPU_BASELINE_CACHE.write_text(
        json.dumps({"images_per_sec": ips, "batch_size": 8, "note": "torch-CPU TorchHMR eval"})
    )
    log(f"cpu baseline (measured): {ips:.2f} img/s")
    return ips


def main() -> None:
    from human_3d_reconstruction_tpu.utils.tunnel import check_tpu_tunnel

    check_tpu_tunnel()  # fail in seconds, not hang, if the relay died

    import numpy as np
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the flagship program costs minutes to build
    # on the remote-compile tunnel; cache it across bench invocations.
    from human_3d_reconstruction_tpu.utils.compile_cache import configure_compile_cache

    configure_compile_cache(5.0)

    from human_3d_reconstruction_tpu.models import HMRConfig, HMRModel
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model

    from human_3d_reconstruction_tpu.ops import prepare_fused_smpl

    smpl_model = synthetic_smpl_model(seed=0)
    cpu_ips = get_cpu_baseline(smpl_model)

    log(f"devices: {jax.devices()}")
    # Production serving config: bf16 encoder (MXU fast path) + f32 SMPL
    # decode (holds the 1e-3 m parity bar — SMPL-space math never in bf16),
    # with the serving graph rewrite (space-to-depth stem + folded BN —
    # exact reparameterizations, equivalence-tested in tests/test_models.py).
    from human_3d_reconstruction_tpu.models.hmr import optimize_for_serving

    encoder = "resnet50"
    if "--encoder" in sys.argv:
        # Opt-in encoder swap (e.g. vit_s16): measures the same fused
        # image->mesh program with a different backbone. The stdout
        # contract is unchanged; the headline default stays resnet50.
        encoder = sys.argv[sys.argv.index("--encoder") + 1]
        log(f"encoder: {encoder}")
    train_config = HMRConfig(encoder=encoder, encoder_dtype=jnp.bfloat16)
    train_model = HMRModel(config=train_config)
    trained_vars = train_model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    if "--int8" in sys.argv or "--int8-static" in sys.argv:
        # W8A8 encoder (percent-level drift, tests/test_quant.py) — opt-in
        # because the default bench config is the numerically-exact serving
        # rewrite. --int8-static uses calibrated activation scales (no
        # in-graph max pass; the int8 cast fuses into producer epilogues).
        from human_3d_reconstruction_tpu.models.quant import (
            HMRModelInt8,
            calibrate_activation_scales,
            quantize_hmr_for_serving,
        )

        static = "--int8-static" in sys.argv
        serve_config, variables = quantize_hmr_for_serving(
            train_config, trained_vars, static_scale=static
        )
        model = HMRModelInt8(config=serve_config, static_scale=static)
        if static:
            calib = jnp.asarray(
                np.random.default_rng(7).normal(size=(8, 224, 224, 3)).astype(np.float32)
            )
            variables = calibrate_activation_scales(model, variables, calib)
        log(f"encoder: int8 W8A8 ({'static' if static else 'dynamic'} act scales)")
    elif encoder.startswith("resnet"):
        serve_config, variables = optimize_for_serving(train_config, trained_vars)
        model = HMRModel(config=serve_config)
    else:
        # ViT/hourglass: no BN to fold, no stem to rewrite — the training
        # graph IS the serving graph.
        model, variables = train_model, trained_vars
    smpl_params = prepare_fused_smpl(smpl_model.as_dict())
    from human_3d_reconstruction_tpu.api import make_recover_from_frames

    recover_frames = make_recover_from_frames(model, smpl_path="pallas")

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (BATCH, 256, 256, 3)).astype(np.float32))
    centers = jnp.tile(jnp.asarray([[128.0, 128.0]]), (BATCH, 1))
    scales = jnp.full((BATCH,), 200.0)

    def pipeline(x):
        # ONE fused device program: preprocess + encoder + IEF + SMPL decode.
        return recover_frames(variables, smpl_params, x, centers, scales)

    def chained_step(x):
        # Chain the next input on this step's output: steps cannot be
        # skipped or reordered, yet the host never blocks mid-stream —
        # measures true serving throughput without the tunnel's ~27 ms
        # per-call round-trip.
        out = pipeline(x)
        return x + out.theta.sum() * 0.0, out

    def sync(out) -> float:
        # On the tunneled axon platform block_until_ready can return before
        # execution completes (measured: 0.5 ms/step "throughput" for a
        # 36 ms program). A scalar device->host readback cannot lie.
        return float(out.verts.sum())

    # Warmup/compile.
    t0 = time.perf_counter()
    sync(pipeline(frames))
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")
    for _ in range(3):
        sync(pipeline(frames))

    # Per-step synced latency (includes host round-trip).
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(pipeline(frames))
    dt_synced = (time.perf_counter() - t0) / reps
    log(
        f"synced: {BATCH / dt_synced:.0f} img/s (batch {BATCH}, "
        f"{dt_synced*1e3:.1f} ms/step incl. host round-trip)"
    )

    # Headline: pipelined steady-state throughput (one readback at the end).
    x, out = chained_step(frames)
    sync(out)
    reps = 20
    x = frames
    t0 = time.perf_counter()
    for _ in range(reps):
        x, out = chained_step(x)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    tpu_ips = BATCH / dt
    log(f"pipelined throughput: {tpu_ips:.0f} img/s ({dt*1e3:.1f} ms/step)")

    # p50 single-image latency (batch-1 program).
    img1 = frames[:1]
    c1, s1 = centers[:1], scales[:1]

    def one():
        return recover_frames(variables, smpl_params, img1, c1, s1)

    sync(one())
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        sync(one())
        lats.append(time.perf_counter() - t0)
    p50 = sorted(lats)[len(lats) // 2]
    log(f"p50 per-image latency (batch 1): {p50*1e3:.2f} ms")

    print(
        json.dumps(
            {
                "metric": "mesh_recovery_throughput",
                "value": round(tpu_ips, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(tpu_ips / cpu_ips, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
