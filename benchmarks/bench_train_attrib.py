"""Train-step attribution: where do the 55.5 ms @B=128 go? (VERDICT r2 #8)

Applies bench_attrib.py's scan-chain method (in-jit lax.scan with evolving
carries, scalar-readback sync — the only reliable timing on the tunneled
platform) to CUMULATIVE slices of the fused G+D train step:

    prep        on-device crop/aug/normalize + GT transforms
    + G fwd     encoder + IEF + SMPL decode + losses (value only)
    + head bwd  grad wrt regressor params only (IEF + SMPL + loss VJPs;
                no encoder backward exists on this path)
    + full bwd  grad wrt ALL generator params (adds the encoder backward)
    + G opt     adamw update + apply
    + D step    discriminator fwd/bwd/opt  == the complete train step

Differences between consecutive rows attribute each section; the roofline
compares against 3x encoder fwd FLOPs (fwd + input-grad + weight-grad
matmuls) at v5e peak. Each slice's carry feeds its next input, so neither
XLA nor the tunnel relay can fold the chain.

Usage: python benchmarks/bench_train_attrib.py [--batch 128] [--reps 8]
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
PEAK_GBS = 819.0


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
    ap.add_argument("--encoder_dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--smpl", choices=["xla", "pallas"], default="pallas")
    args = ap.parse_args()
    B = args.batch

    from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
    from human_3d_reconstruction_tpu.models.hmr import HMRConfig
    from human_3d_reconstruction_tpu.models.regressor import split_params
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model
    from human_3d_reconstruction_tpu.smpl.forward import smpl_forward
    from human_3d_reconstruction_tpu.train import losses as L
    from human_3d_reconstruction_tpu.train.trainer import (
        TrainConfig,
        _device_preprocess,
        create_states,
        make_train_step,
    )
    from human_3d_reconstruction_tpu.utils.geometry import orthographic_project

    print(f"devices: {jax.devices()}  batch={B}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)

    dtype = jnp.bfloat16 if args.encoder_dtype == "bf16" else jnp.float32
    config = TrainConfig(
        aug_rot_max=0.35, aug_scale_jitter=0.15, aug_flip=True,
        hmr=HMRConfig(encoder_dtype=dtype),
    )
    smpl_model = synthetic_smpl_model(seed=0)
    gen, disc_state, model, disc_mod, g_tx, d_tx = create_states(
        config, jax.random.key(0), smpl_model.as_dict()
    )
    smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())
    if args.smpl == "pallas":
        from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
        from human_3d_reconstruction_tpu.ops.fused_smpl import smpl_forward_fused

        prepared = prepare_fused_smpl(smpl_model.as_dict())
        smpl_apply = lambda _, t, b: smpl_forward_fused(prepared, t, b)
    else:
        smpl_apply = smpl_forward

    batch = {
        "images": jnp.asarray(rng.integers(0, 255, (B, 256, 256, 3)).astype(np.uint8)),
        "centers": jnp.tile(jnp.asarray([[128.0, 128.0]]), (B, 1)),
        "scales": jnp.full((B,), 200.0),
        "kp2d": jnp.asarray(
            np.concatenate([rng.uniform(30, 220, (B, NUM_KP, 2)), np.ones((B, NUM_KP, 1))], 2)
            .astype(np.float32)),
        "joints3d": jnp.asarray(rng.normal(scale=0.3, size=(B, NUM_KP, 3)).astype(np.float32)),
        "has_3d": jnp.ones((B,)),
        "theta": jnp.asarray(rng.normal(scale=0.2, size=(B, 72)).astype(np.float32)),
        "beta": jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32)),
        "has_smpl": jnp.ones((B,)),
    }
    mosh_t = jnp.asarray(rng.normal(scale=0.2, size=(B, 72)).astype(np.float32))
    mosh_b = jnp.asarray(rng.normal(size=(B, 10)).astype(np.float32))
    w = config.loss_weights

    # --- loss body (mirrors trainer.make_train_step's gen_loss_fn; keep in
    # sync — duplicated here so slices can cut at points the closure hides).
    def gen_loss(g_params, batch_stats, crops, kp2d, vis, j3d, gt_theta, step_i):
        out, _ = model.apply(
            {"params": g_params, "batch_stats": batch_stats},
            crops, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)},
        )
        total = 0.0
        T = out.all_params.shape[0]
        for t in range(T):
            theta_t, beta_t, cam_t = split_params(out.all_params[t])
            so = smpl_apply(smpl_params, theta_t, beta_t)
            p3 = so.eval_joints[:, :NUM_KP]
            p2 = orthographic_project(p3, cam_t)
            total = total + (
                w.kp2d * L.keypoint_2d_loss(p2, kp2d, vis)
                + w.joints3d * L.joints_3d_loss(p3, j3d, batch["has_3d"])
                + w.smpl_params * L.smpl_param_loss(theta_t, beta_t, gt_theta, batch["beta"], batch["has_smpl"])
            ) / T
        return total

    def prep(step_i):
        r = jax.random.fold_in(jax.random.key(1), step_i)
        return _device_preprocess(config, batch, r)

    # --- cumulative slices, each fn: (gen_state, i) -> scalar -------------
    def s_prep(g, i):
        crops, kp2d, vis, j3d, gt_theta = prep(i)
        return crops.astype(jnp.float32).sum() * 1e-12 + kp2d.sum() * 1e-12

    def s_fwd(g, i):
        crops, kp2d, vis, j3d, gt_theta = prep(i)
        return gen_loss(g.params, g.batch_stats, crops, kp2d, vis, j3d, gt_theta, i)

    def s_head_bwd(g, i):
        crops, kp2d, vis, j3d, gt_theta = prep(i)
        head = {"regressor": g.params["regressor"]}

        def f(h):
            p = {**g.params, "regressor": h["regressor"]}
            return gen_loss(p, g.batch_stats, crops, kp2d, vis, j3d, gt_theta, i)

        val, grads = jax.value_and_grad(f)(head)
        return val + jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: x.sum() * 1e-12, grads)
        )

    def s_full_bwd(g, i):
        crops, kp2d, vis, j3d, gt_theta = prep(i)
        val, grads = jax.value_and_grad(
            lambda p: gen_loss(p, g.batch_stats, crops, kp2d, vis, j3d, gt_theta, i)
        )(g.params)
        return val + jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda x: x.sum() * 1e-12, grads)
        )

    full_step = make_train_step(config, model, disc_mod, g_tx, d_tx, smpl_apply=smpl_apply)

    INNER = args.inner

    def time_scalar_slice(fn):
        """Chain: perturb one param leaf by the scalar so steps can't fold."""

        @jax.jit
        def run(g):
            def body(g, i):
                s = fn(g, i)
                new_p = {**g.params}
                reg = {**new_p["regressor"]}
                reg["fc1"] = {**reg["fc1"], "bias": reg["fc1"]["bias"] + s * 1e-12}
                new_p["regressor"] = reg
                return g.replace(params=new_p), s

            g2, ss = jax.lax.scan(body, g, jnp.arange(INNER))
            return g2, ss[-1]

        g, s = run(gen)
        float(s)
        g, s = run(g)
        float(s)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            g, s = run(g)
        float(s)
        return (time.perf_counter() - t0) / (args.reps * INNER)

    def time_gopt():
        g_tx_local = g_tx

        @jax.jit
        def run(carry):
            def body(carry, i):
                g, opt = carry
                crops, kp2d, vis, j3d, gt_theta = prep(i)
                val, grads = jax.value_and_grad(
                    lambda p: gen_loss(p, g.batch_stats, crops, kp2d, vis, j3d, gt_theta, i)
                )(g.params)
                import optax

                upd, opt2 = g_tx_local.update(grads, opt, g.params)
                g2 = g.replace(params=optax.apply_updates(g.params, upd))
                return (g2, opt2), val

            c2, ss = jax.lax.scan(body, carry, jnp.arange(INNER))
            return c2, ss[-1]

        c, s = run((gen, gen.opt_state))
        float(s)
        c, s = run(c)
        float(s)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            c, s = run(c)
        float(s)
        return (time.perf_counter() - t0) / (args.reps * INNER)

    def time_full():
        @jax.jit
        def run(carry):
            def body(carry, i):
                g, d = carry
                g2, d2, metrics = full_step(
                    g, d, smpl_params, batch, mosh_t, mosh_b, jax.random.key(2)
                )
                return (g2, d2), metrics["loss_g"]

            c2, ss = jax.lax.scan(body, carry, jnp.arange(INNER))
            return c2, ss[-1]

        c, s = run((gen, disc_state))
        float(s)
        c, s = run(c)
        float(s)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            c, s = run(c)
        float(s)
        return (time.perf_counter() - t0) / (args.reps * INNER)

    rows = []
    prev = 0.0
    for name, timer in (
        ("prep", lambda: time_scalar_slice(s_prep)),
        ("+G fwd", lambda: time_scalar_slice(s_fwd)),
        ("+head bwd", lambda: time_scalar_slice(s_head_bwd)),
        ("+full bwd", lambda: time_scalar_slice(s_full_bwd)),
        ("+G opt", time_gopt),
        ("+D step (full)", time_full),
    ):
        dt = timer() * 1e3
        rows.append({"slice": name, "cum_ms": round(dt, 2), "delta_ms": round(dt - prev, 2)})
        print(f"{name:>16}: cumulative {dt:7.2f} ms  (+{dt - prev:6.2f} ms)",
              file=sys.stderr, flush=True)
        prev = dt

    # Roofline: encoder fwd ~ 523 GFLOP @B=128 (bench_attrib table); train
    # ~ 3x (fwd + dL/dx + dL/dw matmuls). SMPL fwd+bwd and the heads are
    # <2% of that. Report light-speed for the G fwd+bwd portion.
    enc_fwd_gflop = 4.09 * B  # per-image ResNet-50 @224
    t_fwd = enc_fwd_gflop / PEAK_TFLOPS
    t_train = 3 * enc_fwd_gflop / PEAK_TFLOPS
    print(
        f"roofline: encoder fwd {t_fwd:.1f} ms, fwd+bwd (3x) {t_train:.1f} ms "
        f"at {PEAK_TFLOPS:.0f} bf16 TFLOP/s",
        file=sys.stderr, flush=True,
    )
    print(json.dumps({
        "metric": "train_attribution_ms", "batch": B,
        "encoder_dtype": args.encoder_dtype, "smpl": args.smpl,
        "slices": rows,
        "roofline_fwd_bwd_ms": round(t_train, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
