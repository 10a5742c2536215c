"""Generalization run on the rendered synthetic protocol (VERDICT r2 item 2).

Train/val split with DISJOINT pose/shape draws (different RNG seeds over a
continuous distribution — the probability of a shared pose is 0), images
rendered deterministically FROM the poses (`render_skeleton=True`), so a
low val MPJPE can only come from learning the image->pose map, not from
memorizing frames. Augmentation is ON (flip + rotation + scale jitter),
exercising the round-3 GT-theta transform fix; the adversarial prior trains
live against the train split's own pose pool; the IEF seed is the
dataset-derived mean (smpl/mean_params.py).

Usage (real TPU; ~10 min at the defaults):
    python benchmarks/bench_generalization.py \
        --steps 6000 --train_size 4096 --val_size 512 --batch 64 \
        --eval_every 400 --out /tmp/gen_run

Writes <out>/log.jsonl (one row per eval point) and prints a summary JSON
line; stops early when val MPJPE hasn't improved by >0.5 mm for --patience
evals (plateau).
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_size", type=int, default=4096)
    ap.add_argument("--val_size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--eval_every", type=int, default=400)
    ap.add_argument("--patience", type=int, default=4)
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--frame", type=int, default=256)
    ap.add_argument("--g_lr", type=float, default=1e-4)
    ap.add_argument("--cosine", action="store_true",
                    help="cosine-decay g_lr over --steps (tail-stabilizes "
                         "the noisy adversarial descent)")
    ap.add_argument("--encoder_dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--encoder", default="resnet50",
                    help="HMRConfig.encoder: resnet18/34/50/101 | hourglass "
                         "| vit_{ti,s,b}16")
    ap.add_argument("--smpl", choices=["xla", "pallas"], default="pallas")
    ap.add_argument("--rot_rep", choices=["aa", "rot6d"], default="aa",
                    help="IEF stream parameterization (HMRConfig.rot_rep): "
                    "additive axis-angle (reference) or continuous 6D")
    ap.add_argument("--no_adversarial", action="store_true")
    ap.add_argument("--pose_prior", action="store_true",
                    help="add the GMM pose-prior NLL (fit by EM on the train"
                         " split's pose pool) to the generator loss — with"
                         " --no_adversarial this is the discriminator-free"
                         " training mode (TPU_QUEUE item 8 A/B)")
    ap.add_argument("--pose_prior_weight", type=float, default=1e-3)
    ap.add_argument("--no_smpl_gt", action="store_true",
                    help="drop the SMPL param GT from training batches "
                    "(has_smpl=0): the keypoints-only annotation regime "
                    "SPIN exists for")
    ap.add_argument("--spin_steps", type=int, default=0,
                    help="> 0: SPIN in-graph fitting supervision "
                    "(TrainConfig.spin_fit_steps; pair with --no_smpl_gt)")
    ap.add_argument("--spin_weight", type=float, default=60.0)
    ap.add_argument("--kp_head", action="store_true",
                    help="train the 2D keypoint heatmap head alongside the"
                         " regressor (models/keypoint_head.py) — enables the"
                         " self-contained hybrid refinement path"
                         " (cli.eval --fit_source=self) on the checkpoint")
    ap.add_argument("--kp_heatmap_weight", type=float, default=100.0)
    ap.add_argument("--no_aug", action="store_true")
    ap.add_argument("--rot_mode", choices=["batch", "bucket"], default="batch",
                    help="rotation aug: one shared angle/step (batch) or "
                         "per-sample angles on an 8-point grid (bucket)")
    ap.add_argument("--echo", type=int, default=1, help="data echo factor")
    ap.add_argument("--device_bank", action="store_true",
                    help="keep the uint8 frame bank HBM-resident and gather "
                         "each batch ON DEVICE (H2D per step = 64 int32 "
                         "indices). Exact stream emulation of the host feed "
                         "(same index rng, echo repeats the draw), so "
                         "trajectories stay comparable across feed modes. "
                         "For synthetic-protocol banks that fit HBM "
                         "(8192 frames = 1.2 GB); real datasets keep the "
                         "host path.")
    ap.add_argument("--out", default="/tmp/gen_run")
    ap.add_argument("--save_checkpoint", action="store_true",
                    help="Orbax-save the trained generator (+ the mean-params"
                         " seed) to <out>/ckpt for the inference CLIs")
    ap.add_argument("--resume", action="store_true",
                    help="restore the newest <out>/ckpt step and continue to"
                         " --steps (requires --save_checkpoint). The batch"
                         " index rng restarts, so the post-resume draw order"
                         " differs from an uninterrupted run; the optimizer"
                         " state (incl. the cosine schedule count) and the"
                         " best-val tracker (re-seeded from log.jsonl) carry"
                         " over. Exists because session deaths mid-40k-run"
                         " are a fact of life here (r3 relay death, r5"
                         " session restart at step 28000).")
    ap.add_argument("--export_val", action="store_true",
                    help="write the val split to <out>/val/ as PNGs + an"
                         " h36m-style npz index so cli.eval can score the"
                         " trained checkpoint end-to-end")
    ap.add_argument("--protocol", choices=["skeleton", "mesh"],
                    default="skeleton",
                    help="image protocol: blob skeletons (r2/r3 baseline) "
                         "or shaded textured body meshes over randomized "
                         "backgrounds (r4 hardened protocol; "
                         "viz/body_render.py)")
    ap.add_argument("--seed_train", type=int, default=0)
    ap.add_argument("--seed_val", type=int, default=7777)
    args = ap.parse_args()

    from human_3d_reconstruction_tpu.api import recover_mesh_fn
    from human_3d_reconstruction_tpu.data.datasets import (
        MoshParamSource,
        SyntheticImageDataset,
    )
    from human_3d_reconstruction_tpu.data.prefetch import device_prefetch, echo_batches
    from human_3d_reconstruction_tpu.data.preprocess import preprocess_crops
    from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
    from human_3d_reconstruction_tpu.eval.metrics import mpjpe, pa_mpjpe
    from human_3d_reconstruction_tpu.models.hmr import HMRConfig
    from human_3d_reconstruction_tpu.smpl import synthetic_smpl_model
    from human_3d_reconstruction_tpu.smpl.mean_params import mean_params_from_pool
    from human_3d_reconstruction_tpu.train.trainer import (
        TrainConfig,
        create_states,
        make_jitted_train_step,
    )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    log_path = out_dir / "log.jsonl"
    if not args.resume:
        log_path.write_text("")

    def echo(msg):
        print(msg, file=sys.stderr, flush=True)

    echo(f"devices: {jax.devices()}")
    smpl_model = synthetic_smpl_model(seed=0)
    frame_hw = (args.frame, args.frame)

    t0 = time.perf_counter()
    train_ds = SyntheticImageDataset(
        smpl_model, n=args.train_size, frame_hw=frame_hw,
        seed=args.seed_train, render_mode=args.protocol,
    )
    val_ds = SyntheticImageDataset(
        smpl_model, n=args.val_size, frame_hw=frame_hw,
        seed=args.seed_val, render_mode=args.protocol,
    )
    # Disjointness sanity: nearest train pose to each of a few val poses.
    d = np.linalg.norm(
        train_ds.thetas[None, :64] - val_ds.thetas[:8, None], axis=-1
    ).min()
    assert d > 1e-3, f"val poses overlap train poses ({d})"
    echo(f"datasets built in {time.perf_counter() - t0:.1f}s; "
         f"min val-train theta distance {d:.3f}")

    dtype = jnp.bfloat16 if args.encoder_dtype == "bf16" else jnp.float32
    config = TrainConfig(
        crop_size=args.crop,
        g_lr=args.g_lr,
        use_adversarial=not args.no_adversarial,
        aug_rot_max=0.0 if args.no_aug else 0.35,
        aug_rot_mode=args.rot_mode,
        aug_scale_jitter=0.0 if args.no_aug else 0.15,
        aug_flip=not args.no_aug,
        hmr=HMRConfig(
            encoder=args.encoder, encoder_dtype=dtype, kp_head=args.kp_head,
            rot_rep=args.rot_rep,
        ),
    )
    if args.kp_head:
        import dataclasses

        config = dataclasses.replace(
            config,
            loss_weights=dataclasses.replace(
                config.loss_weights, kp_heatmap=args.kp_heatmap_weight
            ),
        )
        echo(f"keypoint heatmap head ON (w={args.kp_heatmap_weight})")
    if args.spin_steps > 0:
        import dataclasses

        config = dataclasses.replace(
            config,
            spin_fit_steps=args.spin_steps,
            loss_weights=dataclasses.replace(
                config.loss_weights, spin=args.spin_weight
            ),
        )
        echo(f"SPIN in-graph fitting ON ({args.spin_steps} steps, "
             f"w={args.spin_weight})")
    pose_prior = None
    if args.pose_prior:
        import dataclasses

        from human_3d_reconstruction_tpu.smpl import fit_pose_prior

        t0 = time.perf_counter()
        pose_prior = fit_pose_prior(train_ds.thetas)  # same pool the D sees
        config = dataclasses.replace(
            config,
            loss_weights=dataclasses.replace(
                config.loss_weights, pose_prior=args.pose_prior_weight
            ),
        )
        echo(f"pose prior fit on {len(train_ds.thetas)} train poses in "
             f"{time.perf_counter() - t0:.1f}s "
             f"(K={pose_prior.means.shape[0]}, w={args.pose_prior_weight})")
    mean = mean_params_from_pool(train_ds.thetas, train_ds.betas)
    from human_3d_reconstruction_tpu.train.trainer import gate_flip_aug

    config = gate_flip_aug(config, smpl_model.as_dict(), echo=echo)
    gen, disc, model, disc_mod, g_tx, d_tx = create_states(
        config, jax.random.key(0), smpl_model.as_dict(), mean_params=mean
    )
    if args.cosine:
        import optax

        g_tx = optax.adamw(
            optax.cosine_decay_schedule(args.g_lr, args.steps, alpha=0.05),
            b1=config.adam_b1, b2=config.adam_b2,
            weight_decay=config.weight_decay,
        )
        gen = gen.replace(opt_state=g_tx.init(gen.params))
    smpl_apply = None
    smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())
    if args.smpl == "pallas":
        from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
        from human_3d_reconstruction_tpu.ops.fused_smpl import smpl_forward_fused

        prepared = prepare_fused_smpl(smpl_model.as_dict())
        smpl_apply = lambda _, t, b: smpl_forward_fused(prepared, t, b)
    step_fn = make_jitted_train_step(
        config, model, disc_mod, g_tx, d_tx, smpl_apply=smpl_apply,
        pose_prior=pose_prior,
    )

    mosh = MoshParamSource(train_ds.thetas, train_ds.betas)  # train split ONLY
    mosh_rng = np.random.default_rng(123)

    # This host has ONE core: per-batch float32 collate + uint8 cast would
    # cap throughput ~10x below the device step. Pre-render the whole train
    # split into a uint8 bank once (it IS the epoch — images are a pure
    # function of the pose), then batches are one fancy-index memcpy.
    t0 = time.perf_counter()
    bank = np.stack(
        [np.clip(np.rint(train_ds[i].image), 0, 255).astype(np.uint8)
         for i in range(args.train_size)]
    )
    kp_bank = np.stack([
        np.concatenate(
            [train_ds.kp2d_px[i], np.ones((train_ds.kp2d_px.shape[1], 1), np.float32)],
            axis=1,
        )
        for i in range(args.train_size)
    ])
    echo(f"rendered {args.train_size}-frame uint8 bank "
         f"({bank.nbytes / 1e9:.1f} GB) in {time.perf_counter() - t0:.0f}s")

    def batch_stream():
        rng_b = np.random.default_rng(1)
        ones = np.ones((args.batch,), np.float32)
        while True:
            idx = rng_b.integers(0, args.train_size, args.batch)
            yield {
                "images": bank[idx],
                "centers": train_ds.centers[idx],
                "scales": train_ds.scales[idx],
                "kp2d": kp_bank[idx],
                "joints3d": train_ds.joints3d[idx].astype(np.float32),
                "has_3d": ones,
                "theta": train_ds.thetas[idx],
                "beta": train_ds.betas[idx],
                "has_smpl": np.zeros_like(ones) if args.no_smpl_gt else ones,
            }

    if args.device_bank:
        # HBM-resident epoch: the bank IS the dataset (a pure function of
        # the poses), so park it on device once and gather each batch there
        # — the per-step H2D drops from ~10 MB of frames to 64 int32
        # indices. On this ~30 MB/s tunneled host that is the difference
        # between feed-bound (~600-800 img/s effective) and step-bound
        # (~2k img/s). The index sequence and echo grouping replicate the
        # host feed exactly (same rng seed, echo repeats the draw), so the
        # trained trajectory is comparable across feed modes.
        dev_bank = {
            "images": jnp.asarray(bank),
            "centers": jnp.asarray(train_ds.centers),
            "scales": jnp.asarray(train_ds.scales),
            "kp2d": jnp.asarray(kp_bank),
            "joints3d": jnp.asarray(train_ds.joints3d.astype(np.float32)),
            "theta": jnp.asarray(train_ds.thetas),
            "beta": jnp.asarray(train_ds.betas),
        }
        ones_d = jnp.ones((args.batch,), jnp.float32)
        has_smpl_d = jnp.zeros_like(ones_d) if args.no_smpl_gt else ones_d

        # The bank MUST be a jit argument, not a closure capture: closed-over
        # concrete arrays lower as computation constants, and this platform's
        # remote-compile transport ships constants WITH the compile request —
        # a 1.6 GB bank breaks the HTTP pipe (r5, observed twice: both
        # device_bank arms died at the first gather with
        # UNAVAILABLE .../remote_compile: Broken pipe). As an argument it is
        # just a shape in the request and stays HBM-resident between calls.
        @jax.jit
        def gather_batch(bank_d, idx):
            b = {k: jnp.take(v, idx, axis=0) for k, v in bank_d.items()}
            b["has_3d"] = ones_d
            b["has_smpl"] = has_smpl_d
            return b

        def device_stream():
            rng_b = np.random.default_rng(1)
            while True:
                idx = jnp.asarray(
                    rng_b.integers(0, args.train_size, args.batch)
                )
                g = gather_batch(dev_bank, idx)
                for _ in range(args.echo):
                    yield g

        batches = device_stream()
        echo(f"device bank: {bank.nbytes / 1e9:.1f} GB HBM-resident")
    else:
        batches = device_prefetch(batch_stream())
        if args.echo > 1:
            batches = echo_batches(batches, args.echo)

    # --- one-program val scorer (images stream as uint8) ----------------
    @jax.jit
    def predict_and_score(variables, images_u8, centers, scales, gt):
        crops = preprocess_crops(
            images_u8.astype(jnp.float32), centers, scales, out_size=args.crop
        )
        out = recover_mesh_fn(model, variables, smpl_params, crops)
        pred = out.eval_joints3d[:, :NUM_KP]

        def one(p, g):
            return mpjpe(p[None], g[None]) * 1000.0, pa_mpjpe(p[None], g[None]) * 1000.0

        return jax.vmap(one)(pred, gt)

    def eval_split(ds, n, variables):
        es, eps = [], []
        for start in range(0, n, args.batch):
            recs = [ds[i] for i in range(start, start + args.batch)]
            e, ep = jax.device_get(
                predict_and_score(
                    variables,
                    jnp.asarray(np.stack([np.clip(np.rint(r.image), 0, 255).astype(np.uint8) for r in recs])),
                    jnp.asarray(np.stack([r.center for r in recs])),
                    jnp.asarray(np.stack([r.scale for r in recs])),
                    jnp.asarray(np.stack([r.joints3d for r in recs])),
                )
            )
            es.append(e); eps.append(ep)
        return float(np.mean(np.concatenate(es))), float(np.mean(np.concatenate(eps)))

    train_eval_n = min(args.val_size, args.train_size)

    # Checkpointing DURING the run (VERDICT r4 #3): the r3 40k run saved
    # only at the end and its 59.6 mm artifact died with the relay. Now the
    # mean seed lands on disk before step 0, the latest state saves at
    # every eval point (max_to_keep=3), and the best-val state keeps its
    # own single-slot manager at <out>/ckpt/best — any interruption leaves
    # a scoreable checkpoint behind.
    mgr = best_mgr = None
    if args.save_checkpoint:
        from human_3d_reconstruction_tpu.smpl.mean_params import (
            mean_params_file,
            save_mean_params,
        )
        from human_3d_reconstruction_tpu.train.trainer import (
            make_checkpoint_manager,
            save_checkpoint,
        )

        ckpt_dir = out_dir / "ckpt"
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        mgr = make_checkpoint_manager(str(ckpt_dir))
        best_mgr = make_checkpoint_manager(str(ckpt_dir / "best"), max_to_keep=1)
        save_mean_params(mean_params_file(ckpt_dir), mean)
        echo(f"checkpointing every eval to {ckpt_dir} (best at {ckpt_dir}/best)")

    start_step = 0
    if args.resume:
        if mgr is None:
            raise SystemExit("--resume requires --save_checkpoint")
        from human_3d_reconstruction_tpu.train.trainer import restore_latest

        gen, disc, start_step = restore_latest(mgr, gen, disc)
        echo(f"resumed from checkpoint step {start_step}"
             if start_step else "resume requested but no checkpoint yet — "
             "starting fresh")

    best = float("inf")
    best_step = 0
    since_best = 0
    if start_step and log_path.exists():
        # Replay the best-val tracker over the logged history (and drop any
        # rows past the restored step — normally none, since a checkpoint
        # lands at every eval point, but a death between the log append and
        # the save would leave one).
        kept = []
        for line in log_path.read_text().splitlines():
            if not line:
                continue
            row = json.loads(line)
            if row["step"] > start_step:
                continue
            kept.append(line)
            if row["val_mpjpe_mm"] < best - 0.5:
                best, best_step, since_best = row["val_mpjpe_mm"], row["step"], 0
            else:
                since_best += 1
        log_path.write_text("".join(r + "\n" for r in kept))
        echo(f"best-val tracker re-seeded: {best:.1f} mm at step {best_step} "
             f"({since_best} evals since)")

    rng_key = jax.random.key(42)
    t_train = time.perf_counter()
    imgs_done = 0
    step = start_step
    while step < args.steps:
        batch = next(batches)
        mt, mb = mosh.sample(mosh_rng, args.batch)
        gen, disc, metrics = step_fn(
            gen, disc, smpl_params, batch, jnp.asarray(mt), jnp.asarray(mb), rng_key
        )
        step += 1
        imgs_done += args.batch
        if step % 200 == 0:
            # Bound the async dispatch queue: without a periodic sync the
            # runner enqueues every step between evals, pinning each
            # queued batch's host buffers (~12 MB each -> tens of GB over
            # a 2000-step eval interval; observed as unbounded RSS growth
            # and paging stalls on 40k-step runs). One scalar readback per
            # 200 steps costs ~one tunnel round-trip (~27 ms).
            float(metrics["loss_g"])

        if step % args.eval_every == 0 or step == args.steps:
            m = {k: float(v) for k, v in metrics.items()}  # sync point
            dt = time.perf_counter() - t_train
            variables = {"params": gen.params, "batch_stats": gen.batch_stats}
            val_mpjpe, val_pa = eval_split(val_ds, args.val_size, variables)
            tr_mpjpe, tr_pa = eval_split(train_ds, train_eval_n, variables)
            row = {
                "step": step,
                "img_per_sec": imgs_done / dt if dt > 0 else 0.0,
                "loss_g": m["loss_g"], "loss_kp2d": m["loss_kp2d"],
                "loss_3d": m["loss_3d"], "loss_param": m["loss_param"],
                **({"loss_d": m["loss_d"]} if "loss_d" in m else {}),
                "train_mpjpe_mm": tr_mpjpe, "train_pa_mpjpe_mm": tr_pa,
                "val_mpjpe_mm": val_mpjpe, "val_pa_mpjpe_mm": val_pa,
            }
            with open(log_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            echo(f"step {step}: train {tr_mpjpe:.1f} mm | VAL {val_mpjpe:.1f} mm "
                 f"(PA {val_pa:.1f}) | {row['img_per_sec']:.0f} img/s")
            t_train = time.perf_counter()
            imgs_done = 0

            if mgr is not None:
                save_checkpoint(mgr, step, gen, disc)
            if val_mpjpe < best - 0.5:
                best, best_step, since_best = val_mpjpe, step, 0
                if best_mgr is not None:
                    save_checkpoint(best_mgr, step, gen, disc)
            else:
                since_best += 1
                if since_best >= args.patience:
                    echo(f"plateau: no val improvement for {since_best} evals")
                    break

    if mgr is not None:
        # Final state (idempotent when the loop just saved this step).
        if step not in (mgr.all_steps() or []):
            save_checkpoint(mgr, step, gen, disc)
        mgr.wait_until_finished()
        best_mgr.wait_until_finished()
        echo(f"checkpoints + mean seed saved under {out_dir / 'ckpt'} "
             f"(best step {best_step}: {best:.1f} mm)")

    if args.export_val:
        # h36m-style index: scatter the LSP-14 annotations into the 17-slot
        # H36M layout the adapter's gather tables expect.
        import cv2

        from human_3d_reconstruction_tpu.data.skeleton import H36M_TO_LSP14

        val_dir = out_dir / "val"
        (val_dir / "images").mkdir(parents=True, exist_ok=True)
        N = args.val_size
        kp17 = np.zeros((N, 17, 3), np.float32)
        j17 = np.zeros((N, 17, 3), np.float32)
        paths = []
        for i in range(N):
            rec = val_ds[i]
            kp17[i, H36M_TO_LSP14] = rec.kp2d
            j17[i, H36M_TO_LSP14] = rec.joints3d
            p = f"images/val_{i:05d}.png"
            cv2.imwrite(
                str(val_dir / p),
                cv2.cvtColor(
                    np.clip(rec.image, 0, 255).astype(np.uint8), cv2.COLOR_RGB2BGR
                ),
            )
            paths.append(p)
        np.savez_compressed(
            val_dir / "index.npz",
            image_paths=np.asarray(paths),
            centers=val_ds.centers,
            scales=val_ds.scales,
            keypoints=kp17,
            joints3d=j17,
            actions=(np.arange(N) % 15).astype(np.int64),
        )
        echo(f"val split exported: {val_dir}/index.npz ({N} frames)")

    summary = {
        "best_val_mpjpe_mm": best,
        "best_step": best_step,
        "final_step": step,
        "train_size": args.train_size,
        "val_size": args.val_size,
        "aug": not args.no_aug,
        "adversarial": not args.no_adversarial,
        "pose_prior": args.pose_prior,
        "kp_head": args.kp_head,
        "encoder": args.encoder,
        "encoder_dtype": args.encoder_dtype,
        "rot_rep": args.rot_rep,
        "no_smpl_gt": args.no_smpl_gt,
        "spin_steps": args.spin_steps,
        "log": str(log_path),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
