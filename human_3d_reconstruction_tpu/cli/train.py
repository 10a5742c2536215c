"""Training CLI: alternating adversarial HMR training (BASELINE configs 2/3).

Usage:
    python -m human_3d_reconstruction_tpu.cli.train single_image \
        [--total_steps=1000 --data.batch_size=32 ...]

Data: real dataset indices via --data.sources='[["lsp", "path.npz", 1.0]]';
without sources the synthetic dataset drives the loop (smoke/bring-up mode
— no real data ships in this environment). Checkpoints via Orbax with
auto-resume-latest; metrics stream to <checkpoint_dir>/train_log.jsonl.
--eval_every=N scores held-out MPJPE in-loop (--eval.index_path, or a
disjoint-seed synthetic stream) and logs val_mpjpe_mm alongside the losses.

Reference call-stack twin: train.py main -> HMRTrainer.train (SURVEY.md
section 3.1), rebuilt as one fused jitted step over a DP mesh.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def main(argv: list[str]) -> None:
    from human_3d_reconstruction_tpu.cli.common import JSONLLogger, build_smpl, echo
    from human_3d_reconstruction_tpu.config import load_config
    from human_3d_reconstruction_tpu.data.datasets import (
        MixedLoader,
        MoshParamSource,
        SyntheticImageDataset,
        make_dataset,
    )
    from human_3d_reconstruction_tpu.parallel import make_mesh, replicate, shard_batch
    from human_3d_reconstruction_tpu.train.trainer import (
        create_states,
        make_checkpoint_manager,
        make_jitted_train_step,
        restore_latest,
        save_checkpoint,
    )

    config = load_config(argv)
    if config.debug_nans:
        from human_3d_reconstruction_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging()
        echo("NaN debugging ON (dev mode; disables some fusion)")
    echo(f"preset={config.preset} devices={jax.devices()}")

    smpl_model = build_smpl(config)
    smpl_params = jax.tree.map(jnp.asarray, smpl_model.as_dict())

    # datasets
    if config.data.sources:
        datasets, weights = [], []
        for name, path, weight in config.data.sources:
            datasets.append(make_dataset(name, path))
            weights.append(float(weight))
        echo(f"training on {[d.name for d in datasets]} weights={weights}")
    else:
        datasets = [
            SyntheticImageDataset(smpl_model, n=config.data.synthetic_size, seed=config.seed)
        ]
        weights = [1.0]
        echo("no --data.sources: training on the synthetic dataset")
    loader = iter(
        MixedLoader(
            datasets,
            config.data.batch_size,
            weights,
            seed=config.seed,
            num_workers=config.data.num_workers,
        )
    )

    if config.data.mosh_path:
        mosh = MoshParamSource.from_npz(config.data.mosh_path)
    elif all(isinstance(d, SyntheticImageDataset) for d in datasets):
        # Synthetic smoke-training: the adversarial "real pose" pool must
        # match the data's own pose distribution (mosh IS real poses of the
        # training distribution) — the generic manifold prior would pull
        # the generator away from the synthetic GT poses.
        mosh = MoshParamSource(
            np.concatenate([d.thetas for d in datasets]),
            np.concatenate([d.betas for d in datasets]),
        )
        echo("mosh prior: synthetic dataset's own pose pool")
    else:
        mosh = MoshParamSource.synthetic(np.random.default_rng(config.seed))
    mosh_rng = np.random.default_rng(config.seed + 1)

    # IEF seed: dataset-derived mean over the mosh pose pool (reference's
    # mean_theta file), persisted next to checkpoints for inference restore.
    from human_3d_reconstruction_tpu.smpl.mean_params import resolve_mean_params

    mean_params = resolve_mean_params(config.mean_params, config.checkpoint_dir, mosh)
    if mean_params is not None:
        src = (
            f"mean over {len(mosh.thetas)} mosh poses"
            if config.mean_params == "mosh"
            else f"loaded from {config.mean_params}"
        )
        echo(f"IEF seed: {src} "
             f"(|theta|={np.linalg.norm(mean_params[:72]):.3f})")

    # states + step
    import dataclasses

    train_cfg = config.train
    if train_cfg.crop_size != config.data.crop_size:
        train_cfg = dataclasses.replace(train_cfg, crop_size=config.data.crop_size)
    if train_cfg.lr_schedule and train_cfg.lr_decay_steps == 0:
        train_cfg = dataclasses.replace(train_cfg, lr_decay_steps=config.total_steps)
        echo(f"lr_schedule={train_cfg.lr_schedule} over {config.total_steps} steps")
    from human_3d_reconstruction_tpu.train.trainer import gate_flip_aug

    train_cfg = gate_flip_aug(train_cfg, smpl_model.as_dict(), echo=echo)
    gen, disc, model, disc_mod, g_tx, d_tx = create_states(
        train_cfg, jax.random.key(config.seed), smpl_model.as_dict(),
        mean_params=mean_params,
    )
    pose_prior = None
    if config.pose_prior:
        from human_3d_reconstruction_tpu.smpl.pose_prior import (
            resolve_pose_prior,
            save_pose_prior,
        )

        pose_prior = resolve_pose_prior(config.pose_prior, mosh)
        if config.pose_prior == "mosh":
            # NOTE: no local `from pathlib import Path` here — a function-
            # local import would shadow the module-level one and leave
            # `Path` unbound at the best-val record below for every run
            # that does NOT take this branch (caught by the in-loop
            # validation CLI smoke tests).
            Path(config.checkpoint_dir).mkdir(parents=True, exist_ok=True)
            save_pose_prior(
                str(Path(config.checkpoint_dir) / "pose_prior.npz"), pose_prior
            )
        w = train_cfg.loss_weights
        if w.pose_prior <= 0:
            # A configured prior with zero weight is a silent no-op; default
            # to a mild regularizer so --pose_prior=mosh works standalone.
            train_cfg = dataclasses.replace(
                train_cfg,
                loss_weights=dataclasses.replace(w, pose_prior=1e-3),
            )
        echo(
            f"pose prior: {config.pose_prior} (K={pose_prior.means.shape[0]}, "
            f"weight={train_cfg.loss_weights.pose_prior})"
        )

    smpl_apply = None
    if config.smpl_path == "pallas":
        # Concrete prepared params closed into the loss: Pallas forward AND
        # Pallas backward run inside the train step (f32 basis — training
        # gradients hold the strict parity bar).
        from human_3d_reconstruction_tpu.ops import prepare_fused_smpl
        from human_3d_reconstruction_tpu.ops.fused_smpl import smpl_forward_fused

        prepared = prepare_fused_smpl(smpl_model.as_dict())
        smpl_apply = lambda _, theta, beta: smpl_forward_fused(prepared, theta, beta)
        echo("SMPL decode in train loss: fused Pallas fwd+bwd")
    step_fn = make_jitted_train_step(
        train_cfg, model, disc_mod, g_tx, d_tx, smpl_apply=smpl_apply,
        pose_prior=pose_prior,
    )

    mgr = make_checkpoint_manager(config.checkpoint_dir)
    gen, disc, start_step = restore_latest(mgr, gen, disc)
    if start_step:
        echo(f"resumed from step {start_step}")

    mesh = make_mesh()
    gen = replicate(gen, mesh)
    disc = replicate(disc, mesh)
    smpl_params = replicate(smpl_params, mesh)

    # In-loop validation (--eval_every=N): score held-out MPJPE during
    # training — the signal the r3 generalization recipe plateaus/stops on.
    run_validation = None
    if config.eval_every > 0:
        from human_3d_reconstruction_tpu.api import make_recover_mesh
        from human_3d_reconstruction_tpu.data.preprocess import preprocess_crops
        from human_3d_reconstruction_tpu.data.skeleton import NUM_KP
        from human_3d_reconstruction_tpu.eval.protocol import (
            load_eval_batches,
            run_protocol,
            synthetic_eval_batches,
        )

        # The XLA decode path for scoring (parity-exact; the Pallas-vs-XLA
        # choice is a training-throughput lever, not a metric one).
        recover_val = make_recover_mesh(model, smpl_path="xla")
        if config.eval.index_path:
            echo(f"in-loop validation every {config.eval_every} steps on "
                 f"{config.eval.index_path}")
            # Small sets: decode once, score from memory every eval. Large
            # sets stream from disk per eval (bounded memory; decoding a
            # 512-frame set ~100x per long run would stall the 1-core host
            # otherwise).
            first = list(load_eval_batches(config.eval.index_path, config.eval.batch_size))
            n_val = sum(b.n_valid or len(b.actions) for b in first)
            if n_val <= 2048:
                cached_real = first
                val_batches = lambda: iter(cached_real)
            else:
                del first
                echo(f"(eval set {n_val} frames > 2048: streaming from disk per eval)")
                val_batches = lambda: load_eval_batches(
                    config.eval.index_path, config.eval.batch_size
                )
        else:
            # Held-out synthetic stream: a DIFFERENT seed than the training
            # set, so the poses are disjoint draws (generalization, not
            # memorization — matches benchmarks/bench_generalization.py).
            cached = list(
                synthetic_eval_batches(
                    smpl_model, num_batches=2,
                    batch_size=min(16, config.eval.batch_size),
                    seed=config.seed + 9,
                )
            )
            echo(f"in-loop validation every {config.eval_every} steps "
                 f"(synthetic held-out stream, {sum(len(b.actions) for b in cached)} frames)")
            val_batches = lambda: iter(cached)

        def run_validation(gen_state):
            variables_now = {
                "params": gen_state.params,
                "batch_stats": gen_state.batch_stats,
            }

            def predict(images, centers, scales):
                crops = preprocess_crops(
                    jnp.asarray(images), jnp.asarray(centers),
                    jnp.asarray(scales), out_size=config.data.crop_size,
                )
                out = recover_val(variables_now, smpl_params, crops)
                return out.eval_joints3d[:, :NUM_KP]

            return run_protocol(predict, val_batches())

        # Best-val checkpoint: its OWN manager under <ckpt_dir>/best
        # (max_to_keep=1) so the main manager's rolling GC can never
        # collect the best-scoring weights; `cli.eval
        # --checkpoint=<ckpt_dir>/best` restores them directly.
        best_mgr = make_checkpoint_manager(f"{config.checkpoint_dir}/best", max_to_keep=1)
        best_val = {"mpjpe_mm": float("inf"), "step": 0}
        best_record = Path(f"{config.checkpoint_dir}/best_val.json")
        if best_record.exists():
            # Resumed run: seed from the persisted record so a worse later
            # eval can't overwrite the best checkpoint from before the
            # restart. A truncated/corrupt record (killed mid-write before
            # atomic writes shipped) must not brick auto-resume.
            try:
                best_val = json.loads(best_record.read_text())
                echo(f"best-val record restored: {best_val['mpjpe_mm']:.1f} mm "
                     f"at step {best_val['step']}")
            except (json.JSONDecodeError, KeyError):
                echo("best_val.json unreadable; resetting the best-val record")
                best_val = {"mpjpe_mm": float("inf"), "step": 0}

    logger = JSONLLogger(f"{config.checkpoint_dir}/train_log.jsonl")
    rng_key = jax.random.key(config.seed + 2)
    t_last = time.perf_counter()

    # Preemption safety (SURVEY.md section 5 "failure detection / recovery"):
    # on SIGTERM/SIGINT finish the in-flight step, checkpoint, exit 0 —
    # restart auto-resumes from the save.
    import signal

    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True

    signal.signal(signal.SIGTERM, _request_stop)
    signal.signal(signal.SIGINT, _request_stop)

    # Prefetch: host collate + H2D overlap with the device step.
    from human_3d_reconstruction_tpu.data.prefetch import device_prefetch

    def to_dict(batch):
        # uint8 pixels: 4x less host->device traffic (trainer casts to f32
        # on device); values are [0, 255] so quantization loses <1 LSB —
        # the same convention as the packed record format.
        return {
            "images": np.clip(np.rint(batch.images), 0, 255).astype(np.uint8),
            "centers": batch.centers,
            "scales": batch.scales,
            "kp2d": batch.kp2d,
            "joints3d": batch.joints3d,
            "has_3d": batch.has_3d,
            "theta": batch.theta,
            "beta": batch.beta,
            "has_smpl": batch.has_smpl,
        }

    batches = device_prefetch(
        map(to_dict, loader), place=lambda b: shard_batch(b, mesh)
    )
    if config.data.echo_factor != 1:
        from human_3d_reconstruction_tpu.data.prefetch import echo_batches

        # After prefetch: echoes reuse the device buffers (one H2D per
        # host batch); each echo step draws a fresh on-device augmentation.
        # echo_batches itself rejects factors < 1 (a 0 is a config bug, not
        # an off switch).
        batches = echo_batches(batches, config.data.echo_factor)
        echo(f"data echoing x{config.data.echo_factor}")

    for step in range(start_step, config.total_steps):
        batch_dict = next(batches)
        mt, mb = mosh.sample(mosh_rng, config.data.batch_size)
        gen, disc, metrics = step_fn(
            gen, disc, smpl_params, batch_dict, jnp.asarray(mt), jnp.asarray(mb), rng_key
        )

        if (step + 1) % config.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = (time.perf_counter() - t_last) / config.log_every
            t_last = time.perf_counter()
            m["steps_per_sec"] = 1.0 / dt
            m["images_per_sec"] = config.data.batch_size / dt
            logger.log(step + 1, **m)
            echo(
                f"step {step + 1}: loss_g={m['loss_g']:.4f} "
                + (f"loss_d={m['loss_d']:.4f} " if "loss_d" in m else "")
                + f"({m['images_per_sec']:.1f} img/s)"
            )
        if run_validation is not None and (step + 1) % config.eval_every == 0:
            rep = run_validation(gen)
            logger.log(
                step + 1,
                val_mpjpe_mm=rep.mpjpe_mm,
                val_pa_mpjpe_mm=rep.pa_mpjpe_mm,
            )
            echo(
                f"step {step + 1}: val MPJPE {rep.mpjpe_mm:.1f} mm "
                f"(PA {rep.pa_mpjpe_mm:.1f})"
            )
            if rep.mpjpe_mm < best_val["mpjpe_mm"]:
                best_val = {
                    "mpjpe_mm": rep.mpjpe_mm,
                    "pa_mpjpe_mm": rep.pa_mpjpe_mm,
                    "step": step + 1,
                }
                save_checkpoint(best_mgr, step + 1, gen, disc)
                # Atomic record write: a kill mid-write must never leave a
                # truncated json that poisons the next resume.
                tmp = best_record.with_suffix(".json.tmp")
                tmp.write_text(json.dumps(best_val))
                tmp.replace(best_record)
                echo(f"new best val at step {step + 1} -> {config.checkpoint_dir}/best")
        if (step + 1) % config.save_every == 0 or step + 1 == config.total_steps:
            save_checkpoint(mgr, step + 1, gen, disc)
            echo(f"saved checkpoint at step {step + 1}")
        if stop_requested["flag"]:
            save_checkpoint(mgr, step + 1, gen, disc)
            mgr.wait_until_finished()
            echo(f"preempted: checkpointed at step {step + 1}, exiting cleanly")
            break

    mgr.wait_until_finished()
    if run_validation is not None:
        best_mgr.wait_until_finished()
        if best_val["step"]:
            echo(
                f"best val MPJPE {best_val['mpjpe_mm']:.1f} mm at step "
                f"{best_val['step']} (checkpoint: {config.checkpoint_dir}/best)"
            )
    logger.close()
    echo("training done")


if __name__ == "__main__":
    main(sys.argv[1:])
